// ARPA-format n-gram language model with Katz backoff scoring.
//
// Native replacement for the reference's `kenlm` dependency
// (model_window/test_with_kenlm.py:7,21-23): loads a standard ARPA file and
// scores whitespace-tokenized sentences as total log10 probability with
// implicit <s> ... </s>, matching kenlm.Model.score(sentence) semantics.
// Unknown words map to <unk> when present, else get a floor penalty.
//
// C API (ctypes-bound in htr_vt_tpu/native/build.py):
//   void*  htrvt_ngram_load(const char* arpa_path);   // NULL on failure
//   double htrvt_ngram_score(void* lm, const char* sentence);
//   int    htrvt_ngram_order(void* lm);
//   void   htrvt_ngram_free(void* lm);

#include <cmath>
#include <cstdint>
#include <cstring>
#include <fstream>
#include <sstream>
#include <string>
#include <unordered_map>
#include <vector>

namespace {

struct Entry {
    float logprob;  // log10
    float backoff;  // log10
};

struct NgramLM {
    int order = 0;
    // Keyed by the space-joined n-gram.
    std::unordered_map<std::string, Entry> table;
    bool has_unk = false;
    static constexpr float kUnkFloor = -10.0f;

    const Entry* find(const std::string& key) const {
        auto it = table.find(key);
        return it == table.end() ? nullptr : &it->second;
    }

    // log10 p(word | context words) with recursive backoff.
    double cond_log10(const std::vector<std::string>& ctx,
                      const std::string& word) const {
        // Try longest context first: join(ctx) + word.
        for (size_t start = 0; start <= ctx.size(); ++start) {
            std::string key;
            for (size_t i = start; i < ctx.size(); ++i) {
                key += ctx[i];
                key += ' ';
            }
            key += word;
            const Entry* e = find(key);
            if (e != nullptr) {
                // Accumulate backoff weights of the skipped longer contexts.
                double bo = 0.0;
                for (size_t s = 0; s < start; ++s) {
                    std::string ck;
                    for (size_t i = s; i < ctx.size(); ++i) {
                        if (i > s) ck += ' ';
                        ck += ctx[i];
                    }
                    // note: context key has no trailing word
                    const Entry* ce = find(ck);
                    if (ce != nullptr) bo += ce->backoff;
                }
                return bo + e->logprob;
            }
        }
        if (has_unk) {
            const Entry* u = find("<unk>");
            if (u != nullptr) return u->logprob;
        }
        return kUnkFloor;
    }
};

std::vector<std::string> tokenize(const char* text) {
    std::vector<std::string> out;
    std::istringstream iss(text);
    std::string tok;
    while (iss >> tok) out.push_back(tok);
    return out;
}

}  // namespace

extern "C" {

void* htrvt_ngram_load(const char* path) {
    std::ifstream f(path);
    if (!f.is_open()) return nullptr;
    auto* lm = new NgramLM();
    std::string line;
    int current_n = 0;
    bool in_grams = false;
    while (std::getline(f, line)) {
        // strip trailing \r
        if (!line.empty() && line.back() == '\r') line.pop_back();
        if (line.empty()) continue;
        if (line[0] == '\\') {
            if (line.rfind("\\end\\", 0) == 0) break;
            size_t dash = line.find("-grams:");
            if (dash != std::string::npos) {
                current_n = std::atoi(line.substr(1, dash - 1).c_str());
                lm->order = std::max(lm->order, current_n);
                in_grams = true;
            } else {
                in_grams = false;
            }
            continue;
        }
        if (!in_grams || current_n == 0) continue;
        // Format: logprob<TAB>w1 w2 ... wn[<TAB>backoff]
        std::istringstream iss(line);
        float lp;
        if (!(iss >> lp)) continue;
        std::string words, w;
        for (int i = 0; i < current_n; ++i) {
            if (!(iss >> w)) { words.clear(); break; }
            if (i > 0) words += ' ';
            words += w;
        }
        if (words.empty()) continue;
        float bo = 0.0f;
        iss >> bo;  // optional
        lm->table[words] = Entry{lp, bo};
        if (words == "<unk>") lm->has_unk = true;
    }
    if (lm->order == 0) {
        delete lm;
        return nullptr;
    }
    return lm;
}

int htrvt_ngram_order(void* handle) {
    return handle ? static_cast<NgramLM*>(handle)->order : 0;
}

double htrvt_ngram_score(void* handle, const char* sentence) {
    if (handle == nullptr) return 0.0;
    const auto* lm = static_cast<NgramLM*>(handle);
    std::vector<std::string> words = tokenize(sentence);
    words.push_back("</s>");
    std::vector<std::string> ctx{"<s>"};
    double total = 0.0;
    const size_t max_ctx = static_cast<size_t>(lm->order) - 1;
    for (const auto& w : words) {
        total += lm->cond_log10(ctx, w);
        ctx.push_back(w);
        if (ctx.size() > max_ctx) ctx.erase(ctx.begin(), ctx.end() - max_ctx);
    }
    return total;
}

void htrvt_ngram_free(void* handle) {
    delete static_cast<NgramLM*>(handle);
}

}  // extern "C"
