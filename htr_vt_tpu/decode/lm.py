"""Language-model rescoring for CTC beam candidates.

Replaces model_window's KenLM path (test_with_kenlm.py:15-23 KenLMTextScorer,
:44-59 candidate rescoring) with the native ARPA scorer
(htr_vt_tpu/native/ngram_lm.cpp), and model_window's RoBERTa MLM corrector /
pseudo-perplexity rescorer (test_with_llm.py:17-157) with a gated
transformers-based implementation that requires locally available weights
(this framework assumes zero-egress deployments).
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

from htr_vt_tpu.native.build import load_native


class NgramScorer:
    """kenlm.Model-compatible sentence scorer over an ARPA file.

    score(text) returns total log10 probability including </s>, like
    kenlm.Model.score. Uses the C++ backoff scorer; falls back to a pure
    Python ARPA implementation when the native library is unavailable.
    """

    def __init__(self, arpa_path: str):
        self._lib = load_native()
        self._handle = None
        self._py = None
        if self._lib is not None and hasattr(self._lib, "htrvt_ngram_load"):
            self._handle = self._lib.htrvt_ngram_load(arpa_path.encode())
        if not self._handle:
            self._py = _PythonArpa(arpa_path)

    @property
    def order(self) -> int:
        if self._handle:
            return int(self._lib.htrvt_ngram_order(self._handle))
        return self._py.order

    def score(self, text: str) -> float:
        if self._handle:
            return float(self._lib.htrvt_ngram_score(self._handle, text.encode()))
        return self._py.score(text)

    def __del__(self):
        if getattr(self, "_handle", None) and getattr(self, "_lib", None):
            try:
                self._lib.htrvt_ngram_free(self._handle)
            except Exception:
                pass


class _PythonArpa:
    """Minimal ARPA backoff model (fallback path; same semantics as the C++)."""

    UNK_FLOOR = -10.0

    def __init__(self, path: str):
        self.table = {}
        self.order = 0
        current_n, in_grams = 0, False
        with open(path, encoding="utf-8", errors="replace") as f:
            for line in f:
                line = line.rstrip("\n").rstrip("\r")
                if not line:
                    continue
                if line.startswith("\\"):
                    if line.startswith("\\end\\"):
                        break
                    if "-grams:" in line:
                        current_n = int(line[1:line.index("-grams:")])
                        self.order = max(self.order, current_n)
                        in_grams = True
                    else:
                        in_grams = False
                    continue
                if not in_grams:
                    continue
                parts = line.split()
                if len(parts) < current_n + 1:
                    continue
                lp = float(parts[0])
                words = " ".join(parts[1:1 + current_n])
                bo = float(parts[1 + current_n]) if len(parts) > current_n + 1 else 0.0
                self.table[words] = (lp, bo)

    def _cond(self, ctx: List[str], word: str) -> float:
        for start in range(len(ctx) + 1):
            key = " ".join(ctx[start:] + [word])
            if key in self.table:
                bo = 0.0
                for s in range(start):
                    ck = " ".join(ctx[s:])
                    if ck in self.table:
                        bo += self.table[ck][1]
                return bo + self.table[key][0]
        if "<unk>" in self.table:
            return self.table["<unk>"][0]
        return self.UNK_FLOOR

    def score(self, text: str) -> float:
        words = text.split() + ["</s>"]
        ctx = ["<s>"]
        total = 0.0
        for w in words:
            total += self._cond(ctx, w)
            ctx = (ctx + [w])[-(self.order - 1):] if self.order > 1 else []
        return total


def rescore_candidates(candidates: Sequence[Tuple[str, float]],
                       scorer: NgramScorer,
                       lm_weight: float = 1.0,
                       ctc_weight: float = 0.0) -> List[Tuple[str, float]]:
    """Score each (text, ctc_log_prob) candidate as
    ctc_weight * ctc + lm_weight * lm and sort best-first. The reference picks
    pure-LM argmax (ctc_weight=0, test_with_kenlm.py:44-59)."""
    scored = [(text, ctc_weight * ctc + lm_weight * scorer.score(text))
              for text, ctc in candidates]
    return sorted(scored, key=lambda x: -x[1])


class RobertaCorrector:
    """Masked-LM word corrector + pseudo-perplexity rescorer
    (model_window/test_with_llm.py:17-157). Requires transformers plus locally
    cached weights; constructing without them raises, callers should gate."""

    def __init__(self, model_name_or_path: str = "roberta-large",
                 device: str = "cpu", confidence_threshold: float = 0.8):
        from transformers import AutoModelForMaskedLM, AutoTokenizer  # gated import
        self.tokenizer = AutoTokenizer.from_pretrained(model_name_or_path)
        self.model = AutoModelForMaskedLM.from_pretrained(model_name_or_path)
        self.model.eval()
        self.device = device
        self.threshold = confidence_threshold

    def pseudo_log_likelihood(self, text: str) -> float:
        """Sum of log p(token | rest) with each token masked in turn."""
        import torch
        enc = self.tokenizer(text, return_tensors="pt")
        ids = enc["input_ids"][0]
        total = 0.0
        with torch.no_grad():
            for i in range(1, len(ids) - 1):  # skip BOS/EOS
                masked = ids.clone()
                masked[i] = self.tokenizer.mask_token_id
                out = self.model(masked[None]).logits[0, i].log_softmax(-1)
                total += float(out[ids[i]])
        return total

    def rescore(self, candidates: Sequence[str]) -> List[Tuple[str, float]]:
        scored = [(c, self.pseudo_log_likelihood(c)) for c in candidates]
        return sorted(scored, key=lambda x: -x[1])

    def correct(self, text: str, vocabulary: Optional[set] = None) -> str:
        """Mask OOV words and fill with the MLM when confident
        (test_with_llm.py mask-and-fill loop)."""
        import torch
        words = text.split()
        if vocabulary is None:
            return text
        out = list(words)
        for i, w in enumerate(words):
            if w.lower() in vocabulary:
                continue
            masked = list(words)
            masked[i] = self.tokenizer.mask_token
            enc = self.tokenizer(" ".join(masked), return_tensors="pt")
            with torch.no_grad():
                logits = self.model(**enc).logits[0]
            mask_pos = (enc["input_ids"][0] ==
                        self.tokenizer.mask_token_id).nonzero()
            if len(mask_pos) == 0:
                continue
            probs = logits[int(mask_pos[0])].softmax(-1)
            conf, tok = probs.max(-1)
            if float(conf) >= self.threshold:
                out[i] = self.tokenizer.decode([int(tok)]).strip()
        return " ".join(out)
