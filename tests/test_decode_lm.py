"""Beam search + n-gram LM scoring."""

import math

import numpy as np
import pytest

from htr_vt_tpu.decode.beam import (collapse_sequence, prefix_beam_search,
                                    simple_beam_search)
from htr_vt_tpu.decode.lm import NgramScorer, _PythonArpa, rescore_candidates

ARPA = """
\\data\\
ngram 1=5
ngram 2=4

\\1-grams:
-1.0\t<s>\t-0.5
-1.2\t</s>
-0.8\tthe\t-0.3
-1.0\tcat\t-0.4
-1.5\tdog

\\2-grams:
-0.3\t<s> the
-0.4\tthe cat
-0.6\tthe dog
-0.2\tcat </s>

\\end\\
"""


@pytest.fixture(scope="module")
def arpa_path(tmp_path_factory):
    p = tmp_path_factory.mktemp("lm") / "tiny.arpa"
    p.write_text(ARPA)
    return str(p)


def _manual_score_the_cat():
    # p(the|<s>) = -0.3 (bigram), p(cat|the) = -0.4, p(</s>|cat) = -0.2
    return -0.3 + -0.4 + -0.2


def test_python_arpa_backoff(arpa_path):
    lm = _PythonArpa(arpa_path)
    assert lm.order == 2
    assert abs(lm.score("the cat") - _manual_score_the_cat()) < 1e-6
    # "the dog": p(dog|the)=-0.6; p(</s>|dog) backs off: bo(dog)=0 + p(</s>)=-1.2
    assert abs(lm.score("the dog") - (-0.3 - 0.6 + (0.0 - 1.2))) < 1e-6


def test_native_matches_python(arpa_path):
    from htr_vt_tpu.native.build import load_native
    if load_native() is None:
        pytest.skip("no native lib")
    scorer = NgramScorer(arpa_path)
    py = _PythonArpa(arpa_path)
    for s in ["the cat", "the dog", "cat", "zebra the cat", ""]:
        assert abs(scorer.score(s) - py.score(s)) < 1e-5, s


def test_prefix_beam_matches_exhaustive():
    """Beam result must equal exhaustive CTC marginalization on a tiny case."""
    rng = np.random.default_rng(0)
    t, c = 5, 3
    logits = rng.standard_normal((t, c))
    logp = logits - np.log(np.exp(logits).sum(1, keepdims=True))

    # exhaustive: sum path probs per collapsed sequence
    from itertools import product
    totals = {}
    for path in product(range(c), repeat=t):
        lp = sum(logp[i, s] for i, s in enumerate(path))
        key = tuple(collapse_sequence(path))
        totals[key] = np.logaddexp(totals.get(key, -np.inf), lp)
    best_exh = max(totals.items(), key=lambda kv: kv[1])

    beams = prefix_beam_search(logp, beam_width=50, top_k_per_frame=c)
    assert beams[0][0] == best_exh[0]
    assert abs(beams[0][1] - best_exh[1]) < 1e-6


def test_simple_beam_reference_semantics():
    logp = np.log(np.array([[0.6, 0.3, 0.1],
                            [0.1, 0.8, 0.1],
                            [0.7, 0.2, 0.1]]))
    beams = simple_beam_search(logp, beam_width=2, top_k_per_frame=2)
    # greedy path 0,1,0 must be the top beam
    assert beams[0][0] == [0, 1, 0]
    assert collapse_sequence(beams[0][0]) == [1]


def test_rescore_candidates(arpa_path):
    scorer = NgramScorer(arpa_path)
    out = rescore_candidates([("the dog", -1.0), ("the cat", -2.0)], scorer)
    assert out[0][0] == "the cat"  # LM prefers cat despite worse CTC score


def test_batched_simple_beam_matches_sequential():
    from htr_vt_tpu.decode.beam import simple_beam_search_batch
    rng = np.random.default_rng(7)
    logp = rng.standard_normal((4, 12, 9))
    logp = logp - np.log(np.exp(logp).sum(-1, keepdims=True))
    batched = simple_beam_search_batch(logp, beam_width=4, top_k_per_frame=4)
    for i in range(4):
        seq_ref = simple_beam_search(logp[i], beam_width=4, top_k_per_frame=4)
        got = [(tuple(s), round(sc, 6)) for s, sc in batched[i]]
        want = [(tuple(s), round(sc, 6)) for s, sc in seq_ref]
        assert got[0] == want[0]
        assert {g[0] for g in got} == {w[0] for w in want}


def test_train_ngram_arpa_and_score(tmp_path):
    """LM trained on a corpus must load in both scorers and prefer in-domain
    sentences."""
    from htr_vt_tpu.decode.lm_train import train_ngram_arpa
    corpus = ["the cat sat on the mat", "the dog sat on the log",
              "a cat and a dog", "the cat and the dog sat"] * 5
    path = str(tmp_path / "lm.arpa")
    counts = train_ngram_arpa(corpus, path, order=3, level="word")
    assert counts[1] > 5 and counts[3] > 5

    scorer = NgramScorer(path)
    assert scorer.order == 3
    in_domain = scorer.score("the cat sat on the mat")
    shuffled = scorer.score("mat the on sat cat the")
    oov = scorer.score("zyx qwv bbn mmq ppz qqr")  # same token count
    assert in_domain > shuffled > oov

    # native and python agree on the generated file too
    from htr_vt_tpu.native.build import load_native
    if load_native() is not None:
        py = _PythonArpa(path)
        for s in ["the cat sat", "a dog", "unknown words here"]:
            assert abs(scorer.score(s) - py.score(s)) < 1e-4


def test_char_level_lm(tmp_path):
    from htr_vt_tpu.decode.lm_train import chars_for_lm, train_ngram_arpa
    corpus = ["hello world", "hello there", "world of words"] * 3
    path = str(tmp_path / "char.arpa")
    train_ngram_arpa(corpus, path, order=4, level="char")
    scorer = NgramScorer(path)
    good = scorer.score(chars_for_lm("hello world"))
    bad = scorer.score(chars_for_lm("hxqzo wzrld"))
    assert good > bad


def test_incremental_score_matches_full(arpa_path):
    """score_next chained over words + end() must equal score(sentence)."""
    scorer = NgramScorer(arpa_path)
    for sent in ["the cat", "the dog", "cat", "zebra the cat"]:
        state = scorer.begin()
        total = 0.0
        for w in sent.split():
            lp, state = scorer.score_next(state, w)
            total += lp
        total += scorer.end(state)
        assert abs(total - scorer.score(sent)) < 1e-5, sent


def test_indexed_cond_matches_string_path(arpa_path):
    """Id-indexed batch conditional scores == string-path cond()."""
    scorer = NgramScorer(arpa_path)
    vocab = ["the", "cat", "dog", "zebra"]
    idx = scorer.indexed(vocab)
    queries = [  # (ctx words or <s>, word)
        ([-1, idx.bos_id], 0),     # p(the | <s>)
        ([-1, 0], 1),              # p(cat | the)
        ([-1, 0], 2),              # p(dog | the)
        ([0, 1], idx.eos_id),      # p(</s> | the cat) -> backoff to (cat)
        ([-1, 3], 1),              # p(cat | zebra) -> backoff
        ([-1, -1], 2),             # p(dog) unigram, empty ctx
    ]
    ctx = np.array([q[0] for q in queries], np.int32)
    words = np.array([q[1] for q in queries], np.int32)
    got = idx.cond_batch(ctx, words)
    names = vocab + ["<s>", "</s>"]
    for i, (cq, wq) in enumerate(queries):
        ctx_words = [names[c] for c in cq if c >= 0]
        want = scorer.cond(ctx_words, names[wq])
        assert abs(got[i] - want) < 1e-5, (i, ctx_words, names[wq])


def test_prefix_beam_batch_matches_sequential():
    from htr_vt_tpu.decode.beam import prefix_beam_search_batch
    rng = np.random.default_rng(3)
    b, t, c = 6, 20, 11
    logp = rng.standard_normal((b, t, c)) * 2
    logp = logp - np.log(np.exp(logp).sum(-1, keepdims=True))
    batched = prefix_beam_search_batch(logp, beam_width=8, top_k_per_frame=6)
    for i in range(b):
        ref = prefix_beam_search(logp[i], beam_width=8, top_k_per_frame=6)
        got = batched[i]
        # same best prefix and score; full beam sets match as dicts
        assert got[0][0] == ref[0][0], i
        assert abs(got[0][1] - ref[0][1]) < 1e-9
        ref_d = {p: s for p, s in ref}
        for p, s in got:
            if p in ref_d:
                assert abs(s - ref_d[p]) < 1e-9


def test_prefix_beam_batch_full_candidates():
    """With top_k == C (every class considered) results must still match."""
    from htr_vt_tpu.decode.beam import prefix_beam_search_batch
    rng = np.random.default_rng(11)
    logp = rng.standard_normal((3, 15, 5))
    logp = logp - np.log(np.exp(logp).sum(-1, keepdims=True))
    batched = prefix_beam_search_batch(logp, beam_width=12, top_k_per_frame=5)
    for i in range(3):
        ref = prefix_beam_search(logp[i], beam_width=12, top_k_per_frame=5)
        assert batched[i][0][0] == ref[0][0]
        assert abs(batched[i][0][1] - ref[0][1]) < 1e-9


def test_prefix_beam_batch_lm_fused(tmp_path):
    """LM-fused vectorized beam == dict-impl beam driven with the equivalent
    incremental conditional callback."""
    from htr_vt_tpu.decode.beam import prefix_beam_search_batch
    from htr_vt_tpu.decode.lm_train import train_ngram_arpa

    corpus = ["abba", "abab", "baba", "aabb"] * 4
    path = str(tmp_path / "char.arpa")
    train_ngram_arpa(corpus, path, order=3, level="char")
    scorer = NgramScorer(path)

    # classes: 0=blank, 1='a', 2='b'
    vocab = ["a", "b"]
    idx = scorer.indexed(vocab)
    lut = np.array([-1, 0, 1], np.int32)

    rng = np.random.default_rng(5)
    b, t, c = 4, 12, 3
    logp = rng.standard_normal((b, t, c))
    logp = logp - np.log(np.exp(logp).sum(-1, keepdims=True))

    got = prefix_beam_search_batch(logp, beam_width=6, top_k_per_frame=3,
                                   lm=idx, lm_weight=0.7, lm_id_of_class=lut)

    def lm_cb(prefix):
        # conditional of the last char given the chars before it, from <s>
        words = ["<s>"] + [vocab[p - 1] for p in prefix]
        return scorer.cond(words[:-1], words[-1])

    for i in range(b):
        ref = prefix_beam_search(logp[i], beam_width=6, top_k_per_frame=3,
                                 lm_score=lm_cb, lm_weight=0.7)
        assert got[i][0][0] == ref[0][0], i
        assert abs(got[i][0][1] - ref[0][1]) < 1e-6


# --- golden scores ---------------------------------------------------------
# Hand-derived from the ARPA/Katz-backoff specification (the math kenlm
# implements; kenlm itself is not importable in this zero-egress image, so
# the goldens are written as explicit sums over the ARPA entries below —
# independently checkable against the spec). Covers: highest-order hit,
# single and CHAINED backoff (both context backoff weights apply), missing
# backoff weight (=0), <unk>, and OOV context.
GOLDEN_ARPA = """
\\data\\
ngram 1=6
ngram 2=5
ngram 3=3

\\1-grams:
-1.1\t<s>\t-0.4
-1.3\t</s>
-0.7\tthe\t-0.25
-0.9\tcat\t-0.35
-1.4\tsat\t-0.15
-2.5\t<unk>

\\2-grams:
-0.30\t<s> the\t-0.10
-0.45\tthe cat\t-0.20
-0.60\tcat sat\t-0.05
-0.50\tsat </s>
-0.80\tthe sat

\\3-grams:
-0.20\t<s> the cat
-0.35\tthe cat sat
-0.40\tcat sat </s>

\\end\\
"""


@pytest.fixture(scope="module")
def golden_path(tmp_path_factory):
    p = tmp_path_factory.mktemp("lmg") / "golden.arpa"
    p.write_text(GOLDEN_ARPA)
    return str(p)


GOLDEN_CASES = [
    # "the cat sat": all trigram hits + trigram for </s>
    # p(the|<s>)=-0.30 (bigram; 3-gram "<s> ? the" n/a at order entry —
    #   context is just <s>, so the bigram <s> the applies)
    # p(cat|<s> the)=-0.20, p(sat|the cat)=-0.35, p(</s>|cat sat)=-0.40
    ("the cat sat", -0.30 + -0.20 + -0.35 + -0.40),
    # "cat sat": p(cat|<s>) missing bigram -> bo(<s>)=-0.4 + p(cat)=-0.9
    # p(sat|<s> cat): no trigram, no bigram "cat sat"? it EXISTS (-0.60):
    #   fallback order: trigram "<s> cat sat" missing -> bo(<s> cat) missing
    #   (no such bigram entry -> bo contribution 0 from that level, then
    #   bigram "cat sat" hit) = -0.60
    # p(</s>|cat sat) trigram = -0.40
    ("cat sat", (-0.4 + -0.9) + -0.60 + -0.40),
    # "the sat": p(the|<s>)=-0.30; p(sat|<s> the): trigram "<s> the sat"
    #   missing -> bo("<s> the")=-0.10 + bigram "the sat"=-0.80;
    # p(</s>|the sat): trigram missing -> bo("the sat") missing(no entry->0)
    #   -> bigram "sat </s>"=-0.50
    ("the sat", -0.30 + (-0.10 + -0.80) + -0.50),
    # chained backoff: "sat the": p(sat|<s>): no bigram -> bo(<s>)=-0.4 +
    #   p(sat)=-1.4; p(the|<s> sat): no trigram -> bo("<s> sat")=0 (missing)
    #   -> no bigram "sat the" -> bo("sat")=-0.15 + p(the)=-0.7;
    # p(</s>|sat the): no trigram -> no bigram "the </s>" ->
    #   bo("sat the")=0 + bo("the")=-0.25 + p(</s>)=-1.3
    ("sat the", (-0.4 + -1.4) + (-0.15 + -0.7) + (-0.25 + -1.3)),
    # OOV: "zebra": p(<unk>)=-2.5 (kenlm maps OOV to <unk>'s unigram);
    # p(</s>|<s> zebra): contexts containing the OOV word never match ->
    #   backoff to p(</s>) with bo(zebra) absent = -1.3
    ("zebra", -2.5 + -1.3),
    # empty sentence: p(</s>|<s>): no bigram "<s> </s>" -> bo(<s>)=-0.4 +
    #   p(</s>)=-1.3
    ("", -0.4 + -1.3),
]


def test_golden_scores_native_and_python(golden_path):
    from htr_vt_tpu.native.build import load_native
    scorers = [("python", _PythonArpa(golden_path))]
    if load_native() is not None:
        scorers.append(("native", NgramScorer(golden_path)))
    for name, sc in scorers:
        for sent, want in GOLDEN_CASES:
            got = sc.score(sent)
            assert abs(got - want) < 1e-5, (name, sent, got, want)


def test_golden_scores_indexed_path(golden_path):
    """The id-indexed batch scorer reproduces the goldens word by word."""
    scorer = NgramScorer(golden_path)
    vocab = ["the", "cat", "sat", "zebra"]
    idx = scorer.indexed(vocab)
    wid = {w: i for i, w in enumerate(vocab)}
    for sent, want in GOLDEN_CASES:
        words = sent.split()
        ids = [wid[w] for w in words] + [idx.eos_id]
        ctxs, total_ctx = [], [idx.bos_id]
        for w in ids:
            c = ([-1] * 10 + total_ctx)[-(max(scorer.order - 1, 1)):]
            ctxs.append(c)
            total_ctx.append(w)
        got = idx.cond_batch(np.array(ctxs, np.int32),
                             np.array(ids, np.int32)).sum()
        assert abs(got - want) < 1e-5, (sent, got, want)


def test_indexed_cond_mid_context_negative(arpa_path):
    """A negative id MID-context breaks the n-gram: both the native index and
    the Python fallback must score with only the suffix AFTER the hole
    (regression: the fallback used to filter negatives out, so ctx [the, -1]
    scored p(w|the) while the C++ scored the unigram p(w))."""
    scorer = NgramScorer(arpa_path)
    vocab = ["the", "cat", "dog", "zebra"]
    idx = scorer.indexed(vocab)
    ctx = np.array([[0, -1], [-1, 0], [0, -1]], np.int32)  # [the, HOLE], ...
    words = np.array([1, 1, 2], np.int32)                  # cat, cat, dog
    want = [scorer.cond([], "cat"),       # hole kills the left context
            scorer.cond(["the"], "cat"),  # leading hole is just trimmed
            scorer.cond([], "dog")]
    for forced_fallback in ([False, True] if idx._idx is not None else [True]):
        if forced_fallback:
            idx._idx = None  # force the pure-Python path
        got = idx.cond_batch(ctx, words)
        for i, w in enumerate(want):
            assert abs(got[i] - w) < 1e-5, (forced_fallback, i)
    # the hole must actually change the score vs the filtered-context reading
    assert abs(want[0] - scorer.cond(["the"], "cat")) > 1e-3


def test_prefix_beam_batch_tiny_alphabet_overwide_beam():
    """beam_width > the live candidate count (tiny alphabets) re-selects
    killed duplicate rows as beam filler; if those keep the survivor's hash,
    three pool entries share one hash next frame and the pairwise merge
    loses probability mass (regression: scores diverged from
    prefix_beam_search by up to ~1.0 log-prob at C=3)."""
    from htr_vt_tpu.decode.beam import (prefix_beam_search,
                                        prefix_beam_search_batch)

    rng = np.random.default_rng(0)
    for trial in range(5):
        logp = rng.normal(size=(2, 6, 3))
        logp = logp - np.log(np.exp(logp).sum(-1, keepdims=True))
        for bw in (10, 7, 4):
            batched = prefix_beam_search_batch(logp, beam_width=bw)
            for bi in range(2):
                want = {tuple(s): v
                        for s, v in prefix_beam_search(logp[bi], beam_width=bw)}
                got = {tuple(s): v for s, v in batched[bi]}
                shared = set(want) & set(got)
                assert shared
                for kk in shared:
                    assert abs(want[kk] - got[kk]) < 1e-9, (trial, bw, bi, kk)


# ---- compiled .htlm binary format (native/ngram_lm.cpp v1) ------------------


def test_binary_roundtrip_python(golden_path, tmp_path):
    """_PythonArpa save_binary -> reload reproduces every golden score
    (f32 storage: tolerance covers the text-float -> f32 narrowing)."""
    lm = _PythonArpa(golden_path)
    out = str(tmp_path / "golden.htlm")
    lm.save_binary(out)
    back = _PythonArpa(out)
    assert back.order == lm.order
    assert set(back.table) == set(lm.table)
    for sent, want in GOLDEN_CASES:
        assert abs(back.score(sent) - want) < 1e-5, sent


def test_binary_roundtrip_native(golden_path, tmp_path):
    """Native save -> magic-sniffed load is bit-identical to the ARPA parse
    (both store f32), for score() and for the id-indexed beam path."""
    from htr_vt_tpu.native.build import load_native
    if load_native() is None:
        pytest.skip("no native lib")
    scorer = NgramScorer(golden_path)
    assert scorer._handle  # exercising the C++ path, not the fallback
    out = str(tmp_path / "golden_native.htlm")
    scorer.save_binary(out)
    compiled = NgramScorer(out)
    assert compiled._handle
    assert compiled.order == scorer.order
    for sent, want in GOLDEN_CASES:
        assert compiled.score(sent) == scorer.score(sent), sent
        assert abs(compiled.score(sent) - want) < 1e-5, sent
    vocab = ["the", "cat", "sat", "zebra"]
    idx_a, idx_b = scorer.indexed(vocab), compiled.indexed(vocab)
    ctx = np.array([[4, 0], [-1, 4], [0, 1], [3, 3]], np.int32)  # 4 = <s>
    words = np.array([0, 1, 2, 3], np.int32)
    np.testing.assert_array_equal(idx_a.cond_batch(ctx, words),
                                  idx_b.cond_batch(ctx, words))


def test_binary_cross_writer(golden_path, tmp_path):
    """The Python-written binary parses in C++ and vice versa — one format."""
    from htr_vt_tpu.native.build import load_native
    if load_native() is None:
        pytest.skip("no native lib")
    py_out = str(tmp_path / "py.htlm")
    _PythonArpa(golden_path).save_binary(py_out)
    native_reader = NgramScorer(py_out)
    assert native_reader._handle
    nat_out = str(tmp_path / "nat.htlm")
    NgramScorer(golden_path).save_binary(nat_out)
    py_reader = _PythonArpa(nat_out)
    for sent, want in GOLDEN_CASES:
        assert abs(native_reader.score(sent) - want) < 1e-5, sent
        assert abs(py_reader.score(sent) - want) < 1e-5, sent


def test_binary_corrupt_rejected(tmp_path):
    """Truncated/garbage compiled files fail loudly, not with a bad model."""
    from htr_vt_tpu.decode.lm import BINARY_MAGIC
    bad = tmp_path / "bad.htlm"
    bad.write_bytes(BINARY_MAGIC + b"\x03\x00")  # truncated header
    with pytest.raises(Exception):
        _PythonArpa(str(bad))
    from htr_vt_tpu.native.build import load_native
    lib = load_native()
    if lib is not None:
        assert not lib.htrvt_ngram_load(str(bad).encode())


def test_lm_compile_cli(golden_path, tmp_path, capsys):
    import sys

    from htr_vt_tpu.decode import lm_compile
    out = str(tmp_path / "cli.htlm")
    old = sys.argv
    try:
        sys.argv = ["lm_compile", golden_path, out, "--verify"]
        lm_compile.main()
    finally:
        sys.argv = old
    assert "verify OK" in capsys.readouterr().out
    assert NgramScorer(out).order == 3


def test_train_ngram_direct_to_htlm(tmp_path):
    """train_ngram_arpa(..., 'x.htlm') ships the compiled form directly."""
    from htr_vt_tpu.decode.lm import BINARY_MAGIC
    from htr_vt_tpu.decode.lm_train import train_ngram_arpa
    texts = ["hello world", "some words here"] * 3
    arpa, htlm = str(tmp_path / "m.arpa"), str(tmp_path / "m.htlm")
    train_ngram_arpa(texts, arpa, order=2)
    train_ngram_arpa(texts, htlm, order=2)
    assert open(htlm, "rb").read(8) == BINARY_MAGIC
    a, b = NgramScorer(arpa), NgramScorer(htlm)
    for s in ["hello world", "words", "zzz"]:
        assert abs(a.score(s) - b.score(s)) < 1e-5, s


def test_kenlm_binary_rejected_with_guidance(tmp_path):
    """A kenlm .bin (private format) must fail with an explicit re-export
    message, not an opaque ARPA parse error (round-4 verdict #10; reference
    loads .bin via kenlm itself, model_window/test_with_kenlm.py:21-23)."""
    import pytest
    from htr_vt_tpu.decode.lm import NgramScorer
    fake = tmp_path / "model.bin"
    # kenlm binary sanity header prefix (util/file_piece / binary_format.cc)
    fake.write_bytes(b"mmap lm http://kheafield.com/code format version 5\n\0"
                     + b"\x00" * 64)
    with pytest.raises(ValueError, match="kenlm binary.*lm_compile"):
        NgramScorer(str(fake))


def test_arpa_auto_compiles_htlm_cache(tmp_path):
    """Loading ARPA text auto-writes `<file>.htlm` and reuses it while fresh
    (round-5 UX: one-command fast loads at every --arpa entry point)."""
    import os

    from htr_vt_tpu.decode.lm import BINARY_MAGIC, NgramScorer
    arpa = str(tmp_path / "m.arpa")
    with open(arpa, "w") as f:
        f.write(ARPA)
    s1 = NgramScorer(arpa)
    cache = arpa + ".htlm"
    assert os.path.exists(cache)
    with open(cache, "rb") as f:
        assert f.read(len(BINARY_MAGIC)) == BINARY_MAGIC
    # second load goes through the cache and scores identically
    s2 = NgramScorer(arpa)
    for text in ("the cat", "a b c", "hello"):
        assert abs(s1.score(text) - s2.score(text)) < 1e-6
    # stale cache (older than the ARPA) is rebuilt, not trusted
    os.utime(cache, (1, 1))
    mtime_before = os.path.getmtime(cache)
    NgramScorer(arpa)
    assert os.path.getmtime(cache) > mtime_before
