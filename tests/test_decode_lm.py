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
