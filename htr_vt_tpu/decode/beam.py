"""CTC beam-search decoding.

Two algorithms:

- ``prefix_beam_search``: proper CTC prefix beam search with prefix merging
  (blank/non-blank probability split). This is the framework's primary beam
  decoder — strictly better than the reference's.
- ``simple_beam_search``: the reference's naive frame-wise top-k beam without
  prefix merging (model_window/test_with_kenlm.py:25-43), kept for output
  parity with the KenLM eval script.

Both run on host over [T, C] log-probs (decode is off the training path; the
device ships only final logits).
"""

from __future__ import annotations

import math
from collections import defaultdict
from typing import Callable, List, Optional, Sequence, Tuple

import numpy as np

NEG_INF = -float("inf")


def _logaddexp(a: float, b: float) -> float:
    if a == NEG_INF:
        return b
    if b == NEG_INF:
        return a
    m = max(a, b)
    return m + math.log(math.exp(a - m) + math.exp(b - m))


def prefix_beam_search(log_probs: np.ndarray, beam_width: int = 10,
                       blank: int = 0, top_k_per_frame: int = 16,
                       lm_score: Optional[Callable[[Tuple[int, ...]], float]] = None,
                       lm_weight: float = 0.0) -> List[Tuple[Tuple[int, ...], float]]:
    """Standard CTC prefix beam search.

    Returns up to beam_width (prefix, total_log_prob) sorted best-first.
    ``lm_score(prefix)`` is an optional incremental language-model bonus added
    (scaled by lm_weight) when a prefix is extended.
    """
    t_total, c = log_probs.shape
    # beams: prefix -> (p_blank, p_non_blank)
    beams = {(): (0.0, NEG_INF)}
    for t in range(t_total):
        frame = log_probs[t]
        if top_k_per_frame < c:
            cand = np.argpartition(-frame, top_k_per_frame)[:top_k_per_frame]
        else:
            cand = np.arange(c)
        if blank not in cand:
            cand = np.append(cand, blank)
        next_beams: dict = defaultdict(lambda: (NEG_INF, NEG_INF))
        for prefix, (pb, pnb) in beams.items():
            total = _logaddexp(pb, pnb)
            for ci in cand:
                p = float(frame[ci])
                if ci == blank:
                    nb, nn = next_beams[prefix]
                    next_beams[prefix] = (_logaddexp(nb, total + p), nn)
                    continue
                last = prefix[-1] if prefix else None
                if ci == last:
                    # repeat: extends only from blank-ending paths...
                    nprefix = prefix + (ci,)
                    nb, nn = next_beams[nprefix]
                    ext = pb + p
                    if lm_score is not None and lm_weight:
                        ext += lm_weight * lm_score(nprefix)
                    next_beams[nprefix] = (nb, _logaddexp(nn, ext))
                    # ...while same-symbol continuation stays on the prefix
                    nb, nn = next_beams[prefix]
                    next_beams[prefix] = (nb, _logaddexp(nn, pnb + p))
                else:
                    nprefix = prefix + (ci,)
                    nb, nn = next_beams[nprefix]
                    ext = total + p
                    if lm_score is not None and lm_weight:
                        ext += lm_weight * lm_score(nprefix)
                    next_beams[nprefix] = (nb, _logaddexp(nn, ext))
        scored = sorted(next_beams.items(),
                        key=lambda kv: -_logaddexp(kv[1][0], kv[1][1]))
        beams = dict(scored[:beam_width])
    out = [(prefix, _logaddexp(pb, pnb)) for prefix, (pb, pnb) in beams.items()]
    return sorted(out, key=lambda x: -x[1])


def simple_beam_search(log_probs: np.ndarray, beam_width: int = 5,
                       top_k_per_frame: int = 5) -> List[Tuple[List[int], float]]:
    """The reference's naive beam (model_window/test_with_kenlm.py:25-43):
    per frame take top-k classes, extend every beam, keep beam_width by score;
    collapse repeats/blanks only afterwards."""
    beams: List[Tuple[List[int], float]] = [([], 0.0)]
    for frame in log_probs:
        top = np.argsort(-frame)[:top_k_per_frame]
        nxt = [(seq + [int(ci)], score + float(frame[ci]))
               for seq, score in beams for ci in top]
        nxt.sort(key=lambda x: -x[1])
        beams = nxt[:beam_width]
    return beams


def collapse_sequence(seq: Sequence[int], blank: int = 0) -> List[int]:
    out: List[int] = []
    prev = None
    for s in seq:
        if s != blank and s != prev:
            out.append(int(s))
        prev = s
    return out


def beam_search_batch(log_probs: np.ndarray, beam_width: int = 10,
                      blank: int = 0) -> List[List[Tuple[Tuple[int, ...], float]]]:
    """Per-sample prefix beam search over a [B, T, C] batch."""
    return [prefix_beam_search(lp, beam_width, blank) for lp in log_probs]


def simple_beam_search_batch(log_probs: np.ndarray, beam_width: int = 5,
                             top_k_per_frame: int = 5
                             ) -> List[List[Tuple[List[int], float]]]:
    """Vectorized batch version of the reference-style naive beam: one numpy
    pass over [B, T, C] instead of a Python frame loop per sample (the
    reference's per-sample loop is its eval hot spot, SURVEY §3.5)."""
    b, t, c = log_probs.shape
    k = beam_width
    kf = min(top_k_per_frame, c)
    # [B, T, kf] per-frame top classes and scores
    top_idx = np.argpartition(-log_probs, kf - 1, axis=2)[:, :, :kf]
    top_val = np.take_along_axis(log_probs, top_idx, axis=2)

    seqs = np.zeros((b, 1, 0), np.int64)
    scores = np.zeros((b, 1), np.float64)
    for step in range(t):
        # extend every beam with every candidate: [B, nb*kf]
        ext = scores[:, :, None] + top_val[:, None, step, :]
        nb = ext.shape[1] * ext.shape[2]
        ext = ext.reshape(b, nb)
        keep = min(k, nb)
        sel = np.argpartition(-ext, keep - 1, axis=1)[:, :keep]
        scores = np.take_along_axis(ext, sel, axis=1)
        beam_src = sel // kf
        cand_src = sel % kf
        new_tok = np.take_along_axis(top_idx[:, step, :], cand_src, axis=1)
        seqs = np.concatenate(
            [np.take_along_axis(seqs, beam_src[:, :, None], axis=1),
             new_tok[:, :, None].astype(np.int64)], axis=2)
        order = np.argsort(-scores, axis=1)
        scores = np.take_along_axis(scores, order, axis=1)
        seqs = np.take_along_axis(seqs, order[:, :, None], axis=1)
    return [[(seqs[i, j].tolist(), float(scores[i, j]))
             for j in range(seqs.shape[1])] for i in range(b)]
