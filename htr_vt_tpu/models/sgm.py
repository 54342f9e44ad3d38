"""Semantic Guidance Module (training-only auxiliary loss).

Re-design of the reference SGM head (model_sgm_2/model/sgm_head.py): for each
ground-truth character position, a left and a right character-context window
is embedded, mean-pooled, direction-biased and used as a query that
cross-attends over the visual token sequence; a classifier predicts the center
character and the CE losses of both directions are averaged over valid
positions. Total train loss = ctc_lambda * CTC + sgm_lambda * SGM
(model_sgm_2/train.py:22-63).

The reference builds context windows with a Python double loop per batch
(sgm_head.py:29-73, O(B*L*S)); here it is one vectorized numpy gather on the
host with *fixed* [B, Lmax, S] shapes so the jitted step sees static shapes.
"""

from __future__ import annotations

from typing import Dict, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from htr_vt_tpu.text.converter import CTCLabelConverter

_XAVIER = nn.initializers.xavier_uniform()


class SGMVocab:
    """Character vocab for SGM targets: the codec's symbols (including the
    blank placeholder at 0, as the reference does) plus
    <pad>/<eos>/<bos_left>/<bos_right> control tokens (sgm_head.py:7-22)."""

    def __init__(self, converter: CTCLabelConverter):
        base = list(converter.character)
        self.stoi = {ch: i for i, ch in enumerate(base)}
        for tok in ("<pad>", "<eos>", "<bos_left>", "<bos_right>"):
            self.stoi.setdefault(tok, len(self.stoi))
        self.itos = [""] * len(self.stoi)
        for k, v in self.stoi.items():
            self.itos[v] = k
        self.pad = self.stoi["<pad>"]
        self.eos = self.stoi["<eos>"]
        self.bos_l = self.stoi["<bos_left>"]
        self.bos_r = self.stoi["<bos_right>"]

    @property
    def size(self) -> int:
        return len(self.stoi)


def make_context_arrays(texts: Sequence[str], vocab: SGMVocab, max_len: int,
                        sub_len: int = 5) -> Dict[str, np.ndarray]:
    """Vectorized window construction.

    Returns fixed-shape arrays:
      sgm_left / sgm_right: int32 [B, max_len, sub_len]
      sgm_tgt: int32 [B, max_len]; sgm_mask: float32 [B, max_len].
    Left window of position i is the sub_len characters before i (bos_left
    padded); right window is the sub_len after (eos padded).
    """
    b = len(texts)
    s = sub_len
    ids = np.full((b, max_len), vocab.pad, np.int32)
    mask = np.zeros((b, max_len), np.float32)
    for bi, t in enumerate(texts):
        t = t[:max_len]
        ids[bi, :len(t)] = [vocab.stoi[ch] for ch in t]
        mask[bi, :len(t)] = 1.0

    lengths = mask.sum(1).astype(np.int32)  # [B]
    pos = np.arange(max_len)[None, :, None]           # [1, L, 1]
    off = np.arange(1, s + 1)[None, None, :]          # [1, 1, S]
    # left: positions i-S .. i-1 (stored oldest-first like the reference)
    lidx = pos - (s + 1 - off)                        # i-S ... i-1
    left = np.where(lidx >= 0,
                    ids[np.arange(b)[:, None, None], np.clip(lidx, 0, max_len - 1)],
                    vocab.bos_l)
    # right: positions i+1 .. i+S
    ridx = pos + off
    right_valid = ridx < lengths[:, None, None]
    right = np.where(right_valid,
                     ids[np.arange(b)[:, None, None], np.clip(ridx, 0, max_len - 1)],
                     vocab.eos)
    return {"sgm_left": left.astype(np.int32), "sgm_right": right.astype(np.int32),
            "sgm_tgt": ids, "sgm_mask": mask}


class SGMHead(nn.Module):
    """Cross-attention character predictor (sgm_head.py:76-159)."""

    vocab_size: int
    char_emb_dim: int = 256
    drop_rate: float = 0.1
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, vis_tokens: jax.Array, left: jax.Array, right: jax.Array,
                 tgt: jax.Array, mask: jax.Array, *, deterministic: bool = True):
        d_vis = vis_tokens.shape[-1]
        emb = nn.Embed(self.vocab_size, self.char_emb_dim,
                       embedding_init=nn.initializers.normal(0.02), name="char_emb")
        dir_l = self.param("dir_left", nn.initializers.normal(1.0),
                           (1, 1, self.char_emb_dim))
        dir_r = self.param("dir_right", nn.initializers.normal(1.0),
                           (1, 1, self.char_emb_dim))
        txt_proj = nn.Dense(d_vis, dtype=self.dtype, kernel_init=_XAVIER, name="txt_proj")
        q_norm = nn.LayerNorm(dtype=jnp.float32, name="q_norm")
        kv_norm = nn.LayerNorm(dtype=jnp.float32, name="kv_norm")
        classifier = nn.Dense(self.vocab_size, dtype=jnp.float32,
                              kernel_init=_XAVIER, name="classifier")
        drop = nn.Dropout(self.drop_rate, deterministic=deterministic)

        def query(ctx_ids, dir_token):
            e = emb(ctx_ids).mean(axis=2) + dir_token  # [B, L, d_txt]
            return q_norm(txt_proj(e.astype(self.dtype)))

        kv = kv_norm(vis_tokens).astype(self.dtype)  # K = V (sgm_head.py:117-119)

        def attend(q):
            logits = jnp.einsum("bld,bnd->bln", q.astype(self.dtype), kv,
                                preferred_element_type=jnp.float32)
            a = jax.nn.softmax(logits / (d_vis ** 0.5), axis=-1)
            out = jnp.einsum("bln,bnd->bld", a.astype(kv.dtype), kv,
                             preferred_element_type=jnp.float32)
            return drop(out)

        logits_l = classifier(attend(query(left, dir_l)))
        logits_r = classifier(attend(query(right, dir_r)))

        def ce(logits):
            lp = jax.nn.log_softmax(logits, axis=-1)
            return -jnp.take_along_axis(lp, tgt[..., None], axis=-1)[..., 0]

        loss = (ce(logits_l) + ce(logits_r)) * mask
        denom = jnp.maximum(mask.sum(), 1.0)
        return loss.sum() / (2.0 * denom)
