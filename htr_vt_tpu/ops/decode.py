"""CTC decoding primitives.

Greedy decode lives on device (argmax + shift-compare collapse + compaction)
so eval ships only [B, T] int32 ids to host instead of [B, T, C] logits —
the reference moves full log-prob tensors to host every batch
(valid.py:40-42). The host-side string assembly stays in CTCLabelConverter
(exact reference semantics).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def greedy_ids(logits: jax.Array) -> jax.Array:
    """[B, T, C] -> [B, T] argmax ids."""
    return jnp.argmax(logits, axis=-1).astype(jnp.int32)


def collapse_ids(ids: jax.Array, blank: int = 0) -> Tuple[jax.Array, jax.Array]:
    """Device-side CTC collapse: drop repeats then blanks, left-compact.

    Returns (collapsed [B, T] zero-padded, lengths [B]). Equivalent to the
    converter's per-string loop (model_v1/utils/utils.py:72-86) but runs as a
    couple of VPU ops + one stable sort.
    """
    b, t = ids.shape
    prev = jnp.concatenate([jnp.full((b, 1), -1, ids.dtype), ids[:, :-1]], axis=1)
    keep = (ids != blank) & (ids != prev)
    lengths = keep.sum(axis=1).astype(jnp.int32)
    # Stable-sort kept symbols to the front: key 0 for kept, 1 for dropped.
    order = jnp.argsort(jnp.where(keep, 0, 1), axis=1, stable=True)
    compacted = jnp.take_along_axis(jnp.where(keep, ids, 0), order, axis=1)
    return compacted, lengths


def greedy_decode(logits: jax.Array, blank: int = 0) -> Tuple[jax.Array, jax.Array]:
    """[B, T, C] logits -> (collapsed ids [B, T], lengths [B])."""
    return collapse_ids(greedy_ids(logits), blank)
