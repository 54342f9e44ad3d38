"""Exponential moving average of the full model state.

Matches the reference's ModelEma (model_v1/utils/utils.py:128-173): the EMA
covers the entire state_dict — parameters *and* BatchNorm running statistics —
with a warmup-ramped decay min(decay, (1+n)/(10+n)). The reference passes
n = nb_iter/2 because SAM makes two passes per iteration (train.py:128); the
train step preserves that convention via cfg.ema_halved_updates.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp


def ema_decay_at(num_updates, decay: float):
    n = jnp.asarray(num_updates, jnp.float32)
    return jnp.minimum(decay, (1.0 + n) / (10.0 + n))


def ema_update(ema_tree: Any, new_tree: Any, num_updates, decay: float) -> Any:
    d = ema_decay_at(num_updates, decay)
    return jax.tree.map(
        lambda e, p: (e * d + (1.0 - d) * p.astype(e.dtype)).astype(e.dtype),
        ema_tree, new_tree)
