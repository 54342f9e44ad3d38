"""Learning-rate schedule.

The reference sets LR imperatively every iteration (update_lr_cos,
model_v1/utils/utils.py:42-52): linear warmup then a cosine whose phase is
``pi * nb_iter / (total_iter - warm_up_iter)`` — note the numerator is the
*raw* iteration, not (iter - warmup); that quirk is preserved so loss curves
line up. Here it is a pure function of the step, traced into the jitted train
step (no host->device LR transfer per iteration).
"""

from __future__ import annotations

import jax.numpy as jnp


def warmup_cosine_lr(step, *, max_lr: float, warmup_iters: int, total_iters: int,
                     min_lr: float = 1e-7):
    """LR at integer step (reference formula, utils/utils.py:42-52)."""
    step = jnp.asarray(step, jnp.float32)
    warm = max_lr * (step + 1.0) / (warmup_iters + 1.0)
    phase = jnp.pi * step / max(1, total_iters - warmup_iters)
    cos = min_lr + (max_lr - min_lr) * 0.5 * (1.0 + jnp.cos(phase))
    return jnp.where(step < warmup_iters, warm, cos)
