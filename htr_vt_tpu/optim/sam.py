"""Sharpness-Aware Minimization as functional transforms.

The reference wraps AdamW in a stateful two-step optimizer
(model_v1/utils/sam.py: ``first_step`` perturbs parameters by rho*g/||g||,
``second_step`` restores and applies the base update). In a functional world
there is nothing to restore: the train step computes

    grads   = grad(loss)(params)
    params' = params + rho * grads / ||grads||      (perturb, pure)
    grads2  = grad(loss)(params')
    params  = adamw_update(grads2, params)           (update at the ORIGINAL params)

Under data parallelism the gradient is already the global-batch gradient
(XLA all-reduces it when the loss averages over a batch-sharded array), so the
norm here automatically matches single-device semantics — the subtlety called
out in SURVEY §5 (all-reduce *before* the norm) falls out for free.
"""

from __future__ import annotations

from typing import Any, Tuple

import jax
import jax.numpy as jnp
import optax

from htr_vt_tpu.config import OptimConfig
from htr_vt_tpu.optim.schedule import warmup_cosine_lr


def global_grad_norm(grads: Any, params: Any = None, adaptive: bool = False) -> jax.Array:
    """L2 norm over the whole gradient pytree; the adaptive form norms |p|*g
    (reference _grad_norm, model_v1/utils/sam.py:49-59)."""
    if adaptive:
        leaves = jax.tree.leaves(
            jax.tree.map(lambda p, g: jnp.abs(p) * g, params, grads))
    else:
        leaves = jax.tree.leaves(grads)
    return jnp.sqrt(sum(jnp.sum(jnp.square(l.astype(jnp.float32))) for l in leaves))


def sam_perturb(params: Any, grads: Any, rho: float,
                adaptive: bool = False) -> Tuple[Any, jax.Array]:
    """Return (params + e(w), grad_norm) with e(w) = rho * g / (||g|| + 1e-12),
    or rho * p^2 * g / ||.|| in the adaptive form (sam.py:16-27)."""
    gnorm = global_grad_norm(grads, params, adaptive)
    scale = rho / (gnorm + 1e-12)
    if adaptive:
        e_w = jax.tree.map(lambda p, g: jnp.square(p) * g * scale, params, grads)
    else:
        e_w = jax.tree.map(lambda p, g: (g * scale).astype(p.dtype), params, grads)
    return jax.tree.map(jnp.add, params, e_w), gnorm


def make_base_optimizer(cfg: OptimConfig) -> optax.GradientTransformation:
    """AdamW with the reference hyperparameters (model_v1/train.py:94: betas
    (0.9, 0.99), decoupled weight decay on every parameter) driven by the
    warmup-cosine schedule. Weight decay scales with LR exactly like torch."""
    def lr_fn(step):
        return warmup_cosine_lr(step, max_lr=cfg.max_lr, warmup_iters=cfg.warmup_iters,
                                total_iters=cfg.total_iters, min_lr=cfg.min_lr)

    tx = optax.adamw(learning_rate=lr_fn, b1=cfg.beta1, b2=cfg.beta2,
                     eps=cfg.eps, weight_decay=cfg.weight_decay)
    if cfg.grad_clip_norm > 0:
        tx = optax.chain(optax.clip_by_global_norm(cfg.grad_clip_norm), tx)
    return tx
