"""Shared neural-net building blocks (Flax linen).

Replaces the reference's timm imports (``Mlp``, ``DropPath`` —
model_v1/model/HTR_VT.py:4) and its numpy sin-cos positional-embedding helpers
(model_v1/model/HTR_VT.py:86-131) with TPU-friendly JAX implementations.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn


def global_layer_norm(x: jax.Array, eps: float = 1e-5) -> jax.Array:
    """Parameterless LayerNorm over every non-batch dimension.

    Reference applies ``F.layer_norm(x, x.size()[1:])`` to the raw input image
    and to the CTC logits (model_v1/model/HTR_VT.py:134-136, used at :224,:239).
    Computed in float32 regardless of input dtype.
    """
    x32 = x.astype(jnp.float32)
    axes = tuple(range(1, x.ndim))
    mean = jnp.mean(x32, axis=axes, keepdims=True)
    var = jnp.var(x32, axis=axes, keepdims=True)
    return ((x32 - mean) * jax.lax.rsqrt(var + eps)).astype(x.dtype)


def sincos_pos_embed_2d(embed_dim: int, grid_size: Tuple[int, int]) -> np.ndarray:
    """Fixed 2-D sin-cos positional embedding, numerically identical to the
    reference's numpy construction (model_v1/model/HTR_VT.py:86-131).

    grid_size = (gh, gw); returns float32 [gh*gw, embed_dim]. Note the
    reference's meshgrid ordering quirk is preserved (w-first meshgrid, the
    "h" half of the embedding actually encodes the first meshgrid output).
    """
    gh, gw = grid_size
    grid_h = np.arange(gh, dtype=np.float32)
    grid_w = np.arange(gw, dtype=np.float32)
    grid = np.stack(np.meshgrid(grid_w, grid_h), axis=0)  # w first, shapes (gh, gw)
    grid = grid.reshape([2, 1, gh, gw])
    emb_a = _sincos_1d(embed_dim // 2, grid[0])
    emb_b = _sincos_1d(embed_dim // 2, grid[1])
    return np.concatenate([emb_a, emb_b], axis=1).astype(np.float32)


def sincos_pos_embed_1d(embed_dim: int, length: int) -> np.ndarray:
    """1-D sin-cos embedding over ``length`` positions (used by variants whose
    token grid is purely sequential, e.g. the lazy PE in model_sgm_macaron)."""
    return _sincos_1d(embed_dim, np.arange(length, dtype=np.float32)).astype(np.float32)


def _sincos_1d(embed_dim: int, pos: np.ndarray) -> np.ndarray:
    assert embed_dim % 2 == 0
    omega = np.arange(embed_dim // 2, dtype=np.float64)
    omega /= embed_dim / 2.0
    omega = 1.0 / 10000**omega
    pos = pos.reshape(-1)
    out = np.einsum("m,d->md", pos, omega)
    return np.concatenate([np.sin(out), np.cos(out)], axis=1)


class QDense(nn.Module):
    """Dense with an optional dynamic-int8 path (ops/quant.py).

    Parameter tree ({kernel, bias}, shapes) is identical to flax
    ``nn.Dense``, so checkpoints are interchangeable and ``quant`` is a pure
    inference-serving switch."""

    features: int
    use_bias: bool = True
    dtype: jnp.dtype = jnp.bfloat16
    kernel_init: nn.initializers.Initializer = nn.initializers.xavier_uniform()
    quant: bool = False

    @nn.compact
    def __call__(self, x):
        kernel = self.param("kernel", self.kernel_init,
                            (x.shape[-1], self.features))
        quant = self.quant
        if quant:
            from htr_vt_tpu.ops.quant import activation_scale, dot_int8
            mode, amax = activation_scale(self, "amax", x)
            if mode == "calibrate":
                quant = False  # record stats, run float this pass
            else:
                # bf16 dequant: the epilogue over the [M, N] accumulator is
                # VPU-bound at serving shapes; bf16 noise (2^-8) is below the
                # s8 requant granularity downstream (ops/quant.py:dot_int8).
                y = dot_int8(x, kernel, amax=amax, dequant_dtype=self.dtype)
        if not quant:
            y = jax.lax.dot_general(
                x.astype(self.dtype), kernel.astype(self.dtype),
                dimension_numbers=(((x.ndim - 1,), (0,)), ((), ())))
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros, (self.features,))
            y = y + bias.astype(self.dtype)
        return y


class Mlp(nn.Module):
    """Transformer MLP: Dense -> GELU -> drop -> Dense -> drop."""

    hidden_dim: int
    out_dim: Optional[int] = None
    drop_rate: float = 0.0
    dtype: jnp.dtype = jnp.bfloat16
    quant: bool = False
    quick_gelu: bool = False  # int8-serving only (config.quant_gelu)

    @nn.compact
    def __call__(self, x, *, deterministic: bool = True):
        out_dim = self.out_dim or x.shape[-1]
        x = QDense(self.hidden_dim, dtype=self.dtype, quant=self.quant,
                   name="fc1")(x)
        if self.quant and self.quick_gelu:
            # sigmoid-approx GELU (x * sigmoid(1.702 x)): one transcendental
            # instead of erf's polynomial chain. The GELU was the single
            # largest non-matmul cost of the int8 serving step (~0.55 ms per
            # MLP on [128,128,3072] — measured, docs/PERF.md); +10% img/s.
            # computed in the layer dtype (bf16): the sigmoid feeds an s8
            # requant, so bf16 precision is already above the output floor
            x = x * jax.nn.sigmoid(jnp.asarray(1.702, x.dtype) * x)
        else:
            x = nn.gelu(x, approximate=False)
        x = nn.Dropout(self.drop_rate, deterministic=deterministic)(x)
        x = QDense(out_dim, dtype=self.dtype, quant=self.quant, name="fc2")(x)
        x = nn.Dropout(self.drop_rate, deterministic=deterministic)(x)
        return x


class DropPath(nn.Module):
    """Per-sample stochastic depth (timm DropPath equivalent)."""

    rate: float = 0.0

    @nn.compact
    def __call__(self, x, *, deterministic: bool = True):
        if self.rate == 0.0 or deterministic:
            return x
        keep = 1.0 - self.rate
        rng = self.make_rng("dropout")
        shape = (x.shape[0],) + (1,) * (x.ndim - 1)
        mask = jax.random.bernoulli(rng, keep, shape)
        return jnp.where(mask, x / keep, jnp.zeros_like(x)).astype(x.dtype)


class LayerScale(nn.Module):
    """Learnable per-channel residual scale (model_v1/model/HTR_VT.py:41-48)."""

    init_value: float = 1e-5

    @nn.compact
    def __call__(self, x):
        gamma = self.param("gamma", nn.initializers.constant(self.init_value), (x.shape[-1],))
        return x * gamma.astype(x.dtype)


def drop_path_schedule(rate: float, depth: int) -> Sequence[float]:
    """Linearly increasing stochastic-depth schedule (model_window/model/HTR_VT.py:263-264)."""
    if depth <= 1:
        return [rate] * depth
    return [rate * i / (depth - 1) for i in range(depth)]
