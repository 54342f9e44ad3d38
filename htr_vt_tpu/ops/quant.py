"""Dynamic int8 quantized conv/matmul for inference.

The v5e MXU runs int8 x int8 -> int32 at twice the bf16 rate (394 vs 197
TOPS), which is the route to the BASELINE >=5x inference target (the
exact-FLOPs bf16 roofline is ~4x the 4090 estimate; int8 lifts it to ~8x).
This module provides the two quantized contractions used by the eval path:

- per-tensor DYNAMIC activation scale: ``sx = amax(|x|) / 127`` computed on
  the fly (one cheap reduction; no calibration pass, no stored state);
- per-output-channel weight scale: ``sw[o] = amax(|w[..., o]|) / 127``
  (computed in-graph from the float weights — XLA folds it for fixed
  weights across steps);
- int8 conv / dot with int32 accumulation, dequantized as
  ``y = conv(xq, wq) * sx * sw``.

Training stays untouched — quantization is an inference-serving feature the
reference does not have (it serves fp32); wiring lives behind
``ModelConfig.quant == "int8"`` (eval path only).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _quantize_tensor(x: jax.Array):
    """Per-tensor symmetric int8: returns (q, scale)."""
    amax = jnp.max(jnp.abs(x.astype(jnp.float32)))
    scale = jnp.maximum(amax, 1e-12) / 127.0
    q = jnp.clip(jnp.round(x.astype(jnp.float32) / scale), -127, 127)
    return q.astype(jnp.int8), scale


def _quantize_channels(w: jax.Array):
    """Per-output-channel (last axis) symmetric int8: (q, scale[cout])."""
    axes = tuple(range(w.ndim - 1))
    amax = jnp.max(jnp.abs(w.astype(jnp.float32)), axis=axes)
    scale = jnp.maximum(amax, 1e-12) / 127.0
    q = jnp.clip(jnp.round(w.astype(jnp.float32) / scale), -127, 127)
    return q.astype(jnp.int8), scale


def conv_int8(x: jax.Array, w: jax.Array, strides=(1, 1),
              padding=((1, 1), (1, 1))) -> jax.Array:
    """NHWC conv with dynamic A8W8 quantization, f32 output.

    x: [B, H, W, Ci] float; w: [kh, kw, Ci, Co] float.
    """
    xq, sx = _quantize_tensor(x)
    wq, sw = _quantize_channels(w)
    acc = jax.lax.conv_general_dilated(
        xq, wq, strides, padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32)
    return acc.astype(jnp.float32) * (sx * sw)


def dot_int8(x: jax.Array, w: jax.Array) -> jax.Array:
    """[..., K] @ [K, N] with dynamic A8W8 quantization, f32 output."""
    xq, sx = _quantize_tensor(x)
    wq, sw = _quantize_channels(w)
    acc = jax.lax.dot_general(
        xq, wq, dimension_numbers=(((x.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)
    return acc.astype(jnp.float32) * (sx * sw)
