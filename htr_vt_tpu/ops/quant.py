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


def _quantize_static(x: jax.Array, amax: jax.Array):
    """Per-tensor int8 with a CALIBRATED abs-max. Unlike the dynamic path,
    the scale is data-independent, so XLA fuses the round/clip/cast into the
    activation's producer — no extra full-tensor amax + quantize passes
    (measured: dynamic quantization's overhead exactly cancels the int8 MXU
    win; static recovers it)."""
    scale = jnp.maximum(amax.astype(jnp.float32), 1e-12) / 127.0
    q = jnp.clip(jnp.round(x.astype(jnp.float32) / scale), -127, 127)
    return q.astype(jnp.int8), scale


def conv_int8(x: jax.Array, w: jax.Array, strides=(1, 1),
              padding=((1, 1), (1, 1)), amax=None, xq=None, sx=None) -> jax.Array:
    """NHWC conv with A8W8 quantization, f32 output.

    x: [B, H, W, Ci] float; w: [kh, kw, Ci, Co] float. ``amax``: calibrated
    activation abs-max for the static path; None -> dynamic per-tensor.
    ``xq``/``sx``: an already-quantized activation + its scale (the s8-domain
    maxpool path, models/stem.py round 5) — skips quantization here entirely.
    """
    if xq is None:
        xq, sx = (_quantize_static(x, amax) if amax is not None
                  else _quantize_tensor(x))
    wq, sw = _quantize_channels(w)
    acc = jax.lax.conv_general_dilated(
        xq, wq, strides, padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32)
    return acc.astype(jnp.float32) * (sx * sw)


def conv_int8_bf16(x, w, strides=(1, 1), padding=((1, 1), (1, 1)),
                   amax=None, xq=None, sx=None) -> jax.Array:
    """conv_int8 with a bf16 dequant epilogue (serving stem, round 5): the
    per-channel dequant over a [B,H,W,C] s8 accumulator is VPU-bound; bf16
    noise (2^-8) sits below the s8 requant granularity downstream."""
    if xq is None:
        xq, sx = (_quantize_static(x, amax) if amax is not None
                  else _quantize_tensor(x))
    wq, sw = _quantize_channels(w)
    acc = jax.lax.conv_general_dilated(
        xq, wq, strides, padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32)
    return acc.astype(jnp.bfloat16) * (sx * sw).astype(jnp.bfloat16)


def dot_int8(x: jax.Array, w: jax.Array, amax=None,
             dequant_dtype=jnp.float32) -> jax.Array:
    """[..., K] @ [K, N] with A8W8 quantization, ``dequant_dtype`` output.

    ``dequant_dtype=bfloat16`` halves the VPU cost of the dequant epilogue
    over the [M, N] accumulator (measured on the serving ViT, round 5); the
    bf16 mantissa (2^-8) sits below the s8 requantization granularity that
    follows on the serving path, so the noise budget is unchanged."""
    xq, sx = (_quantize_static(x, amax) if amax is not None
              else _quantize_tensor(x))
    wq, sw = _quantize_channels(w)
    acc = jax.lax.dot_general(
        xq, wq, dimension_numbers=(((x.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)
    return acc.astype(dequant_dtype) * (sx * sw).astype(dequant_dtype)


def pad_stage1_tree(params: dict, batch_stats: dict, to: int = 256):
    """Zero-pad the stem's stage1 width (192 -> ``to``) in a checkpoint tree
    so it loads into a model built with ``quant_stage1_pad = to``.

    Exactness argument (test-pinned, tests/test_quant.py): padded kernel
    output-channels, BN biases and running means are 0 and padded BN
    gammas/vars are 1, so every padded channel computes
    relu(0 * rsqrt(1+eps) + 0) = 0 through the whole stage; padded kernel
    *input*-channels are 0, so those zeros contribute nothing to the live
    192 channels — the logits are bit-identical to the unpadded model
    (modulo the int8 quantization the pad exists to enable: per-tensor
    activation amax and per-channel weight scales are unchanged by zeros).

    Returns new (params, batch_stats); inputs are not mutated. A tree whose
    stage1 is already ``to`` wide passes through unchanged (idempotent).
    """
    # jnp ops keep device-resident leaves on device: an np-based transform
    # was measured to silently re-upload the whole padded tree through the
    # tunnel on EVERY jit call (bench int8 5,500 -> 547 img/s, round 5).
    def pad(a, axis, width):
        a = jnp.asarray(a)
        if a.shape[axis] == width:
            return a
        pads = [(0, 0)] * a.ndim
        pads[axis] = (0, width - a.shape[axis])
        return jnp.pad(a, pads)

    def pad_const(a, width, value):
        a = jnp.asarray(a)
        if a.shape[0] == width:
            return a
        return jnp.concatenate(
            [a, jnp.full((width - a.shape[0],), value, a.dtype)])

    params = jax.tree.map(lambda x: x, params)          # shallow-safe copies
    batch_stats = jax.tree.map(lambda x: x, batch_stats)
    p = params["stem"]
    s = batch_stats["stem"]

    def pad_bn(block, names):
        for bn in names:
            if bn not in p[block]:
                continue
            p[block][bn] = dict(p[block][bn])
            p[block][bn]["scale"] = pad_const(p[block][bn]["scale"], to, 1.0)
            p[block][bn]["bias"] = pad_const(p[block][bn]["bias"], to, 0.0)
            s[block][bn] = dict(s[block][bn])
            s[block][bn]["mean"] = pad_const(s[block][bn]["mean"], to, 0.0)
            s[block][bn]["var"] = pad_const(s[block][bn]["var"], to, 1.0)

    def pad_kernel(block, conv, axes):
        k = p[block][conv]["kernel"]
        for ax in axes:
            k = pad(k, ax, to)
        p[block] = dict(p[block])
        p[block][conv] = {"kernel": k}

    for block in ("stage1_block1", "stage1_block2", "stage2_block1"):
        p[block] = dict(p[block])
        s[block] = dict(s.get(block, {}))
    # stage entry: inputs stay 192 (conv1 output), outputs pad to `to`.
    pad_kernel("stage1_block1", "conv1", (3,))
    pad_kernel("stage1_block1", "conv2", (2, 3))
    if "proj_conv" in p["stage1_block1"]:
        pad_kernel("stage1_block1", "proj_conv", (3,))
    pad_bn("stage1_block1", ("bn1", "bn2", "proj_bn"))
    pad_kernel("stage1_block2", "conv1", (2, 3))
    pad_kernel("stage1_block2", "conv2", (2, 3))
    pad_bn("stage1_block2", ("bn1", "bn2"))
    # stage exit: stage2's entry convs read the padded activations.
    pad_kernel("stage2_block1", "conv1", (2,))
    if "proj_conv" in p["stage2_block1"]:
        pad_kernel("stage2_block1", "proj_conv", (2,))
    params["stem"] = p
    batch_stats["stem"] = s
    return params, batch_stats


def serving_arrays(cfg_model, params: dict, batch_stats: dict):
    """Adapt checkpoint trees to the serving model built from ``cfg_model``:
    zero-pads stage1 when the int8 path runs with ``quant_stage1_pad`` (the
    default serving configuration since round 5). No-op otherwise. Every
    int8 entry point (cli/{test,serve,export,infer}.py, bench.py) routes
    through this so the pad policy has one home."""
    from htr_vt_tpu.models.htr_vt import _stage1_pad_applies
    if (getattr(cfg_model, "stem", "resnet18") == "resnet18"
            and _stage1_pad_applies(cfg_model)):
        return pad_stage1_tree(params, batch_stats,
                               cfg_model.quant_stage1_pad)
    return params, batch_stats


def activation_scale(module, name: str, x: jax.Array):
    """Flax helper for calibrated activation scales.

    Returns (mode, amax):
      - ("calibrate", None): the 'quant_stats' collection is mutable — record
        the running abs-max under ``name`` and run FLOAT math this pass;
      - ("static", amax): a calibrated abs-max exists — use the fused path;
      - ("dynamic", None): no calibration available — dynamic per-tensor.
    """
    if module.is_mutable_collection("quant_stats"):
        v = module.variable("quant_stats", name,
                            lambda: jnp.zeros((), jnp.float32))
        v.value = jnp.maximum(v.value,
                              jnp.max(jnp.abs(x.astype(jnp.float32))))
        return "calibrate", None
    if module.has_variable("quant_stats", name):
        return "static", module.get_variable("quant_stats", name)
    return "dynamic", None


def calibrate_quant_stats(model, base_vars: dict, image_batches,
                          n_batches: int = 4) -> dict:
    """Calibrate static activation scales: float forwards recording a RUNNING
    abs-max into the 'quant_stats' collection (a single batch can
    under-estimate the scale and silently clip later activations).

    model: the flax model (quant="int8"); base_vars: {"params", "batch_stats"}
    WITHOUT quant_stats; image_batches: iterable of [B,H,W,1] float arrays of
    one fixed shape (one compiled program). Returns the quant_stats
    collection to merge into the serving variables. Shared by
    cli/{test,export,serve}.py so the calibration scheme has one home.
    """
    calib_fn = jax.jit(lambda img, stats: model.apply(
        {**base_vars, "quant_stats": stats},
        img, train=False, mutable=["quant_stats"])[1]["quant_stats"])
    stats = None
    for bi, img in enumerate(image_batches):
        if bi >= max(1, n_batches):
            break
        img = jnp.asarray(img)
        if stats is None:
            # Seed the stats pytree with zeros of the right structure so
            # every batch runs the SAME compiled program (passing {} on the
            # first call changes the traced input structure and costs a
            # second full-model compile — tens of seconds on TPU).
            # eval_shape is trace-only: no compile, no device work. Zeros
            # are the running-max identity, so batch 0's result is
            # unchanged.
            shapes = jax.eval_shape(
                lambda im: model.apply(base_vars, im, train=False,
                                       mutable=["quant_stats"])[1]
                ["quant_stats"], img)
            stats = jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype),
                                 shapes)
        stats = calib_fn(img, stats)
    return stats if stats is not None else {}
