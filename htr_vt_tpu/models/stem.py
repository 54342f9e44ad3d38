"""ResNet18 feature stem ("patch embedding").

TPU-native NHWC re-design of the reference stem (model_v1/model/resnet18.py):
a 1-channel conv stem plus three BasicBlock stages with anisotropic strides
that collapse a [B, 64, 512, 1] line image to [B, 1, 128, C] — one token per
4 px of width, height folded away. Stride plan (reference :48-54,:82):

    conv1 (2,1) -> maxpool3 (2,1) -> stage1 (2,1) -> stage2 (2,2)
    -> stage3 (2,2) -> maxpool3 (2,1)

BatchNorm runs in float32; under jit over a batch-sharded array the batch
statistics are computed over the *global* batch (XLA inserts the
cross-replica reduction), which gives sync-BN semantics for data parallelism
without any hand-written collective.

Two BN dataflows share one parameter tree (see BasicBlock): the default
``plain`` normalize-then-conv formulation — measured fastest for the full
SAM training step (round-4 bisect: 497.8 vs 484.4 img/s) — and the
``folded`` form, where each BN produces per-channel (scale, shift) consumed
by conv prologues/epilogues; folded is what the Pallas fused conv
(ops/conv_fused.py), the Pallas BN-stats reduce, and the calibrated int8
serving path build on, so those paths force it.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from htr_vt_tpu.ops.conv_fused import (conv3x3_bn_relu,
                                       conv3x3_bn_relu_reference)

_CONV_INIT = nn.initializers.variance_scaling(2.0, "fan_out", "normal")


def _conv_in(x):
    """Barrier a conv's input so preceding elementwise work fuses into its
    PRODUCER's epilogue, never into this conv's prologue (an XLA conv with a
    fused normalize prologue runs at 33% MFU vs 83-90% clean — measured,
    tools/microbench_conv3.py). The barrier's transpose is a barrier, so
    dgrad convolutions get the same protection in the backward pass."""
    return jax.lax.optimization_barrier(x)


def _int8_pays(cin: int, cout: int) -> bool:
    """int8 beats bf16 on the MXU only when the contraction tiles fully.
    Measured twice: round 2 on the dynamic path (stage2/3 1.7-1.9x, stage1
    1.0x) and round 3 on the static calibrated path with s8-in/s8-out fusion
    chains (whole-step 4,115 img/s with int8 stage1 vs 4,248 without) — the
    192-channel stage1 convs stay float either way (docs/PERF.md).

    Round 5: with quant_stage1_pad=256 the stage1 convs become 256-channel
    and pass this gate; measured 92-95% of the int8 peak in-model (the 192-ch
    claim was right, and padding is the fix). HTRVT_INT8_ENTRY=1 additionally
    int8s the 192-in stage-entry convs (cin=192, cout%128==0) — measurement
    knob for the pad campaign."""
    import os
    if (os.environ.get("HTRVT_INT8_ENTRY") == "1"
            and cout % 128 == 0 and cout >= 256 and cin % 64 == 0):
        return True
    return cin % 128 == 0 and cout % 128 == 0 and min(cin, cout) >= 256


def _use_pallas(impl: str, cin: int, cout: int) -> bool:
    # "auto" resolves to XLA — the measured verdict (docs/PERF.md, r2): the
    # Pallas fused conv trio (fwd + dgrad/wgrad, prologue/epilogue fused)
    # runs stage2 at ~94% and stage3 at ~85% MFU in-model, but (a) stage1's
    # 192 channels cap the per-tap dots at 75% K x 75% N tiling (~56%) where
    # XLA's clean conv reaches 83-90%, and (b) each XLA<->Pallas boundary
    # pays a layout copy (XLA lays conv operands batch-minor {0,3,2,1};
    # Pallas requires row-major), so the end-to-end step is a wash at best:
    # 469.6 img/s best-mixed-Pallas vs 470.4 all-XLA, 418 all-Pallas.
    # conv_impl="pallas" keeps the kernels reachable (tested, SPMD-ruled).
    if impl == "auto":
        return False
    return impl == "pallas"


class _Conv3x3(nn.Module):
    """Parameter holder keeping the flax tree path ``<name>/kernel``."""

    features: int
    in_features: int
    ksize: int = 3

    @nn.compact
    def __call__(self):
        return self.param("kernel", _CONV_INIT,
                          (self.ksize, self.ksize, self.in_features,
                           self.features))


class FoldedBatchNorm(nn.Module):
    """BatchNorm that returns folded per-channel (scale, shift) instead of a
    normalized tensor: ``scale = gamma / sqrt(var + eps)``,
    ``shift = beta - mean * scale``. Same parameter/stat tree names as
    flax.linen.BatchNorm ({scale, bias} / {mean, var}); same biased-variance
    running-average convention (torch tracks unbiased — documented deviation,
    tests/test_torch_parity.py)."""

    momentum: float = 0.9
    epsilon: float = 1e-5
    stats_impl: str = "auto"  # auto | pallas | xla (ops/bn_stats.py)

    @nn.compact
    def __call__(self, x_raw, *, train: bool):
        c = x_raw.shape[-1]
        gamma = self.param("scale", nn.initializers.ones, (c,))
        beta = self.param("bias", nn.initializers.zeros, (c,))
        ra_mean = self.variable("batch_stats", "mean",
                                lambda: jnp.zeros((c,), jnp.float32))
        ra_var = self.variable("batch_stats", "var",
                               lambda: jnp.ones((c,), jnp.float32))
        if train:
            if self.stats_impl == "pallas" and x_raw.ndim == 4:
                # One-pass Pallas sum/sumsq reduce (ops/bn_stats.py). "auto"
                # resolves to XLA — measured verdict in docs/PERF.md (r3).
                from htr_vt_tpu.ops.bn_stats import bn_stats
                s, q = bn_stats(
                    x_raw, interpret=jax.default_backend() not in ("tpu",))
                n = 1
                for d in x_raw.shape[:-1]:
                    n *= d
                mu = s / n
                var = jnp.maximum(q / n - jnp.square(mu), 0.0)
            else:
                xf = x_raw.astype(jnp.float32)
                axes = tuple(range(x_raw.ndim - 1))
                mu = jnp.mean(xf, axes)
                var = jnp.maximum(
                    jnp.mean(jnp.square(xf), axes) - jnp.square(mu), 0.0)
            if not self.is_initializing():
                m = self.momentum
                ra_mean.value = m * ra_mean.value + (1.0 - m) * mu
                ra_var.value = m * ra_var.value + (1.0 - m) * var
        else:
            mu, var = ra_mean.value, ra_var.value
        scale = gamma.astype(jnp.float32) * jax.lax.rsqrt(var + self.epsilon)
        shift = beta.astype(jnp.float32) - mu * scale
        return scale, shift


class BasicBlock(nn.Module):
    """torch BasicBlock (model_v1/model/resnet18.py:10-39) with folded BN:

        y1 = conv1(x); y2 = conv2(relu(bn1 . y1));  # bn1 fused as prologue
        out = relu(bn2 . y2 + (proj_bn . proj(x) | x))  # one elementwise pass
    """

    features: int
    strides: Tuple[int, int] = (1, 1)
    use_projection: bool = False
    dtype: jnp.dtype = jnp.bfloat16
    bn_momentum: float = 0.9
    conv_impl: str = "auto"  # auto | pallas | xla
    bn_stats_impl: str = "auto"  # auto | pallas | xla (ops/bn_stats.py)
    quant: bool = False  # dynamic-int8 convs (inference only; ops/quant.py)
    quant_entry: bool = False  # int8 also for the 192-in stage-entry convs
    # s8-carry serving chain: quantize this block's OUTPUT with its own
    # calibrated "out_amax" and return (q, scale) instead of bf16, so the
    # next block's conv reads s8 directly and its residual dequantizes the
    # same s8 — removes the per-block bf16->s8 requant passes (2x 0.6 ms at
    # stage1 shapes, round 5).
    emit_quant: bool = False
    dataflow: str = "plain"  # plain | folded (see __call__ docstring)

    @nn.compact
    def __call__(self, x, *, train: bool = False, pre_quant=None):
        dt = self.dtype
        cin = pre_quant[0].shape[-1] if pre_quant is not None else x.shape[-1]
        # Two dataflows over the SAME parameter/stat tree (conv*/kernel,
        # bn*/{scale,bias} + {mean,var}), checkpoint-interchangeable:
        #   plain  — normalize-then-conv with flax BatchNorm, the round-1
        #            formulation. Measured FASTER for the full SAM train step
        #            (497.8 vs 484.4 img/s at the flagship shapes): XLA
        #            schedules the separate normalize pass better than the
        #            folded form's scale/shift epilogue graph in the
        #            backward pass (round-4 regression bisect, docs/PERF.md).
        #   folded — BN as per-channel (scale, shift) consumed by conv
        #            prologues/epilogues; required by the Pallas fused conv
        #            (conv_impl=pallas), the Pallas BN-stats reduce, and the
        #            calibrated int8 serving path (quant), which quantizes
        #            the normalized activations.
        # plain is a TRAIN-mode win only (497.5 vs 484 img/s full SAM step);
        # in eval the folded form is faster (3,535 vs 2,585 img/s float
        # serving — the eval normalize is a constant affine that folds into
        # the conv chain). The two are bit-identical in eval over the same
        # tree, so the mode picks the dataflow.
        if (self.dataflow == "plain" and train and not self.quant
                and not _use_pallas(self.conv_impl, cin, self.features)
                and self.bn_stats_impl != "pallas"):
            bnp = lambda name: nn.BatchNorm(
                use_running_average=not train, momentum=self.bn_momentum,
                epsilon=1e-5, dtype=jnp.float32, name=name)
            residual = x.astype(dt)
            y = nn.Conv(self.features, (3, 3), strides=self.strides,
                        padding=((1, 1), (1, 1)), use_bias=False, dtype=dt,
                        kernel_init=_CONV_INIT, name="conv1")(residual)
            y = bnp("bn1")(y).astype(dt)
            y = nn.relu(y)
            y = nn.Conv(self.features, (3, 3), strides=(1, 1),
                        padding=((1, 1), (1, 1)), use_bias=False, dtype=dt,
                        kernel_init=_CONV_INIT, name="conv2")(y)
            y = bnp("bn2")(y).astype(dt)
            if self.use_projection:
                residual = nn.Conv(self.features, (1, 1), strides=self.strides,
                                   padding="VALID", use_bias=False, dtype=dt,
                                   kernel_init=_CONV_INIT,
                                   name="proj_conv")(residual)
                residual = bnp("proj_bn")(residual).astype(dt)
            return nn.relu(y + residual)
        sites = {"conv1": (cin, self.features),
                 "conv2": (self.features, self.features)}
        if self.quant:
            from htr_vt_tpu.ops.quant import activation_scale, conv_int8

            def site_int8(site):
                c_in, c_out = sites.get(site, (cin, self.features))
                if _int8_pays(c_in, c_out):
                    return True
                # Stage-entry convs (cin=192 into a 256-padded stage): int8
                # measured 1.87 ms vs 2.53 float in-model at [128,16,512,192]
                # ->256 (round 5) — the contraction (9x192) tiles fine; only
                # the OUTPUT width needed the 256 pad.
                return (self.quant_entry and site in ("conv1", "proj")
                        and c_out % 128 == 0 and c_out >= 256
                        and c_in % 64 == 0)

            def conv_fn(site):
                if not site_int8(site):
                    # 192-channel convs without the pad run the int8 conv no
                    # faster than the 83-90%-MFU bf16 conv (measured 2.0 ms
                    # either way, docs/PERF.md) — keep those float: same
                    # speed, zero added quantization noise.
                    return conv3x3_bn_relu_reference

                def q(x, k, scale=None, shift=None, *, strides=(1, 1),
                      relu=True):
                    from htr_vt_tpu.ops.quant import conv_int8_bf16
                    if isinstance(x, tuple):
                        # Pre-quantized s8 input from the stem's s8-domain
                        # maxpool (quantize-before-pool is exact: round is
                        # monotone, so max(q(x)) == q(max(x))).
                        xq_in, sx_in = x
                        return conv_int8_bf16(None, k, strides, xq=xq_in,
                                              sx=sx_in)
                    if scale is not None:
                        a = (x.astype(dt) * scale.astype(dt)
                             + shift.astype(dt))
                        if relu:
                            a = jnp.maximum(a, jnp.asarray(0.0, dt))
                        x = a
                    mode, amax = activation_scale(self, f"{site}_amax", x)
                    if mode == "calibrate":
                        return conv3x3_bn_relu_reference(
                            x, k, strides=strides, relu=False)
                    return conv_int8_bf16(x, k, strides, amax=amax)
                return q
        else:
            def conv_fn(site):
                c_in, c_out = sites[site]
                return (conv3x3_bn_relu
                        if _use_pallas(self.conv_impl, c_in, c_out)
                        else conv3x3_bn_relu_reference)
        bn = lambda name: FoldedBatchNorm(momentum=self.bn_momentum,
                                          stats_impl=self.bn_stats_impl,
                                          name=name)

        if pre_quant is not None:
            assert self.quant, "pre-quantized input requires the int8 path"
            x_in = pre_quant
        else:
            x = _conv_in(x.astype(dt))
            x_in = x
        k1 = _Conv3x3(self.features, cin, name="conv1")().astype(dt)
        k2 = _Conv3x3(self.features, self.features, name="conv2")().astype(dt)

        y1 = conv_fn("conv1")(x_in, k1, strides=self.strides)
        s1, t1 = bn("bn1")(y1, train=train)
        y2 = conv_fn("conv2")(y1, k2, s1, t1, strides=(1, 1), relu=True)
        s2, t2 = bn("bn2")(y2, train=train)

        if self.use_projection:
            kp = _Conv3x3(self.features, cin, ksize=1, name="proj_conv")()
            proj_mode = None
            quant_proj = self.quant and (
                _int8_pays(cin, self.features)
                or (self.quant_entry and self.features % 128 == 0
                    and self.features >= 256 and cin % 64 == 0))
            if pre_quant is not None:
                from htr_vt_tpu.ops.quant import conv_int8_bf16
                p = conv_int8_bf16(None, kp.astype(dt), self.strides,
                                   padding=((0, 0), (0, 0)),
                                   xq=pre_quant[0], sx=pre_quant[1])
            else:
                if quant_proj:
                    from htr_vt_tpu.ops.quant import (activation_scale,
                                                      conv_int8)
                    proj_mode, amax = activation_scale(self, "proj_amax", x)
                if quant_proj and proj_mode != "calibrate":
                    p = conv_int8(x, kp.astype(dt), self.strides,
                                  padding=((0, 0), (0, 0)),
                                  amax=amax).astype(dt)
                else:
                    p = jax.lax.conv_general_dilated(
                        x, kp.astype(dt), self.strides, "VALID",
                        dimension_numbers=("NHWC", "HWIO", "NHWC"))
            sp, tp = bn("proj_bn")(p, train=train)
            # Serving (quant) epilogues run in bf16 — VPU-bound passes over
            # [B,H,W,C]; bf16 noise is below the s8 requant floor. Training
            # and float eval keep f32.
            ept = dt if self.quant else jnp.float32
            residual = p.astype(ept) * sp.astype(ept) + tp.astype(ept)
        elif pre_quant is not None:
            # identity residual read straight from the s8 carry (same values
            # the convs consume; dequant fuses into the output pass)
            ept = dt if self.quant else jnp.float32
            residual = (pre_quant[0].astype(ept)
                        * pre_quant[1].astype(ept))
        else:
            ept = dt if self.quant else jnp.float32
            residual = x.astype(ept)

        out = jnp.maximum(y2.astype(ept) * s2.astype(ept) + t2.astype(ept)
                          + residual, jnp.asarray(0.0, ept))
        if self.quant and self.emit_quant:
            from htr_vt_tpu.ops.quant import (_quantize_static,
                                              activation_scale)
            mode, amax = activation_scale(self, "out_amax", out.astype(dt))
            if mode == "static":
                return _quantize_static(out, amax)  # (q, scale) carry
        return out.astype(dt)


def _max_pool_3x3(x, strides: Tuple[int, int]):
    # torch MaxPool2d(kernel_size=3, stride, padding=1). XLA's native
    # select-and-scatter backward (first-match ties, same as torch) wins on
    # TPU — a scatter-based custom VJP was measured at 2x slower end-to-end
    # and removed (docs/PERF.md), so the native op stays.
    return nn.max_pool(x, window_shape=(3, 3), strides=strides,
                       padding=((1, 1), (1, 1)))


class ResNet18Stem(nn.Module):
    """Maps [B, H, W, 1] -> [B, H', W', widths[-1]] (NHWC).

    Default plan reproduces the baseline stem ([B,64,512,1] -> [B,1,128,D]).
    The VAN variants truncate stages and change strides
    (model_sgm_mms_attach_van/model/resnet18.py:42-84 stops after layer2 with
    layer1 stride (2,2) and no final pool; the van_2 resnet adds a full-width
    layer3 with stride (1,2)) — expressed here as data.
    """

    embed_dim: int = 768
    dtype: jnp.dtype = jnp.bfloat16
    widths: Optional[Sequence[int]] = None  # default: [D/4, D/2, D]
    stage_strides: Sequence[Tuple[int, int]] = ((2, 1), (2, 2), (2, 2))
    final_maxpool: bool = True
    conv_impl: str = "auto"
    pool_impl: str = "auto"  # auto | pallas | xla (ops/pool_fused.py)
    bn_stats_impl: str = "auto"  # auto | pallas | xla (ops/bn_stats.py)
    quant: bool = False  # int8 stage convs (inference; conv1 at Cin=1 stays float)
    dataflow: str = "plain"  # plain | folded (BasicBlock docstring)

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        c = self.embed_dim // 4
        widths = list(self.widths) if self.widths is not None else \
            [self.embed_dim // 4, self.embed_dim // 2, self.embed_dim]
        # int8 serving with a 256-padded stage1 (quant_stage1_pad): the stage
        # entry convs run int8 too, and the conv1->bn1->relu->maxpool chain
        # quantizes BEFORE the pool so the pool runs in the s8 domain.
        s1_int8_entry = (self.quant and widths[0] % 128 == 0
                         and widths[0] >= 256)
        pre = None
        x = x.astype(self.dtype)
        x = nn.Conv(c, (3, 3), strides=(2, 1), padding=((1, 1), (1, 1)), use_bias=False,
                    dtype=self.dtype, kernel_init=_CONV_INIT, name="conv1")(x)
        if s1_int8_entry and self.pool_impl != "pallas":
            # Serving fast path: eval-BN is a constant per-channel affine, so
            # bn1+relu+quantize fold into conv1's epilogue (calibrated static
            # scale), and the 3x3 maxpool runs IN s8 — exact, because round
            # is monotone so max(q(x)) == q(max(x)). The model's largest
            # activation is then written once at 1 byte/elem instead of
            # bf16, and the stage1 entry convs read pre-quantized input
            # (measured round 5: conv1+bn+pool+quant 4.4 -> ~1.9 ms).
            from htr_vt_tpu.ops.quant import (_quantize_static,
                                              activation_scale)
            s1, t1 = FoldedBatchNorm(momentum=0.9,
                                     stats_impl=self.bn_stats_impl,
                                     name="bn1")(x, train=train)
            a = jnp.maximum(x.astype(jnp.float32) * s1 + t1, 0.0)
            mode, amax = activation_scale(self, "pool_amax",
                                          a.astype(self.dtype))
            if mode == "static":
                xq, sx = _quantize_static(a, amax)
                xq = jax.lax.reduce_window(
                    xq, jnp.int8(-128), jax.lax.max, (1, 3, 3, 1),
                    (1, 2, 1, 1), ((0, 0), (1, 1), (1, 1), (0, 0)))
                pre = (xq, sx)
            else:
                # calibrate/dynamic: float pool (records the pre-pool scale)
                x = a.astype(self.dtype)
                x = _max_pool_3x3(x, (2, 1))
        elif self.pool_impl == "pallas":
            # Fused BN-apply + ReLU + maxpool Pallas kernel: touches the
            # model's largest activation once per direction and folds the
            # select-and-scatter backward + BN reductions into one pass
            # (ops/pool_fused.py). Same {scale,bias}/{mean,var} tree names.
            from htr_vt_tpu.ops.pool_fused import max_pool_bn_relu
            s1, t1 = FoldedBatchNorm(momentum=0.9,
                                     stats_impl=self.bn_stats_impl,
                                     name="bn1")(x, train=train)
            x = max_pool_bn_relu(x, s1, t1)
        elif self.bn_stats_impl == "pallas":
            # Same math as the flax-BN branch but with the stats reduce done
            # by the one-pass Pallas kernel; the normalize+ReLU stays an XLA
            # elementwise pass (identical tree names {scale,bias}/{mean,var}).
            s1, t1 = FoldedBatchNorm(momentum=0.9, stats_impl="pallas",
                                     name="bn1")(x, train=train)
            x = jnp.maximum(x.astype(jnp.float32) * s1 + t1,
                            0.0).astype(self.dtype)
            x = _max_pool_3x3(x, (2, 1))
        else:
            # flax BN: the normalize+ReLU is a standalone bandwidth pass over
            # the [B, H/2, W, C] conv1 output (it cannot fuse into its
            # producer — train-BN needs the full-tensor stats first).
            x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                             epsilon=1e-5, dtype=jnp.float32,
                             name="bn1")(x).astype(self.dtype)
            x = nn.relu(x)
            x = _max_pool_3x3(x, (2, 1))

        in_width = c
        # s8-carry chain (int8 serving with the 256 pad): every block hands
        # its successor (q, scale) instead of bf16 — the carry is a tuple
        # whenever the producing block ran in static-quant mode.
        carry = pre if pre is not None else x
        n_stages = len(widths)
        for si, (w, strides) in enumerate(zip(widths, self.stage_strides)):
            needs_proj = strides != (1, 1) or in_width != w
            for bi, (st, proj) in enumerate(((strides, needs_proj),
                                             ((1, 1), False))):
                last = si == n_stages - 1 and bi == 1
                blk = BasicBlock(w, st, use_projection=proj, dtype=self.dtype,
                                 conv_impl=self.conv_impl, quant=self.quant,
                                 bn_stats_impl=self.bn_stats_impl,
                                 quant_entry=s1_int8_entry and si == 0,
                                 emit_quant=s1_int8_entry and not last,
                                 dataflow=self.dataflow,
                                 name=f"stage{si + 1}_block{bi + 1}")
                if isinstance(carry, tuple):
                    carry = blk(None, train=train, pre_quant=carry)
                else:
                    carry = blk(carry, train=train)
            in_width = w
        x = carry

        if self.final_maxpool:
            x = _max_pool_3x3(x, (2, 1))
        return x
