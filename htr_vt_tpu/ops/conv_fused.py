"""Pallas TPU kernel: 3x3 convolution with a fused BatchNorm-apply prologue.

Why this exists (measured on v5e, bs 128 — docs/PERF.md):

- XLA runs a clean [128,8,512,192]x3x3x192 conv at 1.96-2.13 ms (83-90% MFU)
  but the same conv with the BN normalize fused into its *prologue* at
  5.35 ms (33%): the elementwise prologue is recomputed per conv tap and
  destroys the conv pipeline.
- BN(train) normalize can never fuse into its producer (it needs the
  full-tensor batch statistics first), so pure-XLA code must either eat the
  33% conv or pay a separate full-tensor normalize pass.

This kernel does the normalize at DMA granularity: each grid step loads a raw
conv-output tile into VMEM, applies ``relu(x * scale + shift)`` once on the
VPU, zero-pads in registers, and runs the 9 taps as MXU matmuls. The affine
prologue costs ~nothing; the conv runs at clean-conv speed.

Semantics (torch BasicBlock order, model_v1/model/resnet18.py:10-39):
``y = conv3x3(relu(x * scale + shift))`` with padding 1 applied AFTER the
prologue (torch pads the normalized tensor with zeros). ``scale``/``shift``
are the folded BN terms: ``scale = gamma / sqrt(var + eps)``,
``shift = beta - mean * scale``.

The backward of the stride-1 path is Pallas too (``_dgrad_kernel`` /
``_wgrad_kernel``): dgrad is the same tap-dot structure over the rotated
kernel with the prologue's backward (ReLU mask x scale, plus the dscale /
dshift reductions) fused as an epilogue, and wgrad applies the prologue to
the saved RAW input inside the kernel. Nothing in the fwd+bwd chain of a
stride-1 conv touches an XLA convolution, which removes the
Pallas<->XLA layout copies (XLA lays conv operands out batch-minor
{0,3,2,1}; Pallas requires row-major {3,2,1,0}) that previously ate the
kernel's standalone gain, and no full-tensor normalize pass ever
materializes in either direction.

SPMD: wrapped in ``custom_partitioning`` over the batch axis (same pattern
as ops/ctc_pallas.py) — under a data-sharded mesh each device runs the
kernel on its shard; no mesh side channel.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _pick_tiles(b: int, h: int, w: int, cin: int, cout: int,
                strides: Tuple[int, int]):
    """(batch tile, W-output tile, Cout tile) under the 16 MB VMEM budget.

    Blocks are double-buffered by the pipeline, the padded prologue value and
    the f32 accumulator live alongside them, so keep in/out blocks <= ~1.6 MB
    each (measured: 2x that OOMs scoped vmem at stage1's [_,8,512,192])."""
    sh, sw = strides
    wo = w // sw
    blk = 1_700_000
    # Cout tile: whole unless the weight slab is large (stage3's 768x768).
    # Pallas requires the block's last dim be a multiple of 128 (or whole).
    tco = cout
    for cand in sorted({cout} | {k * 128 for k in range(1, cout // 128 + 1)
                                 if cout % (k * 128) == 0}, reverse=True):
        if 9 * cin * cand * 2 <= 3 * 2**20 or cand == 128:
            tco = cand
            break
    # W-output tile for the f32 accumulator (inner Python-unrolled loop).
    two = wo
    while two > 128 and two % 2 == 0:
        two //= 2
    # Batch tile: keep in+out blocks bounded.
    tb = 1
    while (tb * 2 * h * w * cin * 2 <= blk
           and tb * 2 * (h // sh) * wo * tco * 2 <= blk
           and b % (tb * 2) == 0):
        tb *= 2
    return tb, two, tco


def _conv_kernel(x_ref, k_ref, scale_ref, shift_ref, y_ref, *,
                 strides: Tuple[int, int], relu: bool, prologue: bool,
                 two: int):
    """One (batch-tile, cout-tile) grid step; W processed in unrolled tiles.

    x_ref: [TB, H, W, Cin]; k_ref: [3, 3, Cin, TCo];
    scale/shift_ref: [1, Cin] f32; y_ref: [TB, Ho, Wo, TCo].
    """
    sh, sw = strides
    tb, h, w, cin = x_ref.shape
    ho, wo = y_ref.shape[1], y_ref.shape[2]

    xv = x_ref[:]
    if prologue:
        xn = xv.astype(jnp.float32) * scale_ref[0] + shift_ref[0]
        if relu:
            xn = jnp.maximum(xn, 0.0)
        xv = xn.astype(x_ref.dtype)
    # Zero-pad H and W by 1 (padding of the NORMALIZED tensor, torch order).
    xp = jnp.pad(xv, ((0, 0), (1, 1), (1, 1), (0, 0)))

    # Per-tap dots: for Cin % 128 == 0 these tile exactly on the MXU
    # (measured 96-99% MFU at stage2/3). The stem's 192-channel stage1 is
    # capped by its shape at 75% K x 75% N = 56% per dot (measured 55%);
    # an im2col K=9*Cin single-dot would lift K-tiling to ~96% but Mosaic
    # cannot yet lower the tap concat ("result/input offset mismatch on
    # non-concat dimension") — revisit when it can.
    tco = k_ref.shape[3]

    for wt in range(wo // two):
        w0 = wt * two * sw  # input-column origin of this output tile (padded)
        acc = jnp.zeros((tb * ho * two, tco), jnp.float32)
        for dh in range(3):
            for dw in range(3):
                patch = jax.lax.slice(
                    xp,
                    (0, dh, w0 + dw, 0),
                    (tb, dh + (ho - 1) * sh + 1, w0 + dw + (two - 1) * sw + 1,
                     cin),
                    (1, sh, sw, 1))
                acc = acc + jax.lax.dot_general(
                    patch.reshape(tb * ho * two, cin), k_ref[dh, dw],
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
        y_ref[:, :, wt * two:(wt + 1) * two, :] = (
            acc.reshape(tb, ho, two, tco).astype(y_ref.dtype))


def _conv3x3_pallas_local(x, kernel, scale, shift, *, strides, relu,
                          prologue, interpret=False):
    b, h, w, cin = x.shape
    cout = kernel.shape[3]
    sh, sw = strides
    ho, wo = h // sh, w // sw
    tb, two, tco = _pick_tiles(b, h, w, cin, cout, strides)

    kern = functools.partial(_conv_kernel, strides=strides, relu=relu,
                             prologue=prologue, two=two)
    grid = (cout // tco, b // tb)
    return pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec((tb, h, w, cin), lambda co, bi: (bi, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, 3, cin, tco), lambda co, bi: (0, 0, 0, co),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cin), lambda co, bi: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cin), lambda co, bi: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tb, ho, wo, tco),
                               lambda co, bi: (bi, 0, 0, co),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, ho, wo, cout), x.dtype),
        interpret=interpret,
    )(x, kernel, scale, shift)


@functools.lru_cache(maxsize=None)
def _partitioned_conv(strides, relu, prologue, interpret):
    """Batch-axis SPMD rule for the kernel (custom_partitioning; sharding
    derived from the operands, mirroring ops/ctc_pallas.py)."""
    from jax.experimental.custom_partitioning import custom_partitioning
    from jax.sharding import NamedSharding
    from jax.sharding import PartitionSpec as P

    def impl(x, kernel, scale, shift):
        return _conv3x3_pallas_local(x, kernel, scale, shift, strides=strides,
                                     relu=relu, prologue=prologue,
                                     interpret=interpret)

    fn = custom_partitioning(impl)

    def _batch_axis(arg_shapes):
        spec = arg_shapes[0].sharding.spec
        return spec[0] if len(spec) else None

    def infer(mesh, arg_shapes, result_shape):
        return NamedSharding(mesh, P(_batch_axis(arg_shapes), None, None, None))

    def partition(mesh, arg_shapes, result_shape):
        batch = _batch_axis(arg_shapes)
        args = (NamedSharding(mesh, P(batch, None, None, None)),
                NamedSharding(mesh, P(None, None, None, None)),
                NamedSharding(mesh, P(None, None)),
                NamedSharding(mesh, P(None, None)))
        out = NamedSharding(mesh, P(batch, None, None, None))
        return mesh, impl, out, args

    # need_replication factors must be listed in first-appearance order
    # (Shardy verifier: "indices of special factors must be sorted").
    fn.def_partition(partition=partition, infer_sharding_from_operands=infer,
                     sharding_rule="b h w i, x y i o, u i, v i -> b p q o",
                     need_replication_factors=("h", "w", "i", "x", "y", "o",
                                               "u", "v", "p", "q"))
    return fn


def _vmem_headroom(interpret: bool) -> dict:
    """Raise the kernel's scoped-VMEM cap (default 16 MB) — v5e has 128 MB;
    the in-model stage3 dgrad sits at 16.12 MB with XLA's surrounding buffer
    pressure and OOMs at the default."""
    if interpret:
        return {}
    return {"compiler_params": pltpu.CompilerParams(
        vmem_limit_bytes=64 * 2**20)}


def _pick_cout_tile(cin: int, cout: int, budget: int = 3 * 2**20) -> int:
    """Largest channel tile (multiple of 128 when possible) whose 3x3 weight
    slab fits the budget — mirrors the fwd kernel's rule."""
    for cand in sorted({cout} | {k * 128 for k in range(1, cout // 128 + 1)
                                 if cout % (k * 128) == 0}, reverse=True):
        if 9 * cin * cand * 2 <= budget or cand == 128 or cand == cout:
            return cand
    return cout


def _pick_batch_tile(b: int, per_sample_bytes: int,
                     blk: int = 1_700_000) -> int:
    tb = 1
    while b % (tb * 2) == 0 and tb * 2 * per_sample_bytes <= blk:
        tb *= 2
    return tb


def _dgrad_kernel(g_ref, k_ref, x_ref, scale_ref, shift_ref,
                  dx_ref, dscale_ref, dshift_ref, *,
                  relu: bool, prologue: bool, two: int):
    """dx tile of ``conv3x3(relu(x*scale+shift), k)`` plus the prologue's
    backward, one (cin-tile, batch-tile) grid step.

    g_ref: [TB, H, W, Cout] upstream cotangent; k_ref: [3, 3, Cout, TCi]
    ROTATED kernel (krot[dh,dw,co,ci] = k[2-dh,2-dw,ci,co]); x_ref:
    [TB, H, W, TCi] RAW saved input; dx_ref same shape;
    dscale/dshift_ref: [1, TCi] f32 accumulated across the batch grid axis
    (innermost), initialized at batch step 0.
    """
    tb, h, w, _ = g_ref.shape
    tci = dx_ref.shape[3]
    bi = pl.program_id(1)

    gp = jnp.pad(g_ref[:], ((0, 0), (1, 1), (1, 1), (0, 0)))

    ds_acc = jnp.zeros((1, tci), jnp.float32)
    dt_acc = jnp.zeros((1, tci), jnp.float32)
    for wt in range(w // two):
        w0 = wt * two
        acc = jnp.zeros((tb * h * two, tci), jnp.float32)
        for dh in range(3):
            for dw in range(3):
                patch = jax.lax.slice(
                    gp, (0, dh, w0 + dw, 0),
                    (tb, dh + h, w0 + dw + two, gp.shape[3]))
                acc = acc + jax.lax.dot_general(
                    patch.reshape(tb * h * two, gp.shape[3]), k_ref[dh, dw],
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
        da = acc.reshape(tb, h, two, tci)
        if prologue:
            xt = x_ref[:, :, w0:w0 + two, :].astype(jnp.float32)
            if relu:
                a = xt * scale_ref[0] + shift_ref[0]
                da = jnp.where(a > 0.0, da, 0.0)
            ds_acc = ds_acc + jnp.sum(da * xt, (0, 1, 2))[None, :]
            dt_acc = dt_acc + jnp.sum(da, (0, 1, 2))[None, :]
            dxv = da * scale_ref[0]
        else:
            dxv = da
        dx_ref[:, :, w0:w0 + two, :] = dxv.astype(dx_ref.dtype)

    @pl.when(bi == 0)
    def _init():
        dscale_ref[:] = ds_acc
        dshift_ref[:] = dt_acc

    @pl.when(bi != 0)
    def _accum():
        dscale_ref[:] = dscale_ref[:] + ds_acc
        dshift_ref[:] = dshift_ref[:] + dt_acc


def _wgrad_kernel(x_ref, g_ref, scale_ref, shift_ref, dk_ref, *,
                  relu: bool, prologue: bool):
    """dk tile: per-tap ``patchT @ g`` dots with the prologue applied to the
    RAW saved input in VMEM (no xn ever materializes in HBM).

    x_ref: [TB, H, W, Cin]; g_ref: [TB, H, W, TCo];
    dk_ref: [3, 3, Cin, TCo] f32, accumulated across the batch grid axis.
    """
    tb, h, w, cin = x_ref.shape
    tco = g_ref.shape[3]
    bi = pl.program_id(1)

    xv = x_ref[:]
    if prologue:
        a = xv.astype(jnp.float32) * scale_ref[0] + shift_ref[0]
        if relu:
            a = jnp.maximum(a, 0.0)
        xv = a.astype(x_ref.dtype)
    xp = jnp.pad(xv, ((0, 0), (1, 1), (1, 1), (0, 0)))
    gm = g_ref[:].reshape(tb * h * w, tco)

    for dh in range(3):
        for dw in range(3):
            patch = jax.lax.slice(
                xp, (0, dh, dw, 0), (tb, dh + h, dw + w, cin))
            tap = jax.lax.dot_general(
                patch.reshape(tb * h * w, cin), gm,
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)

            @pl.when(bi == 0)
            def _init(dh=dh, dw=dw, tap=tap):
                dk_ref[dh, dw] = tap

            @pl.when(bi != 0)
            def _accum(dh=dh, dw=dw, tap=tap):
                dk_ref[dh, dw] = dk_ref[dh, dw] + tap


def _dgrad_local(g, krot, x, scale, shift, *, relu, prologue, interpret):
    b, h, w, cout = g.shape
    cin = krot.shape[3]
    tci = _pick_cout_tile(cout, cin)
    two = w
    while two > 128 and two % 2 == 0:
        two //= 2
    per_sample = h * w * max(cout, tci) * 2  # largest of the g/x/dx blocks
    tb = _pick_batch_tile(b, per_sample)

    kern = functools.partial(_dgrad_kernel, relu=relu, prologue=prologue,
                             two=two)
    return pl.pallas_call(
        kern,
        grid=(cin // tci, b // tb),
        in_specs=[
            pl.BlockSpec((tb, h, w, cout), lambda ci, bi: (bi, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, 3, cout, tci), lambda ci, bi: (0, 0, 0, ci),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tb, h, w, tci), lambda ci, bi: (bi, 0, 0, ci),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tci), lambda ci, bi: (0, ci),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tci), lambda ci, bi: (0, ci),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((tb, h, w, tci), lambda ci, bi: (bi, 0, 0, ci),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tci), lambda ci, bi: (0, ci),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tci), lambda ci, bi: (0, ci),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b, h, w, cin), x.dtype),
            jax.ShapeDtypeStruct((1, cin), jnp.float32),
            jax.ShapeDtypeStruct((1, cin), jnp.float32),
        ),
        interpret=interpret,
        **_vmem_headroom(interpret),
    )(g, krot, x, scale, shift)


def _wgrad_local(x, g, scale, shift, *, relu, prologue, interpret):
    b, h, w, cin = x.shape
    cout = g.shape[3]
    tco = _pick_cout_tile(cin, cout, budget=2**20)  # dk slab is f32, resident
    per_sample = h * w * max(cin, tco) * 2  # largest of the x/g blocks
    tb = _pick_batch_tile(b, per_sample)

    kern = functools.partial(_wgrad_kernel, relu=relu, prologue=prologue)
    return pl.pallas_call(
        kern,
        grid=(cout // tco, b // tb),
        in_specs=[
            pl.BlockSpec((tb, h, w, cin), lambda co, bi: (bi, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tb, h, w, tco), lambda co, bi: (bi, 0, 0, co),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cin), lambda co, bi: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cin), lambda co, bi: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((3, 3, cin, tco), lambda co, bi: (0, 0, 0, co),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((3, 3, cin, cout), jnp.float32),
        interpret=interpret,
        **_vmem_headroom(interpret),
    )(x, g, scale, shift)


@functools.lru_cache(maxsize=None)
def _partitioned_dgrad(relu, prologue, interpret):
    """Batch-axis SPMD rule: dx is batch-sharded like g/x; dscale/dshift are
    cross-batch reductions, so the per-shard partials are psum'd over the
    batch mesh axis inside the partition lowering."""
    from jax.experimental.custom_partitioning import custom_partitioning
    from jax.sharding import NamedSharding
    from jax.sharding import PartitionSpec as P

    def impl(g, krot, x, scale, shift):
        return _dgrad_local(g, krot, x, scale, shift, relu=relu,
                            prologue=prologue, interpret=interpret)

    fn = custom_partitioning(impl)

    def _batch_axis(arg_shapes):
        spec = arg_shapes[0].sharding.spec
        return spec[0] if len(spec) else None

    def infer(mesh, arg_shapes, result_shape):
        batch = _batch_axis(arg_shapes)
        return (NamedSharding(mesh, P(batch, None, None, None)),
                NamedSharding(mesh, P(None, None)),
                NamedSharding(mesh, P(None, None)))

    def partition(mesh, arg_shapes, result_shape):
        batch = _batch_axis(arg_shapes)

        def lower(g, krot, x, scale, shift):
            dx, ds, dt = impl(g, krot, x, scale, shift)
            if batch is not None:
                ds = jax.lax.psum(ds, batch)
                dt = jax.lax.psum(dt, batch)
            return dx, ds, dt

        args = (NamedSharding(mesh, P(batch, None, None, None)),
                NamedSharding(mesh, P(None, None, None, None)),
                NamedSharding(mesh, P(batch, None, None, None)),
                NamedSharding(mesh, P(None, None)),
                NamedSharding(mesh, P(None, None)))
        outs = (NamedSharding(mesh, P(batch, None, None, None)),
                NamedSharding(mesh, P(None, None)),
                NamedSharding(mesh, P(None, None)))
        return mesh, lower, outs, args

    fn.def_partition(
        partition=partition, infer_sharding_from_operands=infer,
        sharding_rule="b h w o, x y o i, b h w i, u i, v i"
                      " -> b h w i, c i, d i",
        need_replication_factors=("h", "w", "o", "x", "y", "i", "u", "v",
                                  "c", "d"))
    return fn


@functools.lru_cache(maxsize=None)
def _partitioned_wgrad(relu, prologue, interpret):
    """Batch-axis SPMD rule: dk is a cross-batch contraction — per-shard
    partials are psum'd over the batch mesh axis."""
    from jax.experimental.custom_partitioning import custom_partitioning
    from jax.sharding import NamedSharding
    from jax.sharding import PartitionSpec as P

    def impl(x, g, scale, shift):
        return _wgrad_local(x, g, scale, shift, relu=relu, prologue=prologue,
                            interpret=interpret)

    fn = custom_partitioning(impl)

    def _batch_axis(arg_shapes):
        spec = arg_shapes[0].sharding.spec
        return spec[0] if len(spec) else None

    def infer(mesh, arg_shapes, result_shape):
        return NamedSharding(mesh, P(None, None, None, None))

    def partition(mesh, arg_shapes, result_shape):
        batch = _batch_axis(arg_shapes)

        def lower(x, g, scale, shift):
            dk = impl(x, g, scale, shift)
            if batch is not None:
                dk = jax.lax.psum(dk, batch)
            return dk

        args = (NamedSharding(mesh, P(batch, None, None, None)),
                NamedSharding(mesh, P(batch, None, None, None)),
                NamedSharding(mesh, P(None, None)),
                NamedSharding(mesh, P(None, None)))
        out = NamedSharding(mesh, P(None, None, None, None))
        return mesh, lower, out, args

    fn.def_partition(
        partition=partition, infer_sharding_from_operands=infer,
        sharding_rule="b h w i, b h w o, u i, v i -> x y i o",
        need_replication_factors=("h", "w", "i", "o", "u", "v", "x", "y"))
    return fn


def _xla_reference(x, kernel, scale, shift, *, strides, relu, prologue):
    """The exact XLA composition the kernel replaces (also the VJP source)."""
    if prologue:
        xn = x.astype(jnp.float32) * scale[0] + shift[0]
        if relu:
            xn = jnp.maximum(xn, 0.0)
        x = xn.astype(x.dtype)
        (x,) = jax.lax.optimization_barrier((x,))
    return jax.lax.conv_general_dilated(
        x, kernel, strides, ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7))
def _fused_conv(x, kernel, scale, shift, strides, relu, prologue, interpret):
    return _partitioned_conv(strides, relu, prologue, interpret)(
        x, kernel, scale, shift)


def _fused_conv_fwd(x, kernel, scale, shift, strides, relu, prologue,
                    interpret):
    y = _fused_conv(x, kernel, scale, shift, strides, relu, prologue,
                    interpret)
    return y, (x, kernel, scale, shift)


def _fused_conv_bwd(strides, relu, prologue, interpret, res, g):
    """Backward. Stride-1 (the only Pallas forward path on hardware): Pallas
    dgrad/wgrad kernels with the prologue backward fused in — no XLA conv
    touches the saved activations, so no Pallas<->XLA layout copies. Strided
    (reachable in interpret mode only): the XLA linear_transpose fallback."""
    x, kernel, scale, shift = res
    if strides == (1, 1):
        krot = kernel[::-1, ::-1].transpose(0, 1, 3, 2)
        dx, dscale, dshift = _partitioned_dgrad(relu, prologue, interpret)(
            g, krot, x, scale, shift)
        dk = _partitioned_wgrad(relu, prologue, interpret)(
            x, g, scale, shift).astype(kernel.dtype)
        if not prologue:
            dscale = jnp.zeros_like(scale)
            dshift = jnp.zeros_like(shift)
        return dx, dk, dscale, dshift
    return _xla_conv_bwd(strides, relu, prologue, res, g)


def _xla_conv_bwd(strides, relu, prologue, res, g):
    """jax.linear_transpose builds ONLY the transposed convs (dgrad/wgrad —
    65-75% MFU in XLA) without re-evaluating the forward conv (jax.vjp of the
    composition would re-run it: measured -18% end-to-end). The prologue
    backward is one fused elementwise pass + two reductions."""
    x, kernel, scale, shift = res

    if prologue:
        a = x.astype(jnp.float32) * scale[0] + shift[0]
        mask = (a > 0.0) if relu else None
        xn = (jnp.maximum(a, 0.0) if relu else a).astype(x.dtype)
    else:
        xn = x

    conv = functools.partial(
        jax.lax.conv_general_dilated, window_strides=strides,
        padding=((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    (xn,) = jax.lax.optimization_barrier((xn,))
    (g,) = jax.lax.optimization_barrier((g,))
    (dxn,) = jax.linear_transpose(lambda t: conv(t, kernel), xn)(g)
    (dk,) = jax.linear_transpose(lambda t: conv(xn, t), kernel)(g)

    if prologue:
        da = dxn.astype(jnp.float32)
        if relu:
            da = jnp.where(mask, da, 0.0)
        dx = (da * scale[0]).astype(x.dtype)
        dscale = jnp.sum(da * x.astype(jnp.float32), (0, 1, 2)).reshape(1, -1)
        dshift = jnp.sum(da, (0, 1, 2)).reshape(1, -1)
    else:
        dx = dxn.astype(x.dtype)
        dscale = jnp.zeros_like(scale)
        dshift = jnp.zeros_like(shift)
    return dx, dk, dscale, dshift


_fused_conv.defvjp(_fused_conv_fwd, _fused_conv_bwd)


def conv3x3_bn_relu(x: jax.Array, kernel: jax.Array,
                    scale: Optional[jax.Array] = None,
                    shift: Optional[jax.Array] = None, *,
                    strides: Tuple[int, int] = (1, 1), relu: bool = True,
                    interpret: bool = False) -> jax.Array:
    """``conv3x3(relu(x * scale + shift))``, NHWC, padding 1.

    scale/shift None => no prologue (plain high-MFU 3x3 conv).
    x: [B, H, W, Cin] (bf16 on TPU); kernel: [3, 3, Cin, Cout];
    scale/shift: [Cin] f32. Requires H % strides[0] == 0 and
    W % strides[1] == 0 (always true for the stem's even activations).
    """
    prologue = scale is not None
    if not prologue:
        cin = x.shape[3]
        scale = jnp.ones((cin,), jnp.float32)
        shift = jnp.zeros((cin,), jnp.float32)
    if tuple(strides) != (1, 1) and not interpret:
        # Mosaic rejects stride-2 strided slices ('strides confined to
        # [1,2)'), and the strided stem convs run acceptably in XLA
        # (59-71% MFU with epilogues) — only the stride-1 convs carry the
        # expensive normalize prologue, so they are the Pallas targets.
        return _xla_reference(
            x, kernel, scale.reshape(1, -1).astype(jnp.float32),
            shift.reshape(1, -1).astype(jnp.float32), strides=tuple(strides),
            relu=relu, prologue=prologue)
    return _fused_conv(x, kernel, scale.reshape(1, -1).astype(jnp.float32),
                       shift.reshape(1, -1).astype(jnp.float32),
                       tuple(strides), relu, prologue, interpret)


def conv3x3_bn_relu_reference(x, kernel, scale=None, shift=None, *,
                              strides=(1, 1), relu=True):
    """Pure-XLA equivalent, for tests and non-TPU backends."""
    prologue = scale is not None
    if not prologue:
        cin = x.shape[3]
        scale = jnp.ones((cin,), jnp.float32)
        shift = jnp.zeros((cin,), jnp.float32)
    return _xla_reference(x, kernel, scale.reshape(1, -1).astype(jnp.float32),
                          shift.reshape(1, -1).astype(jnp.float32),
                          strides=tuple(strides), relu=relu,
                          prologue=prologue)
