"""Pallas TPU kernel: BatchNorm-apply + ReLU + 3x3/(2,1) max-pool, fused.

Target: the stem's first pool (models/stem.py). The conv1 output
[B, 32, 512, C] is the largest activation in the model (~805 MB bf16 at
bs 128); the XLA graph spends ~10 ms/step around it per hardware trace
(docs/PERF.md): a standalone normalize+ReLU pass (2.5 ms/pass), the
select-and-scatter maxpool backward (5.3 ms/pass) and the BN backward
reductions (2.1 ms/pass). This kernel pair touches the tensor once per
direction:

  fwd:  y = maxpool3x3_{(2,1),pad 1}(relu(bf16(x_f32 * scale + shift)))
        — one read of x, one write of the half-height y; the normalize
        never materializes.
  bwd:  recomputes the normalized tile in VMEM, reproduces
        select-and-scatter's FIRST-MATCH tie rule (window scan order) and
        emits dx plus the dscale/dshift reductions in the same pass.

Numerics mirror the XLA composition exactly: the pool max runs on the
bf16-cast normalized tensor, pool padding is -inf (ties against padding are
never claimed), scatter adds accumulate in the element dtype (bf16, like
XLA's select-and-scatter), and the ReLU backward gives equal ties at 0 the
half-gradient jnp.maximum assigns. ``scale``/``shift`` are the folded BN
terms (models/stem.py:FoldedBatchNorm).

SPMD: custom_partitioning over the batch axis; dscale/dshift partials are
psum'd (same pattern as ops/conv_fused.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Window taps in select-and-scatter scan order (row-major over the window).
_TAPS = [(kh, kw) for kh in range(3) for kw in range(3)]


def _normalized(x_ref, scale_ref, shift_ref):
    a = x_ref[:].astype(jnp.float32) * scale_ref[0] + shift_ref[0]
    return jnp.maximum(a.astype(x_ref.dtype), 0)


def _padded(a):
    neg = jnp.asarray(-jnp.inf, a.dtype)
    return jnp.pad(a, ((0, 0), (1, 1), (1, 1), (0, 0)), constant_values=neg)


def _tap(ap, kh, kw, tb, ho, w, c):
    """ap [tb, H+2, W+2, C] -> the (kh, kw) tap for every (2,1)-strided
    window, via the even/odd row decomposition (Mosaic rejects stride-2
    slices; a major-dim reshape is free)."""
    hp = ap.shape[1]  # H + 2, even
    v = ap.reshape(tb, hp // 2, 2, ap.shape[2], c)
    rows = v[:, : ho, kh % 2] if kh < 2 else v[:, 1: ho + 1, 0]
    return jax.lax.slice(rows, (0, 0, kw, 0), (tb, ho, kw + w, c))


def _pool_fwd_kernel(x_ref, scale_ref, shift_ref, y_ref):
    tb, h, w, c = x_ref.shape
    ho = y_ref.shape[1]
    ap = _padded(_normalized(x_ref, scale_ref, shift_ref))
    y = _tap(ap, 0, 0, tb, ho, w, c)
    for kh, kw in _TAPS[1:]:
        y = jnp.maximum(y, _tap(ap, kh, kw, tb, ho, w, c))
    y_ref[:] = y


def _pool_bwd_kernel(g_ref, x_ref, scale_ref, shift_ref,
                     dx_ref, dscale_ref, dshift_ref, *, chunk: int):
    """W-chunked: the full-width formulation spills ~113 MB of vector
    registers (measured); processing `chunk` windows at a time bounds the
    live set. Windows partition cleanly across chunks (no window spans two),
    and the two seam columns each chunk shares with its neighbour accumulate
    by read-modify-write on the VMEM-resident dx block (zero-initialized)."""
    tb, h, w, c = x_ref.shape
    ho = g_ref.shape[1]
    bi = pl.program_id(0)

    dx_ref[:] = jnp.zeros((tb, h, w, c), dx_ref.dtype)
    ds_acc = jnp.zeros((1, c), jnp.float32)
    dt_acc = jnp.zeros((1, c), jnp.float32)

    for q0 in range(0, w, chunk):
        q1 = min(q0 + chunk, w)  # windows wo in [q0, q1)
        wl = q1 - q0
        lo, hi = max(q0 - 1, 0), min(q1 + 1, w)  # input cols this chunk owns
        lpad, rpad = int(q0 == 0), int(q1 == w)

        xs = x_ref[:, :, lo:hi, :].astype(jnp.float32)
        a_pre = xs * scale_ref[0] + shift_ref[0]
        a = jnp.maximum(a_pre.astype(x_ref.dtype), 0)
        # Slab col j == padded col q0 + j; -inf only at the true borders.
        neg = jnp.asarray(-jnp.inf, a.dtype)
        slab = jnp.pad(a, ((0, 0), (1, 1), (lpad, rpad), (0, 0)),
                       constant_values=neg)

        m = _tap(slab, 0, 0, tb, ho, wl, c)
        for kh, kw in _TAPS[1:]:
            m = jnp.maximum(m, _tap(slab, kh, kw, tb, ho, wl, c))

        g = g_ref[:, :, q0:q1, :]
        zero = jnp.zeros_like(g)
        claimed = jnp.zeros(g.shape, jnp.bool_)
        half = (h + 2) // 2
        da_even = jnp.zeros((tb, half, wl + 2, c), g.dtype)
        da_odd = jnp.zeros((tb, half, wl + 2, c), g.dtype)
        mf = m.astype(jnp.float32)  # Mosaic lacks packed-bf16 compares;
        for kh, kw in _TAPS:        # the f32 cast is exact, ties unchanged
            eq = (_tap(slab, kh, kw, tb, ho, wl, c).astype(jnp.float32)
                  == mf) & ~claimed
            claimed = claimed | eq
            r0 = 0 if kh < 2 else 1  # kh {0,1}: rows 0..ho-1; kh=2: 1..ho
            placed = jnp.pad(jnp.where(eq, g, zero),
                             ((0, 0), (r0, half - ho - r0), (kw, 2 - kw),
                              (0, 0)))
            if kh == 1:
                da_odd = da_odd + placed
            else:
                da_even = da_even + placed
        da_pad = jnp.stack([da_even, da_odd], axis=2).reshape(
            tb, h + 2, wl + 2, c)
        # Slab col j -> dx col q0 + j - 1; keep the in-range columns
        # [lo, hi) == slab cols [lo - q0 + 1, hi - q0 + 1).
        jlo = lo - q0 + 1
        da = jax.lax.slice(da_pad, (0, 1, jlo, 0),
                           (tb, 1 + h, jlo + (hi - lo), c))

        # ReLU backward with jnp.maximum's half-gradient at exact-zero ties.
        daf = da.astype(jnp.float32)
        daf = jnp.where(a_pre > 0, daf,
                        jnp.where(a_pre < 0, 0.0, 0.5 * daf))
        dx_ref[:, :, lo:hi, :] = dx_ref[:, :, lo:hi, :] + \
            (daf * scale_ref[0]).astype(dx_ref.dtype)
        ds_acc = ds_acc + jnp.sum(daf * xs, (0, 1, 2))[None, :]
        dt_acc = dt_acc + jnp.sum(daf, (0, 1, 2))[None, :]

    @pl.when(bi == 0)
    def _init():
        dscale_ref[:] = ds_acc
        dshift_ref[:] = dt_acc

    @pl.when(bi != 0)
    def _accum():
        dscale_ref[:] = dscale_ref[:] + ds_acc
        dshift_ref[:] = dshift_ref[:] + dt_acc


def _vmem(interpret: bool) -> dict:
    if interpret:
        return {}
    return {"compiler_params": pltpu.CompilerParams(
        vmem_limit_bytes=100 * 2**20)}


def _pool_fwd_local(x, scale, shift, *, interpret):
    b, h, w, c = x.shape
    ho = h // 2
    return pl.pallas_call(
        _pool_fwd_kernel,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, h, w, c), lambda bi: (bi, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda bi: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda bi: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, ho, w, c), lambda bi: (bi, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, ho, w, c), x.dtype),
        interpret=interpret,
        **_vmem(interpret),
    )(x, scale, shift)


def _pool_bwd_local(g, x, scale, shift, *, interpret):
    b, h, w, c = x.shape
    ho = h // 2
    return pl.pallas_call(
        functools.partial(_pool_bwd_kernel, chunk=min(w, 128)),
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, ho, w, c), lambda bi: (bi, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h, w, c), lambda bi: (bi, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda bi: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda bi: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, h, w, c), lambda bi: (bi, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda bi: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda bi: (0, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b, h, w, c), x.dtype),
            jax.ShapeDtypeStruct((1, c), jnp.float32),
            jax.ShapeDtypeStruct((1, c), jnp.float32),
        ),
        interpret=interpret,
        **_vmem(interpret),
    )(g, x, scale, shift)


@functools.lru_cache(maxsize=None)
def _partitioned(which: str, interpret: bool):
    from jax.experimental.custom_partitioning import custom_partitioning
    from jax.sharding import NamedSharding
    from jax.sharding import PartitionSpec as P

    fwd = which == "fwd"  # fwd: y only; bwd: (dx, dscale, dshift)
    if fwd:
        def local_fn(x, scale, shift):
            return _pool_fwd_local(x, scale, shift, interpret=interpret)
    else:
        def local_fn(g, x, scale, shift):
            return _pool_bwd_local(g, x, scale, shift, interpret=interpret)
    fn = custom_partitioning(local_fn)

    def _batch_axis(arg_shapes):
        spec = arg_shapes[0].sharding.spec
        return spec[0] if len(spec) else None

    def infer(mesh, arg_shapes, result_shape):
        b = _batch_axis(arg_shapes)
        big = NamedSharding(mesh, P(b, None, None, None))
        if fwd:
            return big
        return (big, NamedSharding(mesh, P(None, None)),
                NamedSharding(mesh, P(None, None)))

    def partition(mesh, arg_shapes, result_shape):
        b = _batch_axis(arg_shapes)
        big = NamedSharding(mesh, P(b, None, None, None))
        small = NamedSharding(mesh, P(None, None))

        def lower(*args):
            out = local_fn(*args)
            if fwd or b is None:
                return out
            dx, ds, dt = out
            return dx, jax.lax.psum(ds, b), jax.lax.psum(dt, b)

        n_big_in = 1 if fwd else 2
        args = (big,) * n_big_in + (small, small)
        outs = big if fwd else (big, small, small)
        return mesh, lower, outs, args

    if fwd:
        fn.def_partition(
            partition=partition, infer_sharding_from_operands=infer,
            sharding_rule="b h w c, u c, v c -> b p w c",
            need_replication_factors=("h", "w", "c", "u", "v", "p"))
    else:
        fn.def_partition(
            partition=partition, infer_sharding_from_operands=infer,
            sharding_rule="b p w c, b h w c, u c, v c -> b h w c, y c, z c",
            need_replication_factors=("p", "w", "c", "h", "u", "v", "y", "z"))
    return fn


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _pool_op(x, scale, shift, interpret):
    return _partitioned("fwd", interpret)(x, scale, shift)


def _pool_op_fwd(x, scale, shift, interpret):
    return _pool_op(x, scale, shift, interpret), (x, scale, shift)


def _pool_op_bwd(interpret, res, g):
    x, scale, shift = res
    return _partitioned("bwd", interpret)(g, x, scale, shift)


_pool_op.defvjp(_pool_op_fwd, _pool_op_bwd)


def max_pool_bn_relu(x: jax.Array, scale: jax.Array, shift: jax.Array, *,
                     interpret: bool = False) -> jax.Array:
    """``maxpool3x3_{(2,1),pad 1}(relu(cast(x * scale + shift)))`` fused.

    x: [B, H, W, C] (H even); scale/shift: [C] f32 folded BN terms.
    Returns [B, H/2, W, C] in x.dtype.
    """
    return _pool_op(x, scale.reshape(1, -1).astype(jnp.float32),
                    shift.reshape(1, -1).astype(jnp.float32), interpret)


def max_pool_bn_relu_reference(x, scale, shift):
    """The exact XLA composition the kernel replaces (tests / non-TPU)."""
    from flax import linen as nn
    a = x.astype(jnp.float32) * scale.reshape(1, 1, 1, -1).astype(jnp.float32)
    a = (a + shift.reshape(1, 1, 1, -1).astype(jnp.float32)).astype(x.dtype)
    a = jnp.maximum(a, 0)
    return nn.max_pool(a, window_shape=(3, 3), strides=(2, 1),
                       padding=((1, 1), (1, 1)))
