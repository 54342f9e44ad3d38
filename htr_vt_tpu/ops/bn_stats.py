"""Pallas TPU kernel: one-pass per-channel (sum, sum-of-squares) BN stats.

The train-BN stats reduction over a stem activation [B, H, W, C] is the one
full-tensor read that cannot fuse into the activation's producer (the stats
must exist before the folded normalize that the producer's epilogue would
apply — models/stem.py:FoldedBatchNorm). XLA lowers `mean(x)` +
`mean(x*x)` as one multi-output reduce fusion, so the hypothesis being
measured here (round-2 verdict #2: "try a stats-only kernel — it avoids the
layout-copy tax because it emits [C]-shaped outputs, not tensors") is that a
Pallas reduce can beat that fusion. The [C]-shaped OUTPUTS are indeed
copy-free, but the INPUT still crosses the XLA<->Pallas boundary: XLA lays
conv outputs batch-minor ({0,3,2,1}) while Pallas requires row-major, so the
kernel pays the same input relayout that sank the fused pool kernel
(docs/PERF.md). bench: tools/bench_bn_stats.py; measured verdict in
docs/PERF.md (round 3).

Forward: one read of x, emits (sum_c, sumsq_c) f32 [C].
Backward (exact): d/dx sum = 1, d/dx sumsq = 2x — a single elementwise
pass `g_sum + 2*x*g_sumsq` left to XLA, which fuses it into neighbours.

SPMD: custom_partitioning over the batch axis; partial sums are psum'd
(same pattern as ops/pool_fused.py / ops/conv_fused.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _stats_kernel(x_ref, sum_ref, sq_ref):
    xf = x_ref[0].astype(jnp.float32)  # [H, W, C]
    s = jnp.sum(xf, axis=(0, 1), keepdims=False)[None, :]  # [1, C]
    q = jnp.sum(xf * xf, axis=(0, 1), keepdims=False)[None, :]

    @pl.when(pl.program_id(0) == 0)
    def _init():
        sum_ref[:] = s
        sq_ref[:] = q

    @pl.when(pl.program_id(0) > 0)
    def _acc():
        sum_ref[:] += s
        sq_ref[:] += q


def _stats_local(x, *, interpret):
    b, h, w, c = x.shape
    kwargs = {} if interpret else {
        "compiler_params": pltpu.CompilerParams(
            vmem_limit_bytes=100 * 2**20)}
    return pl.pallas_call(
        _stats_kernel,
        grid=(b,),
        in_specs=[pl.BlockSpec((1, h, w, c), lambda bi: (bi, 0, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=(
            pl.BlockSpec((1, c), lambda bi: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda bi: (0, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((1, c), jnp.float32),
            jax.ShapeDtypeStruct((1, c), jnp.float32),
        ),
        interpret=interpret,
        **kwargs,
    )(x)


@functools.lru_cache(maxsize=None)
def _partitioned(interpret: bool):
    from jax.experimental.custom_partitioning import custom_partitioning
    from jax.sharding import NamedSharding
    from jax.sharding import PartitionSpec as P

    def local_fn(x):
        return _stats_local(x, interpret=interpret)

    fn = custom_partitioning(local_fn)

    def _batch_axis(arg_shapes):
        spec = arg_shapes[0].sharding.spec
        return spec[0] if len(spec) else None

    def infer(mesh, arg_shapes, result_shape):
        small = NamedSharding(mesh, P(None, None))
        return (small, small)

    def partition(mesh, arg_shapes, result_shape):
        b = _batch_axis(arg_shapes)
        big = NamedSharding(mesh, P(b, None, None, None))
        small = NamedSharding(mesh, P(None, None))

        def lower(x):
            s, q = local_fn(x)
            if b is None:
                return s, q
            return jax.lax.psum(s, b), jax.lax.psum(q, b)

        return mesh, lower, (small, small), (big,)

    fn.def_partition(
        partition=partition, infer_sharding_from_operands=infer,
        sharding_rule="b h w c -> u c, v c",
        need_replication_factors=("h", "w", "c", "u", "v"))
    return fn


@functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def _stats_op(x, interpret):
    return _partitioned(interpret)(x)


def _stats_fwd(x, interpret):
    return _stats_op(x, interpret), x


def _stats_bwd(interpret, x, g):
    gs, gq = g  # [1, C] each
    gs = gs.astype(jnp.float32).reshape(1, 1, 1, -1)
    gq = gq.astype(jnp.float32).reshape(1, 1, 1, -1)
    gx = gs + 2.0 * x.astype(jnp.float32) * gq
    return (gx.astype(x.dtype),)


_stats_op.defvjp(_stats_fwd, _stats_bwd)


def bn_stats(x: jax.Array, *, interpret: bool = False):
    """One-pass per-channel (sum, sum_of_squares) over [B, H, W, C].

    Returns two f32 [C] arrays. Differentiable (exact VJP, XLA elementwise).
    """
    s, q = _stats_op(x, interpret)
    return s[0], q[0]


def bn_stats_reference(x: jax.Array):
    """The XLA composition the kernel replaces (tests / non-TPU)."""
    xf = x.astype(jnp.float32)
    return (jnp.sum(xf, axis=(0, 1, 2)),
            jnp.sum(jnp.square(xf), axis=(0, 1, 2)))
