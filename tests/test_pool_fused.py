"""ops/pool_fused.py: the fused BN-apply+ReLU+maxpool kernel.

Interpret-mode equivalence (forward + all gradients) against the XLA
composition it replaces, including window-tie cases that exercise the
select-and-scatter first-match rule and the ReLU half-gradient at exact
zeros, plus custom_partitioning batch sharding with psum'd reductions."""

import jax
import jax.numpy as jnp
import numpy as np

from htr_vt_tpu.ops.pool_fused import (max_pool_bn_relu,
                                       max_pool_bn_relu_reference)


def _case(rng, B=4, H=8, W=32, C=16, ties=False):
    x = rng.standard_normal((B, H, W, C)).astype(np.float32)
    if ties:
        x = np.round(x * 2) / 2  # coarse grid: many window ties, exact zeros
    s = rng.standard_normal(C).astype(np.float32)
    t = rng.standard_normal(C).astype(np.float32)
    return jnp.asarray(x), jnp.asarray(s), jnp.asarray(t)


def test_fused_pool_forward_matches_xla():
    x, s, t = _case(np.random.default_rng(0))
    y = max_pool_bn_relu(x, s, t, interpret=True)
    yr = max_pool_bn_relu_reference(x, s, t)
    assert y.shape == (4, 4, 32, 16)
    np.testing.assert_allclose(np.asarray(y), np.asarray(yr),
                               rtol=1e-6, atol=1e-6)


def test_fused_pool_gradients_multichunk_seams():
    """W > 128 exercises the in-kernel W-chunking incl. the seam columns
    that two chunks accumulate into via read-modify-write."""
    rng = np.random.default_rng(4)
    x, s, t = _case(rng, B=2, W=300, ties=True)
    ct = jnp.asarray(rng.standard_normal((2, 4, 300, 16)), jnp.float32)
    g = jax.vjp(lambda *a: max_pool_bn_relu(*a, interpret=True), x, s, t)[1](ct)
    gr = jax.vjp(lambda *a: max_pool_bn_relu_reference(*a), x, s, t)[1](ct)
    for i, (a, b) in enumerate(zip(g, gr)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-5, err_msg=f"arg{i}")


def test_fused_pool_gradients_match_xla():
    rng = np.random.default_rng(1)
    for ties in (False, True):
        x, s, t = _case(rng, ties=ties)
        ct = jnp.asarray(rng.standard_normal((4, 4, 32, 16)), jnp.float32)
        g = jax.vjp(lambda *a: max_pool_bn_relu(*a, interpret=True),
                    x, s, t)[1](ct)
        gr = jax.vjp(lambda *a: max_pool_bn_relu_reference(*a), x, s, t)[1](ct)
        for i, (a, b) in enumerate(zip(g, gr)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-5, atol=1e-5,
                                       err_msg=f"ties={ties} arg{i}")


def test_fused_pool_stem_composition_equivalence():
    """FoldedBatchNorm scale/shift + the reference pool composition equals
    the flax BatchNorm -> ReLU -> max_pool stem path (pure XLA both sides) —
    the stem's pool_impl switch changes the schedule, not the math."""
    from flax import linen as nn

    from htr_vt_tpu.models.stem import FoldedBatchNorm

    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((2, 8, 16, 8)), jnp.float32)

    class Folded(nn.Module):
        @nn.compact
        def __call__(self, x):
            s, t = FoldedBatchNorm(name="bn")(x, train=True)
            return max_pool_bn_relu_reference(x, s, t)

    class Plain(nn.Module):
        @nn.compact
        def __call__(self, x):
            x = nn.BatchNorm(use_running_average=False, momentum=0.9,
                             epsilon=1e-5, dtype=jnp.float32, name="bn")(x)
            x = nn.relu(x)
            return nn.max_pool(x, window_shape=(3, 3), strides=(2, 1),
                               padding=((1, 1), (1, 1)))

    vf = Folded().init(jax.random.PRNGKey(0), x)
    yf, _ = Folded().apply(vf, x, mutable=["batch_stats"])
    yp, _ = Plain().apply(vf, x, mutable=["batch_stats"])
    np.testing.assert_allclose(np.asarray(yf), np.asarray(yp),
                               rtol=1e-5, atol=1e-5)


def test_fused_pool_sharded_over_batch():
    import jax.experimental.pallas as pl

    import htr_vt_tpu.ops.pool_fused as pf
    from htr_vt_tpu.parallel.mesh import make_mesh

    orig = pl.pallas_call
    pf.pl.pallas_call = lambda *a, **kw: orig(*a, **{**kw, "interpret": True})
    pf._partitioned.cache_clear()
    try:
        rng = np.random.default_rng(3)
        x, s, t = _case(rng, B=16)
        from jax.sharding import NamedSharding, PartitionSpec as P
        mesh = make_mesh()
        xs = jax.device_put(x, NamedSharding(mesh, P("data", None, None, None)))
        gfn = jax.jit(jax.grad(
            lambda x, s, t: pf.max_pool_bn_relu(x, s, t, interpret=True).sum(),
            argnums=(0, 1, 2)))
        g = gfn(xs, s, t)
        gr = jax.grad(lambda *a: max_pool_bn_relu_reference(*a).sum(),
                      argnums=(0, 1, 2))(x, s, t)
        for i, (a, b) in enumerate(zip(g, gr)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-4, atol=1e-4,
                                       err_msg=f"sharded arg{i}")
    finally:
        pf.pl.pallas_call = orig
        pf._partitioned.cache_clear()
