"""ops/conv_fused.py: the Pallas fused affine+ReLU+conv3x3 kernel.

Interpret-mode equivalence against the XLA reference composition (the
backward is jax.vjp of that composition by construction, so gradient
equality is exact), the strided XLA fallback, and the custom_partitioning
batch sharding on the 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np

from htr_vt_tpu.ops.conv_fused import (conv3x3_bn_relu,
                                       conv3x3_bn_relu_reference)


def _case(rng, B=4, H=8, W=32, Ci=16, Co=24):
    x = jnp.asarray(rng.standard_normal((B, H, W, Ci)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((3, 3, Ci, Co)) * 0.1, jnp.float32)
    s = jnp.asarray(rng.standard_normal(Ci), jnp.float32)
    t = jnp.asarray(rng.standard_normal(Ci), jnp.float32)
    return x, k, s, t


def test_fused_conv_matches_xla_with_prologue():
    x, k, s, t = _case(np.random.default_rng(0))
    y = conv3x3_bn_relu(x, k, s, t, interpret=True)
    yr = conv3x3_bn_relu_reference(x, k, s, t)
    np.testing.assert_allclose(np.asarray(y), np.asarray(yr),
                               rtol=1e-5, atol=1e-5)


def test_fused_conv_matches_xla_plain():
    x, k, _, _ = _case(np.random.default_rng(1))
    y = conv3x3_bn_relu(x, k, interpret=True)
    yr = conv3x3_bn_relu_reference(x, k)
    np.testing.assert_allclose(np.asarray(y), np.asarray(yr),
                               rtol=1e-5, atol=1e-5)


def test_fused_conv_gradients_equal_xla():
    """The manual VJP (linear_transpose dgrad/wgrad + elementwise prologue
    backward) must match autodiff of the XLA composition."""
    x, k, s, t = _case(np.random.default_rng(2))
    g = jax.grad(lambda *a: conv3x3_bn_relu(*a, interpret=True).sum(),
                 argnums=(0, 1, 2, 3))(x, k, s, t)
    gr = jax.grad(lambda *a: conv3x3_bn_relu_reference(*a).sum(),
                  argnums=(0, 1, 2, 3))(x, k, s, t)
    for a, b in zip(g, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-5)


def test_fused_conv_gradients_plain_and_strided():
    rng = np.random.default_rng(6)
    x, k, s, t = _case(rng, H=16)
    for args, st in [((x, k), (1, 1)), ((x, k, s, t), (2, 1))]:
        g = jax.grad(lambda *a: conv3x3_bn_relu(
            *a, strides=st, interpret=True).sum(),
            argnums=tuple(range(len(args))))(*args)
        gr = jax.grad(lambda *a: conv3x3_bn_relu_reference(
            *a, strides=st).sum(), argnums=tuple(range(len(args))))(*args)
        for a, b in zip(g, gr):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-5, atol=1e-5)


def test_strided_falls_back_to_xla():
    """strides != (1,1) take the XLA path (Mosaic rejects stride-2 slices);
    semantics identical either way."""
    rng = np.random.default_rng(3)
    x, k, s, t = _case(rng, H=16)
    y = conv3x3_bn_relu(x, k, s, t, strides=(2, 1))
    yr = conv3x3_bn_relu_reference(x, k, s, t, strides=(2, 1))
    np.testing.assert_allclose(np.asarray(y), np.asarray(yr),
                               rtol=1e-5, atol=1e-5)
    assert y.shape == (4, 8, 32, 24)


def test_padding_is_applied_after_prologue():
    """torch pads the NORMALIZED tensor with zeros; a shift != 0 would leak
    into the borders if padding were applied before the affine."""
    rng = np.random.default_rng(4)
    x, k, _, _ = _case(rng)
    s = jnp.ones((16,), jnp.float32)
    t = jnp.full((16,), 3.0, jnp.float32)  # large shift exposes border order
    y = conv3x3_bn_relu(x, k, s, t, interpret=True)
    yr = conv3x3_bn_relu_reference(x, k, s, t)
    np.testing.assert_allclose(np.asarray(y), np.asarray(yr),
                               rtol=1e-5, atol=1e-5)


def test_fused_conv_sharded_over_batch():
    """Under jit with batch-sharded inputs the custom_partitioning rule runs
    the kernel per shard (interpret mode on the CPU mesh)."""
    import jax.experimental.pallas as pl

    import htr_vt_tpu.ops.conv_fused as cf
    from htr_vt_tpu.parallel.mesh import make_mesh

    orig = pl.pallas_call
    cf.pl.pallas_call = lambda *a, **kw: orig(*a, **{**kw, "interpret": True})
    cf._partitioned_conv.cache_clear()
    try:
        rng = np.random.default_rng(5)
        x, k, s, t = _case(rng, B=16)
        mesh = make_mesh()
        from jax.sharding import NamedSharding, PartitionSpec as P
        xs = jax.device_put(x, NamedSharding(mesh, P("data", None, None, None)))
        y = jax.jit(lambda x: cf.conv3x3_bn_relu(x, k, s, t, interpret=True))(xs)
        assert y.sharding.spec[0] == "data"
        yr = conv3x3_bn_relu_reference(x, k, s, t)
        np.testing.assert_allclose(np.asarray(y), np.asarray(yr),
                                   rtol=1e-5, atol=1e-5)
    finally:
        cf.pl.pallas_call = orig
        cf._partitioned_conv.cache_clear()
