"""attn_impl routing policy (models/vit.py:resolve_attn_impl).

The flash path itself is a Pallas TPU kernel with no interpreter fallback, so
CPU CI pins the DECISION logic (when flash is allowed to engage) and that the
default "auto" policy is a no-op on this backend / at the flagship's N=128;
numerics + speed of the kernel are measured on hardware by tools/bench_attn.py
(results in docs/PERF.md).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from htr_vt_tpu.models.vit import Attention, resolve_attn_impl


def test_auto_never_flash_on_cpu():
    assert jax.default_backend() == "cpu"
    assert resolve_attn_impl("auto", 512, 128) == "xla"


def test_explicit_xla_everywhere():
    for n in (64, 128, 256, 512):
        assert resolve_attn_impl("xla", n, 128) == "xla"


def test_explicit_flash_rejected_off_tpu():
    with pytest.raises(ValueError, match="flash"):
        resolve_attn_impl("flash", 512, 128)


def test_auto_shape_gates(monkeypatch):
    # Pretend we're on TPU to exercise the shape half of the policy.
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    assert resolve_attn_impl("auto", 512, 128) == "flash"
    assert resolve_attn_impl("auto", 256, 128) == "flash"
    assert resolve_attn_impl("auto", 128, 128) == "xla"   # flagship: XLA wins
    assert resolve_attn_impl("auto", 384, 128) == "flash"  # 384 % 128 == 0
    assert resolve_attn_impl("auto", 320, 128) == "xla"   # 320 % 128 != 0
    assert resolve_attn_impl("auto", 512, 64) == "xla"    # head_dim not tiled
    assert resolve_attn_impl("auto", 512, 128, fused=True) == "xla"


def test_unknown_impl_rejected():
    with pytest.raises(ValueError, match="unknown attn_impl"):
        resolve_attn_impl("pallas", 128, 128)


def test_attention_module_runs_with_explicit_xla():
    # attn_impl threads through the module without changing results on CPU.
    attn = Attention(num_heads=6, attn_impl="xla", dtype=jnp.float32)
    x = jnp.asarray(np.random.default_rng(0).standard_normal((2, 128, 768)),
                    jnp.float32)
    params = attn.init(jax.random.PRNGKey(0), x)
    y = attn.apply(params, x)
    attn_auto = Attention(num_heads=6, attn_impl="auto", dtype=jnp.float32)
    y2 = attn_auto.apply(params, x)
    np.testing.assert_array_equal(np.asarray(y), np.asarray(y2))


def test_explicit_flash_validates_shapes(monkeypatch):
    """Explicit 'flash' must get the same shape gates 'auto' enforces —
    a clear ValueError instead of an opaque Mosaic block-shape failure
    (regression: only 'auto' checked N/head_dim tiling)."""
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    assert resolve_attn_impl("flash", 512, 128) == "flash"
    with pytest.raises(ValueError, match="multiples of"):
        resolve_attn_impl("flash", 320, 128)   # N % 128 != 0
    with pytest.raises(ValueError, match="multiples of"):
        resolve_attn_impl("flash", 512, 64)    # head_dim % 128 != 0
    with pytest.raises(ValueError, match="fuse"):
        resolve_attn_impl("flash", 512, 128, fused=True)
