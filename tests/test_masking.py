"""Masking strategies: coverage ratios, batch sharing, per-sample structure."""

import jax
import jax.numpy as jnp
import numpy as np

from htr_vt_tpu.config import MaskConfig
from htr_vt_tpu.models import masking

L = 128
B = 16


def keep_to_masked(keep):
    return 1.0 - np.asarray(keep)[:, :, 0]


def test_span_mask_batch_shared_and_coverage():
    rng = jax.random.PRNGKey(0)
    keep = masking.span_mask(rng, B, L, ratio=0.4, max_span=8)
    m = keep_to_masked(keep)
    # Batch-shared spans (model_v1 semantics).
    assert np.all(m == m[0])
    # int(L*0.4)//8 = 6 spans of 8 => at most 48 masked, >0 with overlap slack.
    assert 8 <= m[0].sum() <= 48


def test_random_mask_exact_count_per_sample():
    rng = jax.random.PRNGKey(1)
    keep = masking.random_mask(rng, B, L, ratio=0.3)
    m = keep_to_masked(keep)
    expected = round(0.3 * L)
    assert np.all(m.sum(axis=1) == expected)
    # Per-sample masks differ.
    assert not np.all(m == m[0])


def test_block_mask_coverage_and_contiguity():
    rng = jax.random.PRNGKey(2)
    keep = masking.block_mask(rng, B, L, ratio=0.25)
    m = keep_to_masked(keep)
    target = round(0.25 * L)
    # Coverage must reach the target (possibly overshoot by < max block len).
    assert np.all(m.sum(axis=1) >= target)
    assert np.all(m.sum(axis=1) <= target + L)


def test_span_spacing_mask_coverage_and_spacing():
    rng = jax.random.PRNGKey(3)
    ratio, max_span = 0.3, 8
    keep = masking.span_spacing_mask(rng, B, L, ratio, max_span)
    m = keep_to_masked(keep)
    target = round(ratio * L)
    # Bounded placements should approach the target closely.
    assert np.all(m.sum(axis=1) >= target * 0.6)
    assert np.all(m.sum(axis=1) <= target + max_span)


def test_mms_union():
    cfg = MaskConfig(mode="mms", mms_random_ratio=0.3, mms_block_ratio=0.2,
                     mms_span_ratio=0.2, max_span_length=8)
    keep = masking.mms_mask(jax.random.PRNGKey(4), B, L, cfg)
    m = keep_to_masked(keep)
    # Union coverage at least the largest component, at most the sum.
    assert np.all(m.sum(axis=1) >= round(0.3 * L))
    assert np.all(m.sum(axis=1) <= round(0.7 * L) + 24)


def test_apply_mask_replaces_with_token():
    x = jnp.ones((2, 8, 4))
    keep = jnp.concatenate([jnp.zeros((2, 4, 1)), jnp.ones((2, 4, 1))], axis=1)
    token = jnp.full((1, 1, 4), 7.0)
    y = np.asarray(masking.apply_mask(x, keep, token))
    np.testing.assert_allclose(y[:, :4], 7.0)
    np.testing.assert_allclose(y[:, 4:], 1.0)


def test_build_keep_mask_dispatch_jits():
    cfg = MaskConfig(mode="span", ratio=0.4, max_span_length=8)
    fn = jax.jit(lambda r: masking.build_keep_mask(r, B, L, cfg))
    keep = fn(jax.random.PRNGKey(5))
    assert keep.shape == (B, L, 1)


def test_ratio_override_reaches_strategy():
    """The tri-masked trainer's per-mode ratios must override the config
    (regression: the override used to be silently dropped)."""
    cfg = MaskConfig(mode="span", ratio=0.9, max_span_length=1)
    keep = masking.build_keep_mask(jax.random.PRNGKey(0), B, L, cfg,
                                   mode="random", ratio=0.25)
    m = keep_to_masked(keep)
    assert np.all(m.sum(axis=1) == round(0.25 * L))


def test_model_mask_ratio_override():
    import jax.numpy as jnp
    from htr_vt_tpu.config import ModelConfig
    from htr_vt_tpu.models.htr_vt import HTRVT
    cfg = ModelConfig(nb_cls=8, img_size=(64, 128), embed_dim=64, depth=1,
                      num_heads=2, compute_dtype="float32",
                      masking=MaskConfig(mode="span", ratio=0.0, max_span_length=2))
    model = HTRVT(cfg)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 64, 128, 1))
    r = jax.random.PRNGKey(0)
    v = model.init({"params": r, "mask": r, "dropout": r}, x)
    base, _ = model.apply(v, x, train=True, use_masking=True,
                          rngs={"mask": r, "dropout": r}, mutable=["batch_stats"])
    # config ratio 0 -> no masking; override 0.5 must change the output
    ovr, _ = model.apply(v, x, train=True, use_masking=True, mask_mode="random",
                         mask_ratio=0.5,
                         rngs={"mask": r, "dropout": r}, mutable=["batch_stats"])
    assert not np.allclose(np.asarray(base), np.asarray(ovr), atol=1e-6)
