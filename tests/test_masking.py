"""Masking strategies: coverage ratios, batch sharing, per-sample structure."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from htr_vt_tpu.config import MaskConfig
from htr_vt_tpu.models import masking

L = 128
B = 16
LONG_LS = [128, 256, 512]  # multi-width buckets: 512/1024/2048-px lines


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


@pytest.mark.parametrize("length", LONG_LS)
def test_block_mask_coverage_and_contiguity(length):
    rng = jax.random.PRNGKey(2)
    keep = masking.block_mask(rng, B, length, ratio=0.25)
    m = keep_to_masked(keep)
    target = round(0.25 * length)
    # Coverage must reach the target (possibly overshoot by < max block len).
    assert np.all(m.sum(axis=1) >= target)
    assert np.all(m.sum(axis=1) <= target + length)


@pytest.mark.parametrize("length", LONG_LS)
def test_span_spacing_mask_reaches_target_coverage(length):
    """The bounded placement budget must reach the target coverage at every
    multi-width token length — the round-3 flat 48-attempt cap starved
    coverage beyond L=128 (round-4 verdict #4). Reference semantics: loop
    until covered >= target or 10000 attempts
    (model_sgm_mms_attach/model/HTR_VT.py:261-306)."""
    rng = jax.random.PRNGKey(3)
    ratio, max_span = 0.3, 8
    keep = masking.span_spacing_mask(rng, B, length, ratio, max_span)
    m = keep_to_masked(keep)
    target = round(ratio * length)
    # Mean coverage within 5% of target; every sample close behind.
    assert m.sum(axis=1).mean() >= target * 0.95
    assert np.all(m.sum(axis=1) >= target * 0.85)
    assert np.all(m.sum(axis=1) <= target + max_span)


@pytest.mark.parametrize("length", LONG_LS)
def test_span_spacing_matches_reference_saturation_at_high_ratio(length):
    """At ratio 0.4 the k=s spacing policy makes the target hard to reach;
    the reference burns up to 10000 attempts converging to ~the target.
    Pin our budgeted coverage to a NumPy transcription of the reference
    loop (not to the raw target) so semantics stay matched at every L."""
    ratio, max_span = 0.4, 8
    keep = masking.span_spacing_mask(jax.random.PRNGKey(7), B, length,
                                     ratio, max_span)
    ours = keep_to_masked(keep).sum(axis=1).mean() / length

    rng = np.random.default_rng(0)
    target = round(ratio * length)
    covs = []
    for _ in range(8):
        masked = np.zeros(length, bool)
        att = 0
        while masked.sum() < target and att < 10000:
            att += 1
            s = int(rng.integers(1, max_span + 1))
            l = int(rng.integers(0, length - s + 1))
            r = l + s - 1
            k = s  # ratio <= 0.4 policy (reference :278-285)
            if masked[max(0, l - k):min(length, r + k + 1)].any():
                continue
            masked[l:r + 1] = True
        covs.append(masked.mean())
    ref = float(np.mean(covs))
    assert abs(ours - ref) < 0.02, (ours, ref)


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
