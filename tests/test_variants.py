"""Every encoder recipe in the zoo: forward shape, finiteness, gradients."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from htr_vt_tpu.config import MaskConfig, ModelConfig
from htr_vt_tpu.models.htr_vt import build_model
from htr_vt_tpu.models.variants import VARIANT_PRESETS, apply_variant_preset

ENCODER_DEPTHS = {
    "vit": 2, "window": 3, "macaron": 2, "macaron_2": 2, "localglobal": 4,
    "lgp": 3, "lgp_svtr": 4, "conformer": 2, "squeezeformer": 2, "van": 2,
    "van2": 2, "swin": 2, "svtr": 2,
}


def make_cfg(encoder: str) -> ModelConfig:
    cfg = ModelConfig(encoder=encoder, nb_cls=12, img_size=(64, 128),
                      embed_dim=64, depth=ENCODER_DEPTHS[encoder], num_heads=2,
                      compute_dtype="float32", local_window=8, global_pool_len=16,
                      svtr_preset="tiny",
                      masking=MaskConfig(mode="span", ratio=0.25, max_span_length=2))
    return apply_variant_preset(cfg)


@pytest.mark.parametrize("encoder", sorted(ENCODER_DEPTHS))
def test_encoder_forward_and_grad(encoder):
    cfg = make_cfg(encoder)
    model = build_model(cfg)
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 64, 128, 1))
    variables = model.init({"params": rng, "mask": rng, "dropout": rng}, x)

    y = model.apply(variables, x, train=False)
    assert y.shape[0] == 2 and y.shape[2] == 12
    assert np.all(np.isfinite(np.asarray(y)))

    # masked training forward + grad through everything
    def loss(params):
        out, _ = model.apply(
            {"params": params, "batch_stats": variables.get("batch_stats", {})},
            x, train=True, use_masking=True,
            rngs={"mask": rng, "dropout": rng}, mutable=["batch_stats"])
        return (out.astype(jnp.float32) ** 2).mean()

    grads = jax.grad(loss)(variables["params"])
    leaves = jax.tree.leaves(grads)
    assert all(np.all(np.isfinite(np.asarray(g))) for g in leaves)
    assert sum(float(jnp.abs(g).sum()) for g in leaves) > 0


def test_all_reference_variants_have_presets():
    # One preset per reference variant family (SURVEY §2.6).
    assert set(VARIANT_PRESETS) >= {
        "vit", "window", "macaron", "macaron_2", "localglobal", "lgp",
        "lgp_svtr", "conformer", "squeezeformer", "van", "van2", "swin",
        "svtr"}


def test_squeezeformer_unet_structure():
    """The squeezeformer encoder is the reference's two-stage temporal U-Net
    (model_sgm_mms_conv_squeeze/model/HTR_VT.py:288-363): stage1 at N tokens,
    downsample to N/2, stage2, upsample + skip, out-norm."""
    import dataclasses
    cfg = dataclasses.replace(make_cfg("squeezeformer"), depth=4)
    model = build_model(cfg)
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 64, 128, 1))
    variables = model.init({"params": rng, "mask": rng, "dropout": rng}, x)

    enc = variables["params"]["encoder"]
    # depth 4 -> 2 blocks per stage, plus the fuse-out norm
    assert {"stage1_block0", "stage1_block1", "stage2_block0",
            "stage2_block1", "out_norm"} <= set(enc)
    # SE gating present in every block
    assert "se" in enc["stage1_block0"] and "se" in enc["stage2_block0"]

    y = model.apply(variables, x, train=False)
    assert y.shape == (2, 32, 12)  # 128-wide image -> 32 tokens, N preserved
    assert np.all(np.isfinite(np.asarray(y)))


def test_down_up_sample_token_semantics():
    """downsample = exact avg-pool k2 s2; upsample = nearest (repeat), matching
    torch F.avg_pool1d / F.interpolate(mode='nearest')
    (model_sgm_mms_conv_squeeze/model/HTR_VT.py:190-225)."""
    from htr_vt_tpu.models.conv_blocks import downsample_tokens, upsample_tokens

    x = jnp.asarray(np.random.default_rng(0).standard_normal((1, 8, 3)),
                    jnp.float32)
    d = downsample_tokens(x)
    np.testing.assert_allclose(np.asarray(d[0, 0]),
                               np.asarray((x[0, 0] + x[0, 1]) / 2), rtol=1e-6)
    u = upsample_tokens(d, 8)
    assert u.shape == (1, 8, 3)
    np.testing.assert_array_equal(np.asarray(u[0, 0]), np.asarray(u[0, 1]))
    np.testing.assert_array_equal(np.asarray(u[0, 0]), np.asarray(d[0, 0]))
