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
    "lgp": 3, "conformer": 2, "squeezeformer": 2, "van": 2, "van2": 2,
    "swin": 2, "svtr": 2,
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
        "conformer", "squeezeformer", "van", "van2", "swin", "svtr"}
