"""Model forward: shapes, determinism, masking behavior, variant stacks."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from htr_vt_tpu.config import MaskConfig, ModelConfig
from htr_vt_tpu.models.htr_vt import HTRVT, create_model


def tiny_cfg(**kw):
    base = dict(nb_cls=12, img_size=(64, 128), embed_dim=64, depth=2,
                num_heads=2, compute_dtype="float32",
                masking=MaskConfig(mode="span", ratio=0.4, max_span_length=4))
    base.update(kw)
    return ModelConfig(**base)


def init_model(cfg, batch=2):
    model = HTRVT(cfg)
    x = jnp.zeros((batch, *cfg.img_size, 1), jnp.float32)
    rng = jax.random.PRNGKey(0)
    variables = model.init({"params": rng, "mask": rng, "dropout": rng}, x)
    return model, variables, x


def test_forward_shapes_vit():
    cfg = tiny_cfg()
    model, variables, x = init_model(cfg)
    y = model.apply(variables, x, train=False)
    assert y.shape == (2, cfg.num_tokens, cfg.nb_cls)
    assert cfg.num_tokens == 32  # (64/4) * (128/64)
    assert np.all(np.isfinite(np.asarray(y)))


def test_forward_shapes_window():
    cfg = tiny_cfg(encoder="window", window_size=16, num_window_blocks=2, depth=3)
    model, variables, x = init_model(cfg)
    y = model.apply(variables, x, train=False)
    assert y.shape == (2, 32, cfg.nb_cls)


def test_flagship_config_token_count():
    # The real model: 512x64 image, patch (4,64) -> 128 tokens, like the
    # reference (model_v1/model/HTR_VT.py:158-160).
    cfg = ModelConfig()
    assert cfg.num_tokens == 128
    assert cfg.grid_size == (16, 8)


def test_masking_changes_output_train_only():
    cfg = tiny_cfg()
    model, variables, _ = init_model(cfg)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 64, 128, 1))
    r1, r2 = jax.random.PRNGKey(2), jax.random.PRNGKey(3)
    y_nomask = model.apply(variables, x, train=False)
    y1, _ = model.apply(variables, x, train=True, use_masking=True,
                        rngs={"mask": r1, "dropout": r1}, mutable=["batch_stats"])
    y2, _ = model.apply(variables, x, train=True, use_masking=True,
                        rngs={"mask": r2, "dropout": r2}, mutable=["batch_stats"])
    assert not np.allclose(np.asarray(y1), np.asarray(y_nomask), atol=1e-5)
    assert not np.allclose(np.asarray(y1), np.asarray(y2), atol=1e-5)
    # Same rng -> identical output (pure function of the key).
    y1b, _ = model.apply(variables, x, train=True, use_masking=True,
                         rngs={"mask": r1, "dropout": r1}, mutable=["batch_stats"])
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y1b), atol=0)


def test_return_features():
    cfg = tiny_cfg()
    model, variables, x = init_model(cfg)
    logits, feats = model.apply(variables, x, train=False, return_features=True)
    assert feats.shape == (2, 32, cfg.embed_dim)
    assert logits.shape == (2, 32, cfg.nb_cls)


def test_batch_stats_update_in_train():
    cfg = tiny_cfg()
    model, variables, _ = init_model(cfg)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 64, 128, 1))
    _, mutated = model.apply(variables, x, train=True, use_masking=False,
                             mutable=["batch_stats"])
    before = jax.tree.leaves(variables["batch_stats"])
    after = jax.tree.leaves(mutated["batch_stats"])
    assert any(not np.allclose(b, a) for b, a in zip(before, after))


def test_create_model_factory():
    model = create_model(nb_cls=80)
    assert model.cfg.embed_dim == 768 and model.cfg.depth == 4
    assert model.cfg.num_heads == 6 and model.cfg.num_tokens == 128


def test_wide_line_config():
    """Long-line support is a config: 1024-px lines -> 256 tokens, windowed
    attention still partitions evenly (the reference instead squeezes
    everything to 512 px)."""
    cfg = tiny_cfg(img_size=(64, 256), encoder="window", depth=3,
                   window_size=16, num_window_blocks=2)
    assert cfg.num_tokens == 64
    model, variables, _ = init_model(cfg)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 64, 256, 1))
    y = model.apply(variables, x, train=False)
    assert y.shape == (2, 64, cfg.nb_cls)


def test_window_attention_pads_non_multiple_n():
    """N not divisible by the window is right-padded with masked keys
    (reference model_window/model/HTR_VT.py:266-278): outputs of windows that
    contain only real tokens must be identical to running those tokens alone,
    and the padded tail window must behave as if the short tail were the
    whole input."""
    from htr_vt_tpu.models.vit import WindowAttention1D

    attn = WindowAttention1D(num_heads=2, window_size=16, shift=False,
                             dtype=jnp.float32)
    rng = np.random.default_rng(0)
    x40 = jnp.asarray(rng.standard_normal((2, 40, 32)), jnp.float32)
    variables = attn.init(jax.random.PRNGKey(0), x40)
    y40 = attn.apply(variables, x40)
    assert y40.shape == (2, 40, 32) and np.all(np.isfinite(np.asarray(y40)))

    # windows 0-1 (tokens 0..31) see no padding: must match the 32-token run
    y32 = attn.apply(variables, x40[:, :32])
    np.testing.assert_allclose(np.asarray(y40[:, :32]), np.asarray(y32),
                               rtol=1e-5, atol=1e-6)
    # tail window (tokens 32..39) is pad-masked: must match the 8-token run
    y8 = attn.apply(variables, x40[:, 32:])
    np.testing.assert_allclose(np.asarray(y40[:, 32:]), np.asarray(y8),
                               rtol=1e-5, atol=1e-6)


def test_window_shifted_handles_non_multiple_n():
    from htr_vt_tpu.models.vit import WindowAttention1D

    attn = WindowAttention1D(num_heads=2, window_size=16, shift=True,
                             dtype=jnp.float32)
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((2, 40, 32)), jnp.float32)
    variables = attn.init(jax.random.PRNGKey(0), x)
    y = attn.apply(variables, x)
    assert y.shape == (2, 40, 32) and np.all(np.isfinite(np.asarray(y)))


def test_window_encoder_non_multiple_token_grid():
    """A token count not divisible by the window no longer asserts at trace
    time (32 tokens, window 10): the encoder pads + masks internally."""
    cfg = tiny_cfg(encoder="window", depth=2, window_size=10,
                   num_window_blocks=2, masking=MaskConfig(mode="none"))
    model, variables, x = init_model(cfg)
    y = model.apply(variables, x, train=False)
    assert y.shape == (2, cfg.num_tokens, cfg.nb_cls)
    assert cfg.num_tokens % 10 != 0
    assert np.all(np.isfinite(np.asarray(y)))
