"""Multi-chip data parallelism: N-device run must match 1-device math."""

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from htr_vt_tpu.config import (ExperimentConfig, MaskConfig, ModelConfig,
                               OptimConfig, ParallelConfig)
from htr_vt_tpu.models.htr_vt import HTRVT
from htr_vt_tpu.parallel.mesh import batch_sharding, make_mesh, param_shardings, shard_params
from htr_vt_tpu.train.state import create_train_state
from htr_vt_tpu.train.step import train_step


def _setup(masking_mode="none"):
    cfg = ExperimentConfig(
        model=ModelConfig(nb_cls=8, img_size=(64, 128), embed_dim=64, depth=1,
                          num_heads=2, compute_dtype="float32",
                          masking=MaskConfig(mode=masking_mode, ratio=0.25,
                                             max_span_length=2)),
        optim=OptimConfig(max_lr=1e-3, warmup_iters=2, total_iters=50))
    model = HTRVT(cfg.model)
    B = 16
    rng = np.random.default_rng(0)
    batch = {
        "image": rng.random((B, 64, 128, 1)).astype(np.float32),
        "labels": rng.integers(1, 8, (B, 4)).astype(np.int32),
        "label_lengths": np.full((B,), 4, np.int32),
    }
    state = create_train_state(cfg, model, jax.random.PRNGKey(0),
                               np.zeros((B, 64, 128, 1), np.float32))
    return cfg, model, state, batch


def test_dp8_matches_single_device():
    """Steps on an 8-device data-parallel mesh == steps on one device: the
    sync-BN + global-grad-norm + gradient-all-reduce equivalence check.

    Step 1 must agree tightly (semantic equivalence). Later steps tolerate
    ~1e-3 relative drift: the two layouts compile to different executables
    whose fp32 reduction orders differ, and SAM's grad-norm division
    amplifies ulp-level noise across steps (verified bit-exact when both
    layouts share a freshly-compiled executable)."""
    assert len(jax.devices()) >= 8
    cfg, model, state, batch = _setup()
    step = jax.jit(functools.partial(train_step, model, cfg))

    s1 = state
    b1 = {k: jnp.asarray(v) for k, v in batch.items()}
    mesh = make_mesh()
    bsh = batch_sharding(mesh)
    s8 = jax.device_put(state, jax.sharding.NamedSharding(
        mesh, jax.sharding.PartitionSpec()))
    b8 = {k: jax.device_put(jnp.asarray(v), bsh) for k, v in batch.items()}

    s1, m1 = step(s1, b1)
    s8, m8 = step(s8, b8)
    np.testing.assert_allclose(float(m1["loss"]), float(m8["loss"]), rtol=1e-5)
    np.testing.assert_allclose(float(m1["grad_norm"]), float(m8["grad_norm"]),
                               rtol=1e-3)
    # Per-element AdamW updates can flip direction where a gradient is ~0
    # (update ~ lr * g / (|g| + eps)); bound by a couple of LR units instead.
    for a, b in zip(jax.tree.leaves(s1.params), jax.tree.leaves(s8.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-2,
                                   atol=1e-3)
    # BatchNorm running stats must match too (global-batch statistics).
    for a, b in zip(jax.tree.leaves(s1.batch_stats), jax.tree.leaves(s8.batch_stats)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-3,
                                   atol=1e-5)

    for _ in range(2):
        s1, m1 = step(s1, b1)
        s8, m8 = step(s8, b8)
    np.testing.assert_allclose(float(m1["loss"]), float(m8["loss"]), rtol=3e-3)
    # After several chaotic SAM+AdamW steps individual near-zero elements can
    # diverge; require aggregate agreement (global relative L2).
    num = sum(float(jnp.sum((a - b) ** 2)) for a, b in
              zip(jax.tree.leaves(s1.params), jax.tree.leaves(s8.params)))
    den = sum(float(jnp.sum(a ** 2)) for a in jax.tree.leaves(s1.params))
    assert (num / den) ** 0.5 < 1e-2


def test_tensor_parallel_mesh_runs():
    """dp x tp mesh (4x2) with Megatron-style QKV/MLP sharding executes and
    produces finite loss."""
    cfg, model, state, batch = _setup()
    pcfg = ParallelConfig(mesh_shape=(4, 2))
    cfg = dataclasses.replace(cfg, parallel=pcfg)
    mesh = make_mesh(pcfg)
    state = state.replace(params=shard_params(state.params, mesh, pcfg),
                          ema_params=shard_params(state.ema_params, mesh, pcfg))
    bsh = batch_sharding(mesh, pcfg)
    b = {k: jax.device_put(jnp.asarray(v), bsh) for k, v in batch.items()}
    step = jax.jit(functools.partial(train_step, model, cfg))
    state, metrics = step(state, b)
    assert np.isfinite(float(metrics["loss"]))
    # QKV kernels actually sharded over the model axis
    qkv = state.params["block0"]["attn"]["qkv"]["kernel"]
    spec = qkv.sharding.spec
    assert "model" in str(spec)


def test_masking_identical_across_shardings():
    """Span masking must be a pure function of the key, not of device layout."""
    cfg, model, state, batch = _setup(masking_mode="span")
    step = jax.jit(functools.partial(train_step, model, cfg))
    s1, m1 = step(state, {k: jnp.asarray(v) for k, v in batch.items()})
    mesh = make_mesh()
    bsh = batch_sharding(mesh)
    s8, m8 = step(jax.device_put(state, jax.sharding.NamedSharding(
        mesh, jax.sharding.PartitionSpec())),
        {k: jax.device_put(jnp.asarray(v), bsh) for k, v in batch.items()})
    np.testing.assert_allclose(float(m1["loss"]), float(m8["loss"]), rtol=1e-4)


def test_spatial_parallel_width_sharding():
    """Sequence/spatial parallelism: sharding the image width over the model
    axis (GSPMD halo exchange for convs) must reproduce the dp-only loss."""
    cfg, model, state, batch = _setup()
    pcfg = ParallelConfig(mesh_shape=(2, 4))
    cfg = dataclasses.replace(cfg, parallel=pcfg)
    mesh = make_mesh(pcfg)
    step = jax.jit(functools.partial(train_step, model, cfg))

    img_sp = jax.device_put(jnp.asarray(batch["image"]), jax.sharding.NamedSharding(
        mesh, jax.sharding.PartitionSpec("data", None, "model", None)))
    dp = lambda v: jax.device_put(jnp.asarray(v), jax.sharding.NamedSharding(
        mesh, jax.sharding.PartitionSpec("data")))
    b_sp = {"image": img_sp, "labels": dp(batch["labels"]),
            "label_lengths": dp(batch["label_lengths"])}
    b_dp = {k: dp(v) for k, v in batch.items()}

    _, m_sp = step(state, b_sp)
    _, m_dp = step(state, b_dp)
    np.testing.assert_allclose(float(m_sp["loss"]), float(m_dp["loss"]), rtol=1e-4)
