"""Gradient accumulation + rematerialization (TPU memory levers).

Neither exists in the reference (single-GPU torch holds every activation,
README.md:38); both are pure re-schedulings of the same math, which is what
these tests pin:

- remat: jax.checkpoint recomputes identical values, so the full SAM step
  must produce the SAME updated parameters as the plain trace.
- grad_accum: on a batch made of two identical halves, per-microbatch BN
  statistics equal full-batch statistics, so the accumulated step's
  parameter update must match the unaccumulated one exactly (running-stat
  EMAs intentionally advance per microbatch and are excluded).
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from htr_vt_tpu.config import (ExperimentConfig, MaskConfig, ModelConfig,
                               OptimConfig, TrainConfig)
from htr_vt_tpu.models.htr_vt import build_model
from htr_vt_tpu.train.state import create_train_state
from htr_vt_tpu.train.step import jit_train_step


def _tiny_cfg(**model_kw):
    model = ModelConfig(nb_cls=10, img_size=(64, 64), embed_dim=32, depth=2,
                        num_heads=2, compute_dtype="float32",
                        masking=MaskConfig(mode="none"), **model_kw)
    return ExperimentConfig(model=model, optim=OptimConfig(total_iters=100),
                            train=TrainConfig(total_iters=100))


def _batch(rng, bs, nb_cls=10, w=64, h=64):
    return {
        "image": rng.random((bs, h, w, 1), dtype=np.float32),
        "labels": rng.integers(1, nb_cls, (bs, 5)).astype(np.int32),
        "label_lengths": np.full((bs,), 5, np.int32),
    }


def _run_one(cfg, batch, seed=0):
    model = build_model(cfg.model)
    sgm_sample = None
    if cfg.model.sgm.enable and "sgm_tgt" in batch:
        sgm_sample = {k: batch[k][:1] for k in
                      ("sgm_left", "sgm_right", "sgm_tgt", "sgm_mask")}
    state = create_train_state(cfg, model, jax.random.PRNGKey(seed),
                               np.zeros_like(batch["image"][:1]),
                               sgm_sample=sgm_sample)
    state, metrics = jit_train_step(model, cfg, donate=False)(state, batch)
    return state, metrics


@pytest.mark.parametrize("remat", ["blocks", "all"])
def test_remat_matches_plain_step(remat):
    rng = np.random.default_rng(0)
    batch = _batch(rng, 4)
    base, m0 = _run_one(_tiny_cfg(), batch)
    rem, m1 = _run_one(_tiny_cfg(remat=remat), batch)
    assert np.isfinite(float(m1["loss"]))
    np.testing.assert_allclose(float(m0["loss"]), float(m1["loss"]),
                               rtol=1e-6)
    for p0, p1 in zip(jax.tree.leaves(base.params), jax.tree.leaves(rem.params)):
        np.testing.assert_allclose(np.asarray(p0), np.asarray(p1),
                                   rtol=2e-5, atol=2e-6)


def test_remat_conformer_sgm_smoke():
    """remat must compose with BN-carrying conv blocks + mutable stats."""
    cfg = _tiny_cfg(encoder="conformer", remat="all")
    rng = np.random.default_rng(1)
    _, metrics = _run_one(cfg, _batch(rng, 4))
    assert np.isfinite(float(metrics["loss"]))


def test_grad_accum_equivalence_on_duplicated_halves():
    rng = np.random.default_rng(2)
    half = _batch(rng, 2)
    batch = {k: np.concatenate([v, v], axis=0) for k, v in half.items()}

    base, m0 = _run_one(_tiny_cfg(), batch)
    cfg2 = dataclasses.replace(
        _tiny_cfg(), train=TrainConfig(total_iters=100, grad_accum=2))
    acc, m1 = _run_one(cfg2, batch)

    np.testing.assert_allclose(float(m0["loss"]), float(m1["loss"]), rtol=1e-5)
    np.testing.assert_allclose(float(m0["grad_norm"]), float(m1["grad_norm"]),
                               rtol=1e-4)
    for p0, p1 in zip(jax.tree.leaves(base.params), jax.tree.leaves(acc.params)):
        np.testing.assert_allclose(np.asarray(p0), np.asarray(p1),
                                   rtol=5e-5, atol=5e-6)


def test_grad_accum_rejects_indivisible_batch():
    cfg = dataclasses.replace(
        _tiny_cfg(), train=TrainConfig(total_iters=100, grad_accum=3))
    rng = np.random.default_rng(3)
    with pytest.raises(ValueError, match="divisible"):
        _run_one(cfg, _batch(rng, 4))


def test_grad_accum_tri_masked_sgm_smoke():
    """accum composes with the tri-masked MMS + SGM trainer (3 forwards per
    microbatch per SAM pass) and stays finite."""
    model = ModelConfig(nb_cls=10, img_size=(64, 64), embed_dim=32, depth=2,
                        num_heads=2, compute_dtype="float32",
                        masking=MaskConfig(mode="mms", ratio=0.3),
                        sgm=dataclasses.replace(
                            ModelConfig().sgm, enable=True, vocab_size=14))
    cfg = ExperimentConfig(model=model, optim=OptimConfig(total_iters=100),
                           train=TrainConfig(total_iters=100, tri_masked=True,
                                             grad_accum=2))
    rng = np.random.default_rng(4)
    batch = _batch(rng, 4)
    s = 5
    batch.update({
        "sgm_left": rng.integers(0, 14, (4, 5, s)).astype(np.int32),
        "sgm_right": rng.integers(0, 14, (4, 5, s)).astype(np.int32),
        "sgm_tgt": rng.integers(0, 10, (4, 5)).astype(np.int32),
        "sgm_mask": np.ones((4, 5), np.float32),
    })
    _, metrics = _run_one(cfg, batch)
    assert np.isfinite(float(metrics["loss"]))
    assert np.isfinite(float(metrics["loss_second"]))


def test_cli_flags_wire_through():
    from htr_vt_tpu.cli.args import args_to_config, build_parser
    p = build_parser("t")
    cfg = args_to_config(p.parse_args(
        ["SYNTH", "--grad-accum", "4", "--remat", "all"]))
    assert cfg.train.grad_accum == 4
    assert cfg.model.remat == "all"


def test_tri_masked_long_width_smoke():
    """Tri-masked MMS training at N=256 tokens (1024-px lines): the
    length-scaled span placement budget (models/masking.py) gets a
    training-path exercise at multi-width scale, not just unit coverage
    (round-4 verdict #4)."""
    model = ModelConfig(nb_cls=10, img_size=(64, 1024), embed_dim=32,
                        depth=1, num_heads=2, compute_dtype="float32",
                        masking=MaskConfig(mode="mms", ratio=0.3))
    cfg = ExperimentConfig(model=model, optim=OptimConfig(total_iters=100),
                           train=TrainConfig(total_iters=100,
                                             tri_masked=True))
    assert cfg.model.num_tokens == 256
    rng = np.random.default_rng(5)
    batch = _batch(rng, 2, w=1024)
    _, metrics = _run_one(cfg, batch)
    assert np.isfinite(float(metrics["loss"]))
    assert np.isfinite(float(metrics["loss_second"]))
