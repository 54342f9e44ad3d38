"""Integration: fit() on synthetic data — checkpoints, resume, artifacts."""

import dataclasses
import glob
import json
import os

import numpy as np
import pytest

pytestmark = pytest.mark.slow

from htr_vt_tpu.config import (DataConfig, ExperimentConfig, MaskConfig,
                               ModelConfig, OptimConfig, TrainConfig, dataset_preset)
from htr_vt_tpu.train.loop import fit


def tiny_experiment(tmp_path, exp_name="loop_smoke", total=6, resume=None):
    return ExperimentConfig(
        model=ModelConfig(nb_cls=30, img_size=(64, 128), embed_dim=64, depth=1,
                          num_heads=2, compute_dtype="float32",
                          masking=MaskConfig(mode="span", ratio=0.2, max_span_length=2)),
        optim=OptimConfig(max_lr=1e-3, warmup_iters=2, total_iters=total,
                          weight_decay=0.01),
        data=DataConfig(dataset="SYNTH", img_size=(64, 128), train_bs=8, val_bs=8,
                        num_workers=2, synth_train_size=32, synth_eval_size=8),
        train=TrainConfig(out_dir=str(tmp_path), exp_name=exp_name, seed=7,
                          total_iters=total, eval_iters=total, print_iters=3,
                          resume=resume, donate_state=False),
    )


def test_fit_writes_artifacts_and_resumes(tmp_path):
    cfg = tiny_experiment(tmp_path, total=4)
    result = fit(cfg)
    assert np.isfinite(result["best_cer"])

    run_dir = os.path.join(str(tmp_path), "loop_smoke")
    assert os.path.exists(os.path.join(run_dir, "run.log"))
    assert os.path.exists(os.path.join(run_dir, "metrics.jsonl"))
    assert os.path.exists(os.path.join(run_dir, "best_CER"))
    rolling = glob.glob(os.path.join(run_dir, "checkpoint_*"))
    assert rolling, "no rolling checkpoint written"
    meta = json.load(open(os.path.join(rolling[0], "meta.json")))
    assert meta["step"] == 4
    assert "config" in meta

    # metrics.jsonl carries train + val scalars
    lines = [json.loads(l) for l in open(os.path.join(run_dir, "metrics.jsonl"))]
    keys = set().union(*(l.keys() for l in lines))
    assert {"train/loss", "val/CER", "val/WER"} <= keys

    # resume continues from step 4 to step 6
    cfg2 = tiny_experiment(tmp_path, total=6, resume=rolling[0])
    result2 = fit(cfg2)
    rolling2 = sorted(glob.glob(os.path.join(run_dir, "checkpoint_*")))
    steps = [json.load(open(os.path.join(r, "meta.json")))["step"] for r in rolling2]
    assert 6 in steps


def test_load_model_and_encoder_only(tmp_path):
    """--load-model initializes weights (fresh step); --load-encoder-only
    keeps a fresh head (reference transfer-learning flags)."""
    import dataclasses
    import jax
    import glob

    cfg = tiny_experiment(tmp_path, exp_name="src_run", total=2)
    fit(cfg)
    src = glob.glob(os.path.join(str(tmp_path), "src_run", "checkpoint_*"))[0]

    cfg2 = tiny_experiment(tmp_path, exp_name="ft_run", total=1)
    cfg2 = dataclasses.replace(cfg2, train=dataclasses.replace(
        cfg2.train, load_model=src, load_encoder_only=True))
    result = fit(cfg2)
    assert np.isfinite(result["best_cer"])
    log = open(os.path.join(str(tmp_path), "ft_run", "run.log")).read()
    assert "loaded encoder weights" in log


def test_resume_is_stream_and_trajectory_exact(tmp_path):
    """"train N" == "train k, resume, train N-k": identical final params AND
    identical data stream (loader batch b is a pure function of (seed, b),
    resume passes start_batch=step). Round-2 verdict item #6."""
    import jax
    import glob

    N, K = 8, 4
    cfg_full = tiny_experiment(tmp_path, exp_name="full_run", total=N)
    fit(cfg_full)

    # first half: same config (same LR schedule horizon), stop early at K
    cfg_a = tiny_experiment(tmp_path, exp_name="split_run", total=N)
    cfg_a = dataclasses.replace(cfg_a, train=dataclasses.replace(
        cfg_a.train, total_iters=K, eval_iters=K))
    fit(cfg_a)
    ck = [p for p in glob.glob(os.path.join(str(tmp_path), "split_run",
                                            "checkpoint_*"))
          if json.load(open(os.path.join(p, "meta.json")))["step"] == K][0]
    cfg_b = tiny_experiment(tmp_path, exp_name="split_run", total=N, resume=ck)
    fit(cfg_b)

    from htr_vt_tpu.train.checkpoint import CheckpointManager
    from htr_vt_tpu.models.htr_vt import build_model
    from htr_vt_tpu.train.state import create_train_state

    def final_state(exp):
        run = os.path.join(str(tmp_path), exp)
        cks = glob.glob(os.path.join(run, "checkpoint_*"))
        ck = [p for p in cks
              if json.load(open(os.path.join(p, "meta.json")))["step"] == N][0]
        cfg = tiny_experiment(tmp_path, exp_name=exp, total=N)
        model = build_model(cfg.model)
        sample = np.zeros((cfg.data.train_bs, *cfg.model.img_size, 1), np.float32)
        template = create_train_state(cfg, model, jax.random.PRNGKey(0), sample)
        state, _ = CheckpointManager(run).restore(ck, template)
        return state

    s_full, s_split = final_state("full_run"), final_state("split_run")
    for a, b in zip(jax.tree.leaves(s_full.params), jax.tree.leaves(s_split.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=0, atol=0)
    for a, b in zip(jax.tree.leaves(s_full.ema_params),
                    jax.tree.leaves(s_split.ema_params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=0, atol=0)


def test_broadcast_str_roundtrip_and_overflow():
    """_broadcast_str: identity on 1 process; refuses (never truncates) paths
    beyond the buffer (regression: >512-byte paths were silently cut)."""
    import pytest

    from htr_vt_tpu.train.loop import _broadcast_str
    assert _broadcast_str(None) is None
    p = "/some/run/dir/checkpoint_0.0123_0.0456_98000"
    assert _broadcast_str(p) == p
    with pytest.raises(ValueError, match="exceeds"):
        _broadcast_str("/x" * 3000)


def test_step_timer_windows_are_host_synced():
    """StepTimer.close_window: rate = images/elapsed since the previous
    close; a 0-step close resets the window without touching the rate
    (used after eval so eval wall time doesn't deflate the next window)."""
    import time

    from htr_vt_tpu.utils.logging import StepTimer

    t = StepTimer()
    assert t.rate == 0.0
    time.sleep(0.05)
    t.close_window(10, 8)  # 80 images over >=50 ms -> rate < 1600
    assert 0.0 < t.rate <= 80 / 0.05 + 1
    first = t.rate

    time.sleep(0.05)
    t.close_window(0, 0)  # eval boundary: reset only
    assert t.rate == first
    time.sleep(0.02)
    t.close_window(10, 8)
    # the eval sleep must not count against the new window
    assert t.rate > 80 / 0.05
