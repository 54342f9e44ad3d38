"""Integration: fit() on synthetic data — checkpoints, resume, artifacts."""

import dataclasses
import glob
import json
import os

import numpy as np
import pytest

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
