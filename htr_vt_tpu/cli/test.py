"""Evaluation entry point: ``python -m htr_vt_tpu.cli.test [DATASET] --checkpoint ...``.

Reference behavior (model_v1/test.py): load the EMA weights, rebuild the
training alphabet, evaluate the test split, print CER/WER, and dump
``predictions.json`` with per-sample CER/WER.
"""

from __future__ import annotations

import json
import os

import jax
import numpy as np

from htr_vt_tpu.cli.args import args_to_config, build_parser
from htr_vt_tpu.data.loader import build_dataset, choose_max_label_len, eval_batches, make_converter
from htr_vt_tpu.eval.validate import validate
from htr_vt_tpu.models.htr_vt import build_model
from htr_vt_tpu.parallel.mesh import batch_sharding, make_mesh
from htr_vt_tpu.text.metrics import per_sample_cer_wer
from htr_vt_tpu.train.checkpoint import CheckpointManager
from htr_vt_tpu.train.state import create_train_state
from htr_vt_tpu.train.step import jit_eval_step


def main() -> None:
    from htr_vt_tpu.utils.compile_cache import enable_compile_cache
    enable_compile_cache()
    parser = build_parser("htr_vt_tpu evaluator")
    parser.add_argument("--checkpoint", type=str, required=True,
                        help="checkpoint dir (rolling, best_CER/best_WER, or run dir)")
    parser.add_argument("--split", type=str, default="test", choices=["val", "test"])
    parser.add_argument("--predictions-out", type=str, default=None)
    parser.add_argument("--calib-batches", type=int, default=4,
                        help="batches used to calibrate int8 activation "
                             "scales (running abs-max); --quant int8 only")
    args = parser.parse_args()
    cfg = args_to_config(args)

    # Training alphabet defines the codec (reference test.py:43-45 reloads the
    # train split only to rebuild it).
    train_ds = build_dataset(cfg.data, "train")
    eval_ds = build_dataset(cfg.data, args.split)
    converter = make_converter(cfg.data, train_ds)
    import dataclasses
    cfg = dataclasses.replace(cfg, model=dataclasses.replace(
        cfg.model, nb_cls=converter.num_classes))
    model = build_model(cfg.model)
    max_label_len = choose_max_label_len(train_ds.labels, cfg.model.num_tokens)

    # Checkpoints live at the training widths; restore through a pad-free
    # template, then adapt to the serving model (int8 stage1 pad — round 5,
    # ops/quant.py:serving_arrays).
    tmpl_cfg = dataclasses.replace(cfg, model=dataclasses.replace(
        cfg.model, quant_stage1_pad=0))
    sample = np.zeros((cfg.data.val_bs, *cfg.model.img_size, 1), np.float32)
    template = create_train_state(tmpl_cfg, build_model(tmpl_cfg.model),
                                  jax.random.PRNGKey(0), sample)
    ckpt = CheckpointManager(os.path.dirname(args.checkpoint.rstrip("/")) or ".")
    state, meta = ckpt.restore(args.checkpoint, template)
    from htr_vt_tpu.ops.quant import serving_arrays
    sparams, sstats = serving_arrays(cfg.model, state.ema_params,
                                     state.ema_batch_stats)

    mesh = make_mesh(cfg.parallel)
    extra = None
    if cfg.model.quant == "int8":
        # Calibrate static activation scales over several batches (running
        # abs-max across calls — a single batch can under-estimate the scale
        # and silently clip later activations); without this the dynamic
        # path still works but forgoes the fused-quantize speed.
        from htr_vt_tpu.ops.quant import calibrate_quant_stats
        extra = {"quant_stats": calibrate_quant_stats(
            model,
            {"params": sparams, "batch_stats": sstats},
            (b["image"] for b, _, _ in eval_batches(
                eval_ds, converter, cfg.data.val_bs, max_label_len)),
            args.calib_batches)}
    eval_fn = jit_eval_step(model, cfg, extra_vars=extra)
    loss, cer, wer, preds, labels = validate(
        eval_fn, sparams, sstats,
        eval_batches(eval_ds, converter, cfg.data.val_bs, max_label_len),
        converter, sharding=batch_sharding(mesh, cfg.parallel))
    print(f"loss {loss:.4f}  CER {cer:.4f}  WER {wer:.4f}  ({len(preds)} samples)")

    out_path = args.predictions_out or os.path.join(
        cfg.train.out_dir, cfg.train.exp_name, "predictions.json")
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    records = []
    for p, l in zip(preds, labels):
        scer, swer = per_sample_cer_wer(p, l)
        records.append({"prediction": p, "label": l, "cer": scer, "wer": swer})
    with open(out_path, "w") as f:
        json.dump({"CER": cer, "WER": wer, "loss": loss, "samples": records},
                  f, indent=2, ensure_ascii=False)
    print(f"wrote {out_path}")


if __name__ == "__main__":
    main()
