"""Single-image quick inference.

Mirrors model_window/quick_inference.py: load EMA weights from a checkpoint,
preprocess one line image (aspect resize + pad, optional binarization
threshold sweep), greedy-decode, print the text. Usage:

    python -m htr_vt_tpu.cli.infer SYNTH --checkpoint <dir> --image line.png
"""

from __future__ import annotations

import os

import jax
import numpy as np
from PIL import Image

from htr_vt_tpu.cli.args import args_to_config, build_parser
from htr_vt_tpu.data.image import prepare_line_image
from htr_vt_tpu.data.loader import build_dataset, make_converter
from htr_vt_tpu.models.htr_vt import build_model
from htr_vt_tpu.train.checkpoint import CheckpointManager
from htr_vt_tpu.train.state import create_train_state
from htr_vt_tpu.train.step import jit_eval_step


def binarize(img: np.ndarray, threshold: float) -> np.ndarray:
    return (img > threshold).astype(np.float32)


def main() -> None:
    from htr_vt_tpu.utils.compile_cache import enable_compile_cache
    enable_compile_cache()
    parser = build_parser("htr_vt_tpu quick inference")
    parser.add_argument("--checkpoint", type=str, required=True)
    parser.add_argument("--image", type=str, required=True)
    parser.add_argument("--binarize-sweep", action="store_true", default=False,
                        help="try several binarization thresholds and report each"
                             " (quick_inference.py threshold sweep)")
    parser.add_argument("--llm-correct", type=str, default=None, metavar="MODEL",
                        help="local path/name of a masked-LM for word correction"
                             " (quick_inference_llm.py equivalent; requires"
                             " transformers + locally available weights)")
    args = parser.parse_args()
    cfg = args_to_config(args)

    train_ds = build_dataset(cfg.data, "train")
    converter = make_converter(cfg.data, train_ds)
    import dataclasses
    cfg = dataclasses.replace(cfg, model=dataclasses.replace(
        cfg.model, nb_cls=converter.num_classes))
    model = build_model(cfg.model)

    # restore through a pad-free template, then adapt (int8 stage1 pad)
    tmpl_cfg = dataclasses.replace(cfg, model=dataclasses.replace(
        cfg.model, quant_stage1_pad=0))
    sample = np.zeros((1, *cfg.model.img_size, 1), np.float32)
    template = create_train_state(tmpl_cfg, build_model(tmpl_cfg.model),
                                  jax.random.PRNGKey(0), sample)
    ckpt = CheckpointManager(os.path.dirname(args.checkpoint.rstrip("/")) or ".")
    state, _ = ckpt.restore(args.checkpoint, template)
    from htr_vt_tpu.ops.quant import serving_arrays
    sparams, sstats = serving_arrays(cfg.model, state.ema_params,
                                     state.ema_batch_stats)

    raw = np.array(Image.open(args.image).convert("L"))
    h, w = cfg.model.img_size
    variants = [("raw", prepare_line_image(raw, w, h))]
    if args.binarize_sweep:
        for th in (0.3, 0.4, 0.5, 0.6, 0.7):
            variants.append((f"bin@{th}", binarize(prepare_line_image(raw, w, h), th)))

    extra = None
    if cfg.model.quant == "int8":
        # Calibrate static scales on the actual input image (single-image
        # inference has no separate calibration stream).
        _, mut = model.apply(
            {"params": sparams, "batch_stats": sstats},
            variants[0][1][None], train=False, mutable=["quant_stats"])
        extra = {"quant_stats": mut["quant_stats"]}
    eval_fn = jit_eval_step(model, cfg, extra_vars=extra)

    corrector, vocabulary = None, None
    if args.llm_correct:
        try:
            from htr_vt_tpu.decode.lm import RobertaCorrector
            corrector = RobertaCorrector(args.llm_correct)
            vocabulary = {w.lower() for t in train_ds.labels for w in t.split()}
        except Exception as e:  # zero-egress deployments have no weights
            print(f"(LLM correction unavailable: {e})")

    for name, img in variants:
        batch = {"image": img[None],
                 "labels": np.zeros((1, 8), np.int32),
                 "label_lengths": np.zeros((1,), np.int32)}
        out = eval_fn(sparams, sstats, batch)
        text = converter.decode_batch(np.asarray(out["pred_ids"]))[0]
        print(f"[{name}] {text}")
        if corrector is not None:
            print(f"[{name}+llm] {corrector.correct(text, vocabulary)}")


if __name__ == "__main__":
    main()
