"""Multi-width training recipe: one parameter set, several compiled widths.

Round-2 verdict #7: width-bucketed serving (cli/serve.py --width-buckets)
routed long lines to 1024/2048-px programs, but the model only ever trained
at 512 px — quality on long inputs was "degrades as expected". This recipe
closes that gap the TPU way: shapes stay STATIC per bucket (one compiled
train/eval program per width — no dynamic shapes, no recompilation), batches
alternate between buckets, and every width shares the same parameters (the
stem convs and transformer blocks are width-independent; the fixed sin-cos
positional embedding is analytic in the grid, models/layers.py, so each
width's program just builds a longer PE).

Dataset: SYNTH lines rendered at each bucket's natural width, with label
lengths sized to the canvas (trim_to_canvas, data/synthetic.py) — the wide
bucket really contains long lines, not stretched short ones.

Outputs: checkpoints (best_CER over the mean of bucket CERs), per-bucket
CER/WER, per-bucket eval step time, and a JSON summary for docs/PERF.md.

Usage (TPU, ~1 h at defaults):
    python tools/train_multiwidth.py --iters 6000 --bs 64 \
        --widths 512,1024,2048 --out output/multiwidth
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=8000)
    ap.add_argument("--bs", type=int, default=64)
    ap.add_argument("--widths", type=str, default="512,1024,2048")
    ap.add_argument("--encoder", type=str, default="vit")
    ap.add_argument("--train-size", type=int, default=1024,
                    help="train lines PER BUCKET")
    ap.add_argument("--eval-size", type=int, default=256)
    ap.add_argument("--eval-every", type=int, default=1000)
    ap.add_argument("--max-lr", type=float, default=1e-3)
    ap.add_argument("--seed", type=int, default=11)
    ap.add_argument("--out", type=str, default="output/multiwidth")
    ap.add_argument("--embed-dim", type=int, default=768,
                    help="shrink for CPU smoke tests")
    ap.add_argument("--depth", type=int, default=4)
    ap.add_argument("--num-heads", type=int, default=6)
    args = ap.parse_args()

    import jax
    from htr_vt_tpu.utils.compile_cache import enable_compile_cache
    enable_compile_cache()
    import dataclasses

    import jax.numpy as jnp

    from htr_vt_tpu.config import (ExperimentConfig, MaskConfig, ModelConfig,
                                   OptimConfig, TrainConfig)
    from htr_vt_tpu.data.loader import TrainLoader, choose_max_label_len, eval_batches
    from htr_vt_tpu.data.synthetic import SyntheticLineDataset
    from htr_vt_tpu.models.htr_vt import HTRVT
    from htr_vt_tpu.text.converter import CTCLabelConverter
    from htr_vt_tpu.text.metrics import RecognitionMetrics
    from htr_vt_tpu.train.checkpoint import CheckpointManager
    from htr_vt_tpu.train.state import create_train_state
    from htr_vt_tpu.train.step import jit_eval_step, jit_train_step
    from htr_vt_tpu.utils.logging import get_logger

    widths = [int(w) for w in args.widths.split(",")]
    os.makedirs(args.out, exist_ok=True)
    logger = get_logger(args.out)

    # chars-per-width: ~28 chars fill 512 px at the renderer's glyph scale
    def len_range(w):
        hi = max(6, int(28 * w / 512))
        return max(4, hi // 3), hi

    buckets = []
    for bi, w in enumerate(widths):
        lo, hi = len_range(w)
        train = SyntheticLineDataset(args.train_size, seed=args.seed + 10 * bi,
                                     width=w, min_len=lo, max_len=hi,
                                     trim_to_canvas=True)
        val = SyntheticLineDataset(args.eval_size, seed=args.seed + 10 * bi + 1,
                                   width=w, min_len=lo, max_len=hi,
                                   trim_to_canvas=True)
        buckets.append({"w": w, "train": train, "val": val})

    alphabet = sorted(set().union(*[set(b["train"].alphabet) for b in buckets]))
    converter = CTCLabelConverter(alphabet)

    base = ExperimentConfig(
        model=ModelConfig(nb_cls=converter.num_classes, encoder=args.encoder,
                          embed_dim=args.embed_dim, depth=args.depth,
                          num_heads=args.num_heads,
                          masking=MaskConfig(mode="span", ratio=0.4,
                                             max_span_length=8)),
        optim=OptimConfig(max_lr=args.max_lr, warmup_iters=args.iters // 10,
                          total_iters=args.iters, weight_decay=0.5),
        train=TrainConfig(out_dir=args.out, exp_name="", seed=args.seed))

    # per-width configs / programs; parameters are shared (width-independent)
    for b in buckets:
        b["cfg"] = dataclasses.replace(base, model=dataclasses.replace(
            base.model, img_size=(64, b["w"])))
        b["model"] = HTRVT(b["cfg"].model)
        b["tokens"] = b["cfg"].model.num_tokens
        b["max_label_len"] = choose_max_label_len(b["train"].labels, b["tokens"])
        b["loader"] = TrainLoader(b["train"], converter, args.bs,
                                  b["max_label_len"],
                                  augment=base.data.augment,
                                  seed=args.seed + b["w"], num_threads=4)
        b["step"] = jit_train_step(b["model"], b["cfg"], donate=False)
        b["eval"] = jit_eval_step(b["model"], b["cfg"])

    sample = np.zeros((args.bs, 64, widths[0], 1), np.float32)
    state = create_train_state(base, buckets[0]["model"],
                               jax.random.PRNGKey(args.seed), sample)
    ckpt = CheckpointManager(args.out, keep=3)

    def evaluate():
        out = {}
        for b in buckets:
            m = RecognitionMetrics()
            t0, nb = time.perf_counter(), 0
            for batch, valid, texts in eval_batches(b["val"], converter,
                                                    args.bs, b["max_label_len"]):
                r = b["eval"](state.ema_params, state.ema_batch_stats,
                              {k: jnp.asarray(v) for k, v in batch.items()})
                preds = converter.decode_batch(np.asarray(r["pred_ids"])[:valid])
                m.update(preds, texts)
                nb += 1
            out[b["w"]] = {"cer": m.cer, "wer": m.wer,
                           "eval_ms_per_batch":
                               (time.perf_counter() - t0) / nb * 1e3}
        return out

    logger.info("multi-width training: widths=%s bs=%d iters=%d encoder=%s",
                widths, args.bs, args.iters, args.encoder)
    best = 1e9
    best_wer = 1e9
    history = []
    t0 = time.time()
    for it in range(args.iters):
        b = buckets[it % len(buckets)]
        host = next(b["loader"])
        batch = {k: jnp.asarray(v) for k, v in host.items()}
        state, metrics = b["step"](state, batch)
        if (it + 1) % 200 == 0:
            logger.info("iter %d loss %.4f (%.0f img/s)", it + 1,
                        float(metrics["loss"]),
                        200 * args.bs / max(time.time() - t0, 1e-9))
            t0 = time.time()
        if (it + 1) % args.eval_every == 0 or it + 1 == args.iters:
            res = evaluate()
            mean_cer = float(np.mean([r["cer"] for r in res.values()]))
            for w, r in res.items():
                logger.info("iter %d width %d: CER %.4f WER %.4f "
                            "(eval %.1f ms/batch)", it + 1, w, r["cer"],
                            r["wer"], r["eval_ms_per_batch"])
            history.append({"iter": it + 1,
                            **{str(w): {k: round(v, 4) for k, v in r.items()}
                               for w, r in res.items()}})
            mean_wer = float(np.mean([r["wer"] for r in res.values()]))
            best = min(best, mean_cer)
            best_wer = min(best_wer, mean_wer)
            ckpt.save(state, cer=mean_cer, wer=mean_wer,
                      best_cer=best, best_wer=best_wer,
                      meta={"widths": widths, "history": history})

    for b in buckets:
        b["loader"].close()
    summary = {"widths": widths, "iters": args.iters, "bs": args.bs,
               "encoder": args.encoder, "final": history[-1],
               "history": history}
    with open(os.path.join(args.out, "multiwidth_summary.json"), "w") as f:
        json.dump(summary, f, indent=1)
    logger.info("final: %s", json.dumps(history[-1]))


if __name__ == "__main__":
    main()
