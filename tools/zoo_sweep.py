"""Encoder-zoo training sweep: prove every registered recipe TRAINS on TPU.

Parity tests pin each variant's forward math against the reference modules
(tests/test_torch_parity.py, test_sgm.py, ...), and three recipes have long
hardware runs on record (vit flagship, conformer_long 20k, squeezeformer
800-iter — docs/PERF.md). This tool closes the remaining gap: a uniform
short-budget training run for EVERY --encoder value (the reference's 15
variant directories, SURVEY.md section 2.6) plus the encoder-decoder model
type, on the same SYNTH stream, recording best CER/WER, sustained img/s and
wall time per recipe.

Uniform budget by design: 1,500 iterations, bs 64, span masking, no SGM /
tri-masking (those multiply step cost per recipe and are covered by the
flagship runs) — the sweep answers "does each recipe train and at what
rate", not "what is each recipe's best accuracy".

Usage (TPU, ~1.5-2.5 h at defaults):
    python tools/zoo_sweep.py --out output/zoo_sweep
    python tools/zoo_sweep.py --encoders vit,conformer --iters 300  # smoke
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# every registry recipe (models/variants.py) + standalone swin/svtr + the
# autoregressive encoder-decoder model type (reference's missing trainer,
# SURVEY.md section 2.6 last row)
DEFAULT_ENCODERS = [
    "vit", "window", "macaron", "macaron_2", "localglobal", "lgp",
    "lgp_svtr", "conformer", "squeezeformer", "van", "van2", "swin", "svtr",
    "encdec",
]


def run_one(name: str, args) -> dict:
    out_dir = os.path.join(args.out, name)
    cmd = [sys.executable, "-m", "htr_vt_tpu.cli.train", "SYNTH",
           "--out-dir", args.out, "--exp-name", name,
           "--train-bs", str(args.bs), "--val-bs", str(args.bs),
           "--total-iter", str(args.iters),
           "--warm-up-iter", str(max(1, args.iters // 10)),
           "--eval-iter", str(args.eval_every),
           "--print-iter", "100", "--seed", str(args.seed),
           "--num-workers", "4",
           "--embed-dim", str(args.embed_dim), "--depth", str(args.depth),
           "--num-heads", str(args.num_heads)]
    if args.cpu_smoke:
        cmd += ["--compute-dtype", "float32"]
    if name == "encdec":
        cmd += ["--encoder", "vit", "--model-type", "encoder_decoder"]
    else:
        cmd += ["--encoder", name]
    t0 = time.time()
    env = dict(os.environ)
    with open(os.path.join(args.out, f"{name}.out"), "w") as logf:
        rc = subprocess.call(cmd, cwd=REPO, stdout=logf,
                             stderr=subprocess.STDOUT, env=env,
                             timeout=args.timeout)
    wall_min = (time.time() - t0) / 60.0
    rec = {"encoder": name, "rc": rc, "wall_min": round(wall_min, 1)}
    metrics_path = os.path.join(out_dir, "metrics.jsonl")
    if os.path.exists(metrics_path):
        rates, best_cer, best_wer = [], None, None
        with open(metrics_path) as f:
            for line in f:
                try:
                    r = json.loads(line)
                except ValueError:
                    continue
                if "train/imgs_per_sec" in r and r["train/imgs_per_sec"] > 0:
                    rates.append(r["train/imgs_per_sec"])
                if "val/best_CER" in r:
                    best_cer = r["val/best_CER"]
                    best_wer = r.get("val/best_WER")
        if rates:
            # sustained rate: median of the post-warmup windows (drop the
            # first window, which amortizes compilation)
            tail = sorted(rates[1:] or rates)
            rec["imgs_per_sec"] = round(tail[len(tail) // 2], 1)
        rec["best_cer"] = best_cer
        rec["best_wer"] = best_wer
    return rec


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", type=str, default="output/zoo_sweep")
    ap.add_argument("--encoders", type=str, default=",".join(DEFAULT_ENCODERS))
    ap.add_argument("--iters", type=int, default=1500)
    ap.add_argument("--bs", type=int, default=64)
    ap.add_argument("--eval-every", type=int, default=500)
    ap.add_argument("--seed", type=int, default=7)
    ap.add_argument("--timeout", type=int, default=2400,
                    help="hard per-recipe wall cap, seconds")
    ap.add_argument("--embed-dim", type=int, default=768)
    ap.add_argument("--depth", type=int, default=4)
    ap.add_argument("--num-heads", type=int, default=6)
    ap.add_argument("--cpu-smoke", action="store_true",
                    help="float32 compute for CPU plumbing smokes")
    args = ap.parse_args()

    os.makedirs(args.out, exist_ok=True)
    results = []
    for name in [e.strip() for e in args.encoders.split(",") if e.strip()]:
        print(f"=== {name} ===", flush=True)
        try:
            rec = run_one(name, args)
        except subprocess.TimeoutExpired:
            rec = {"encoder": name, "rc": "timeout"}
        except Exception as e:  # keep sweeping; record the failure
            rec = {"encoder": name, "rc": f"error: {e}"}
        print(json.dumps(rec), flush=True)
        results.append(rec)
        with open(os.path.join(args.out, "summary.json"), "w") as f:
            json.dump({"iters": args.iters, "bs": args.bs,
                       "results": results}, f, indent=1)

    # markdown table for docs
    lines = ["| encoder | best CER | best WER | img/s | wall min | rc |",
             "|---|---|---|---|---|---|"]
    for r in results:
        lines.append("| {} | {} | {} | {} | {} | {} |".format(
            r["encoder"],
            f"{r['best_cer']:.4f}" if r.get("best_cer") is not None else "-",
            f"{r['best_wer']:.4f}" if r.get("best_wer") is not None else "-",
            r.get("imgs_per_sec", "-"), r.get("wall_min", "-"), r["rc"]))
    table = "\n".join(lines)
    with open(os.path.join(args.out, "summary.md"), "w") as f:
        f.write(table + "\n")
    print(table)


if __name__ == "__main__":
    main()
