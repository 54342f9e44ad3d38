"""90-class float-vs-int8 CER comparison (round-2 verdict #8).

READ2016's codec is ~90 classes (SURVEY §2.2); the synthetic renderer is
ASCII-only (cv2 Hershey glyphs), so this drives the SAME class count with an
ASCII alphabet: 26 lower + 26 upper + 10 digits + space + 27 punctuation = 90
chars -> 91 CTC classes. Trains the flagship recipe briefly, then evaluates
the test split float and --quant int8 with calibrated scales, recording the
CER delta (quantization noise scales with the logit margin over many more
classes, which is exactly what this probes).

Usage (TPU): python tools/read90_int8.py --iters 3000 --bs 64
"""

from __future__ import annotations

import argparse
import json
import os
import string
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ALPHA90 = string.ascii_lowercase + string.ascii_uppercase + string.digits + \
    " .,;:!?'\"()-/\\&+#%*=<>@[]_|~"
assert len(set(ALPHA90)) == 90, len(set(ALPHA90))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=3000)
    ap.add_argument("--bs", type=int, default=64)
    ap.add_argument("--out", type=str, default="output")
    ap.add_argument("--exp-name", type=str, default="read90")
    ap.add_argument("--skip-train", action="store_true",
                    help="evaluate an existing checkpoint only")
    ap.add_argument("--embed-dim", type=int, default=768,
                    help="shrink for CPU smoke runs")
    ap.add_argument("--depth", type=int, default=4)
    ap.add_argument("--num-heads", type=int, default=6)
    ap.add_argument("--synth-train-size", type=int, default=4096)
    ap.add_argument("--synth-eval-size", type=int, default=512)
    args = ap.parse_args()

    common = ["SYNTH", "--synth-alphabet", ALPHA90,
              "--synth-train-size", str(args.synth_train_size),
              "--synth-eval-size", str(args.synth_eval_size),
              "--embed-dim", str(args.embed_dim), "--depth", str(args.depth),
              "--num-heads", str(args.num_heads),
              "--out-dir", args.out, "--exp-name", args.exp_name,
              "--train-bs", str(args.bs), "--val-bs", str(args.bs)]

    if not args.skip_train:
        sys.argv = ["train", *common,
                    "--total-iter", str(args.iters),
                    "--warm-up-iter", str(max(1, args.iters // 10)),
                    "--eval-iter", str(max(500, args.iters // 4)),
                    "--print-iter", "200", "--max-lr", "1e-3",
                    "--weight-decay", "0.5", "--seed", "7", "--resume", "auto"]
        from htr_vt_tpu.cli.train import main as train_main
        train_main()

    ckpt = os.path.abspath(os.path.join(args.out, args.exp_name, "best_CER"))
    results = {}
    for tag, extra in [("float", []), ("int8", ["--quant", "int8"])]:
        sys.argv = ["test", *common, "--checkpoint", ckpt, "--split", "test",
                    *extra, "--predictions-out", f"/tmp/read90_{tag}.json"]
        from htr_vt_tpu.cli.test import main as test_main
        test_main()
        with open(f"/tmp/read90_{tag}.json") as f:
            r = json.load(f)
        results[tag] = {"cer": r["CER"], "wer": r["WER"]}

    results["cer_delta"] = results["int8"]["cer"] - results["float"]["cer"]
    out_path = os.path.join(args.out, args.exp_name, "read90_int8_summary.json")
    with open(out_path, "w") as f:
        json.dump({"alphabet_size": 90, "nb_cls": 91, "iters": args.iters,
                   **results}, f, indent=1)
    print(json.dumps(results))
    print("wrote", out_path)


if __name__ == "__main__":
    main()
