"""Sweep XLA/TPU compiler knobs over bench.py's training step.

VERDICT r2 #2 asked for the remaining train-throughput levers to be either
harvested or measured-and-closed. tools/trace_gaps.py already showed the
compute core 100% busy, so any further win must come from XLA emitting
better code for the same op stream — which only compiler flags can reach.
This driver re-runs `python bench.py` under a set of XLA_FLAGS candidates
(one process per setting: flags are parsed at backend init) and prints a
sorted table. Each candidate is a documented public xla_tpu/xla flag; the
sweep records wins AND regressions so docs/PERF.md can close the thread
with numbers either way.

Usage: python tools/sweep_xla_flags.py [--quick]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

CANDIDATES = [
    ("baseline", ""),
    # Scheduler: latency-hiding scheduler is default-on for async ops; the
    # aggressive opportunistic variant trades VMEM scratch for overlap.
    ("lhs_aggressive",
     "--xla_tpu_enable_aggressive_instruction_fusion=true"),
    # Bigger scoped-vmem budget: lets the emitter pick larger conv tiles
    # (default is conservative; the stem's 3x3 convs are tile-bound).
    ("vmem_128m", "--xla_tpu_scoped_vmem_limit_kib=131072"),
    ("vmem_64m", "--xla_tpu_scoped_vmem_limit_kib=65536"),
    # Loop double-buffering / collective pipelining knobs.
    ("no_rewrites", "--xla_tpu_enable_dot_strength_reduction=false"),
    # Flatten tuples & all-reduce combining thresholds are multi-chip-only;
    # skipped on 1 chip.
    ("async_all", "--xla_tpu_enable_async_all_gather=true"),
]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true",
                    help="only baseline + vmem sweeps")
    ap.add_argument("--bs", type=str, default=None)
    args = ap.parse_args()

    cands = CANDIDATES[:4] if args.quick else CANDIDATES
    results = []
    for name, flags in cands:
        env = dict(os.environ)
        env["HTRVT_BENCH_TRAIN_ONLY"] = "1"  # train flags only affect train
        if flags:
            env["XLA_FLAGS"] = (env.get("XLA_FLAGS", "") + " " + flags).strip()
        # Flag changes invalidate the persistent compile cache key, so each
        # run pays one fresh compile; keep the cache dir anyway for reruns.
        if args.bs:
            env["HTRVT_BS"] = args.bs
        proc = subprocess.run([sys.executable, "bench.py"], env=env,
                              capture_output=True, text=True, timeout=3000)
        line = [l for l in proc.stdout.splitlines() if l.startswith("{")]
        if not line:
            print(f"{name}: FAILED rc={proc.returncode} "
                  f"{proc.stderr.strip().splitlines()[-1] if proc.stderr else ''}")
            continue
        rec = json.loads(line[-1])
        rec["_name"] = name
        rec["_flags"] = flags
        results.append(rec)
        # train-only records (HTRVT_BENCH_TRAIN_ONLY=1) carry no infer metrics
        extra = ""
        if "infer_images_per_sec" in rec:
            extra = (f"  (infer {rec['infer_images_per_sec']:7.1f}, "
                     f"int8 {rec.get('infer_int8_images_per_sec', 0):7.1f})")
        print(f"{name:16s} {rec['value']:7.1f} img/s{extra}", flush=True)

    if results:
        best = max(results, key=lambda r: r["value"])
        base = next((r for r in results if r["_name"] == "baseline"), best)
        print(f"\nbest: {best['_name']} at {best['value']} img/s "
              f"({best['value'] / base['value']:.3f}x baseline)")
        with open("/tmp/sweep_xla_flags.json", "w") as f:
            json.dump(results, f, indent=1)


if __name__ == "__main__":
    main()
