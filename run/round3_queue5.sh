#!/bin/bash
# Round-3 TPU queue, stage 5 (fifth session). Waits for queue4, then:
#   1. re-run the vit + window zoo entries: both trained before the
#      StepTimer dispatch-time fix landed, so their recorded img/s is the
#      inflated dispatch rate (vit "902 img/s" > the 864 roofline). The
#      re-run records honest host-synced rates; a merge step replaces
#      those two rows in output/zoo_sweep/summary.{json,md}.
#   2. XLA compiler-flag sweep over bench.py (the one remaining
#      measure-and-close thread from VERDICT r2 #2)
#   3. final bench refresh
set -x
cd /root/repo
WAIT_PID=${1:-}
if [ -n "$WAIT_PID" ]; then
  while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 60; done
  echo "queue4 (pid $WAIT_PID) done; chip is free"
  sleep 10
fi

echo "=== 1 zoo rate re-runs (fixed StepTimer) ==="
timeout 7200 python tools/zoo_sweep.py --out output/zoo_sweep_fix \
    --encoders vit,window 2>&1 | tail -6
python - <<'EOF'
import json
with open("output/zoo_sweep/summary.json") as f:
    base = json.load(f)
with open("output/zoo_sweep_fix/summary.json") as f:
    fix = json.load(f)
fixed = {r["encoder"]: r for r in fix["results"]}
base["results"] = [fixed.get(r["encoder"], r) for r in base["results"]]
with open("output/zoo_sweep/summary.json", "w") as f:
    json.dump(base, f, indent=1)
lines = ["| encoder | best CER | best WER | img/s | wall min | rc |",
         "|---|---|---|---|---|---|"]
for r in base["results"]:
    lines.append("| {} | {} | {} | {} | {} | {} |".format(
        r["encoder"],
        f"{r['best_cer']:.4f}" if r.get("best_cer") is not None else "-",
        f"{r['best_wer']:.4f}" if r.get("best_wer") is not None else "-",
        r.get("imgs_per_sec", "-"), r.get("wall_min", "-"), r["rc"]))
with open("output/zoo_sweep/summary.md", "w") as f:
    f.write("\n".join(lines) + "\n")
print("\n".join(lines))
EOF

echo "=== 2 XLA flag sweep ==="
timeout 9000 python tools/sweep_xla_flags.py 2>&1 | tee /tmp/sweep_xla.log | tail -15

echo "=== 3 final bench refresh ==="
timeout 1800 python bench.py > /tmp/bench_final_q5.json 2>/tmp/bench_final_q5.err
cat /tmp/bench_final_q5.json

echo "=== QUEUE5 DONE ==="
