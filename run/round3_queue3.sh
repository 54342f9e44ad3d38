#!/bin/bash
# Round-3 TPU queue, stage 3 (fifth session). Waits for the 3-bucket
# multi-width run (512/1024/2048), then in sequence:
#   1. BN-stats one-pass Pallas whole-step A/B (the queue2 item 5
#      measurement that never got chip time) + standalone attribution
#   2. serve --selftest over 512/1024/2048 buckets with the new multi-width
#      checkpoint: does the 2048 bucket fix the full-ramp squeeze tail
#      documented in docs/PERF.md?  (float + int8)
#   3. encoder-zoo training sweep: every registered recipe, uniform budget
#   4. final bench.py refresh
set -x
cd /root/repo
WAIT_PID=${1:-}
if [ -n "$WAIT_PID" ]; then
  while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 60; done
  echo "multi-width run (pid $WAIT_PID) done; chip is free"
  sleep 10
fi

echo "=== 1 BN-stats impl A/B (whole step) ==="
HTRVT_BN_STATS_IMPL=xla    timeout 1200 python bench.py > /tmp/bench_bnstats_xla.json 2>/tmp/bench_bnstats_xla.err
HTRVT_BN_STATS_IMPL=pallas timeout 1200 python bench.py > /tmp/bench_bnstats_pallas.json 2>/tmp/bench_bnstats_pallas.err
timeout 1200 python tools/bench_bn_stats.py > /tmp/bench_bnstats_attrib.txt 2>&1

CKPT=/root/repo/output/multiwidth3/best_CER
echo "=== 2a serve selftest: full ramp to 108 chars, 3 buckets, float ==="
timeout 2400 python -m htr_vt_tpu.cli.serve --checkpoint $CKPT \
    --selftest --selftest-n 64 --selftest-max-chars 108 \
    --width-buckets 512,1024,2048 \
    --out /tmp/serve3_fullramp_float.json
echo "=== 2b same, int8 ==="
timeout 2400 python -m htr_vt_tpu.cli.serve --checkpoint $CKPT \
    --selftest --selftest-n 64 --selftest-max-chars 108 \
    --width-buckets 512,1024,2048 --quant int8 \
    --out /tmp/serve3_fullramp_int8.json
echo "=== 2c control: same workload capped at 1024 (old recipe's ceiling) ==="
timeout 2400 python -m htr_vt_tpu.cli.serve --checkpoint $CKPT \
    --selftest --selftest-n 64 --selftest-max-chars 108 \
    --width-buckets 512,1024 \
    --out /tmp/serve3_fullramp_1024cap.json

echo "=== 3 encoder zoo sweep ==="
timeout 14400 python tools/zoo_sweep.py --out output/zoo_sweep

echo "=== 4 bench refresh ==="
timeout 1200 python bench.py > /tmp/bench_final_q3.json 2>/tmp/bench_final_q3.err

echo "=== QUEUE3 DONE ==="
