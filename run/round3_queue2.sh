#!/bin/bash
# Round-3 TPU queue, stage 2 (runs after run/round3_queue.sh exits):
#   4. flash-attention HW A/B at the width-bucket shapes   [PERF.md evidence]
#   5. BN-stats one-pass Pallas kernel A/B on the train step [VERDICT r2 #2]
#   6. serve e2e over width buckets with the multi-width checkpoint [#7]
#   7. final bench.py refresh
set -x
cd /root/repo
WAIT_PID=${1:-}
if [ -n "$WAIT_PID" ]; then
  while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 60; done
  echo "stage-1 queue (pid $WAIT_PID) done"
  sleep 10
fi

echo "=== 4 flash-attention A/B ==="
timeout 3600 python tools/bench_attn.py --bs 128 2>&1 | tee /tmp/bench_attn.log

echo "=== 5a bench.py default (bn_stats xla) ==="
timeout 3600 python bench.py 2>&1 | tee /tmp/bench_bnstats_xla.log
echo "=== 5b bench.py HTRVT_BN_STATS_IMPL=pallas ==="
timeout 3600 env HTRVT_BN_STATS_IMPL=pallas python bench.py 2>&1 | tee /tmp/bench_bnstats_pallas.log

echo "=== 6 serve e2e on the multi-width checkpoint ==="
timeout 2400 python -m htr_vt_tpu.cli.serve SYNTH \
    --checkpoint output/multiwidth/best_CER \
    --width-buckets 512,1024 --selftest --selftest-n 32 \
    2>&1 | tee /tmp/serve_multiwidth.log || true

echo "=== 7 final bench refresh ==="
timeout 3600 python bench.py 2>&1 | tee /tmp/bench_final.log

echo "=== STAGE2 ALL DONE ==="
