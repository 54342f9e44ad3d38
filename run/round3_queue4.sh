#!/bin/bash
# Round-3 TPU queue, stage 4 (fifth session). Waits for queue3 (zoo sweep),
# then:
#   1. the three 512/1024/2048 serve selftests that queue3 fumbled (missing
#      SYNTH dataset positional -> serve tried to read IAM labels)
#   2. conformer multi-width run: the accuracy-flagship block family on the
#      3-bucket width recipe
#   3. serve selftest + bench refresh on that checkpoint
set -x
cd /root/repo
WAIT_PID=${1:-}
if [ -n "$WAIT_PID" ]; then
  while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 60; done
  echo "queue3 (pid $WAIT_PID) done; chip is free"
  sleep 10
fi

CKPT=/root/repo/output/multiwidth3/best_CER
echo "=== 1a serve selftest: full ramp to 108 chars, 3 buckets, float ==="
timeout 2400 python -m htr_vt_tpu.cli.serve SYNTH --checkpoint $CKPT \
    --selftest --selftest-n 64 --selftest-max-chars 108 \
    --width-buckets 512,1024,2048 \
    --out /tmp/serve3_fullramp_float.json 2>&1 | tail -20
echo "=== 1b same, int8 ==="
timeout 2400 python -m htr_vt_tpu.cli.serve SYNTH --checkpoint $CKPT \
    --selftest --selftest-n 64 --selftest-max-chars 108 \
    --width-buckets 512,1024,2048 --quant int8 \
    --out /tmp/serve3_fullramp_int8.json 2>&1 | tail -20
echo "=== 1c control: same workload capped at 1024 (old recipe's ceiling) ==="
timeout 2400 python -m htr_vt_tpu.cli.serve SYNTH --checkpoint $CKPT \
    --selftest --selftest-n 64 --selftest-max-chars 108 \
    --width-buckets 512,1024 \
    --out /tmp/serve3_fullramp_1024cap.json 2>&1 | tail -20

echo "=== 2 conformer multi-width run ==="
timeout 16200 python tools/train_multiwidth.py --iters 6000 --bs 32 \
    --widths 512,1024,2048 --encoder conformer --eval-every 1000 \
    --out output/multiwidth_conf

echo "=== 3 serve selftest on the conformer multi-width checkpoint ==="
timeout 2400 python -m htr_vt_tpu.cli.serve SYNTH \
    --checkpoint output/multiwidth_conf/best_CER --encoder conformer \
    --selftest --selftest-n 64 --selftest-max-chars 108 \
    --width-buckets 512,1024,2048 \
    --out /tmp/serve3_conf_float.json 2>&1 | tail -20

echo "=== 4 bench refresh ==="
timeout 1200 python bench.py > /tmp/bench_final_q4.json 2>/tmp/bench_final_q4.err

echo "=== QUEUE4 DONE ==="
