#!/bin/bash
# Round-3 (continuation session) hardware queue. Runs after the
# conformer_long 20k trainer frees the chip; ordered by evidence value:
#   1. operating-point evals of conformer_long best ckpt
#      (float / int8 / LM-rescored / LM-in-beam)          [VERDICT #8/#10]
#   2. XLA compiler-flag sweep over bench.py              [VERDICT #2 close-out]
#   3. bn_stats Pallas kernel A/B on the train step       [VERDICT #2]
#   4. 90-class float-vs-int8 CER comparison              [VERDICT #8]
#   5. serve selftest with DOWN-buckets (256,512): real-width workload
#      throughput + per-bucket CER, float + int8          [serving perf]
#   6. multi-width training recipe (512/1024), per-bucket CER [VERDICT #7]
#   7. flash-attention A/B at width-bucket shapes
#   8. bundle-vs-live serving tax + export + HTTP server smoke on the
#      trained conformer checkpoint
#   9. final bench.py refresh
set -x
cd /root/repo
WAIT_PID=${1:-}
if [ -n "$WAIT_PID" ]; then
  echo "waiting for training pid $WAIT_PID ..."
  while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 60; done
  echo "pid $WAIT_PID exited; chip is free"
  sleep 10
fi

CKPT=/root/repo/output/conformer_long/best_CER
FLAGS=(SYNTH --encoder conformer --mask-mode mms --mask-ratio 0.3 --sgm-enable
       --synth-alphabet "abcdefghijklmnopqrstuvwxyz '"
       --synth-train-size 4096 --synth-eval-size 512
       --exp-name conformer_long --split test)

echo "=== 1a FLOAT eval ==="
timeout 2400 python -m htr_vt_tpu.cli.test "${FLAGS[@]}" --checkpoint $CKPT \
    --predictions-out /tmp/opeval_float.json 2>&1 | tail -5

echo "=== 1b INT8 eval ==="
timeout 2400 python -m htr_vt_tpu.cli.test "${FLAGS[@]}" --checkpoint $CKPT \
    --quant int8 --predictions-out /tmp/opeval_int8.json 2>&1 | tail -5

echo "=== 1c train char 5-gram ARPA ==="
timeout 1200 python - <<'EOF'
from htr_vt_tpu.cli.args import args_to_config, build_parser
from htr_vt_tpu.data.loader import build_dataset
from htr_vt_tpu.decode.lm_train import train_ngram_arpa, chars_for_lm
import sys
sys.argv = ["x", "SYNTH", "--synth-alphabet", "abcdefghijklmnopqrstuvwxyz '",
            "--synth-train-size", "4096", "--synth-eval-size", "512"]
p = build_parser("arpa")
cfg = args_to_config(p.parse_args())
ds = build_dataset(cfg.data, "train")
texts = [chars_for_lm(t) for t in ds.labels]
train_ngram_arpa(texts, "/tmp/conformer_synth_char5.arpa", order=5, level="word")
print("arpa written:", len(texts), "lines")
EOF

echo "=== 1d LM-rescored eval ==="
timeout 2400 python -m htr_vt_tpu.cli.test_with_lm "${FLAGS[@]}" --checkpoint $CKPT \
    --arpa /tmp/conformer_synth_char5.arpa --proper-beam --char-lm \
    --results-out /tmp/opeval_lm.json 2>&1 | tail -5

echo "=== 1e LM-in-beam eval ==="
timeout 2400 python -m htr_vt_tpu.cli.test_with_lm "${FLAGS[@]}" --checkpoint $CKPT \
    --arpa /tmp/conformer_synth_char5.arpa --proper-beam --char-lm --lm-in-beam \
    --results-out /tmp/opeval_lm_inbeam.json 2>&1 | tail -5

echo "=== 2 XLA flag sweep ==="
timeout 9000 python tools/sweep_xla_flags.py 2>&1 | tee /tmp/sweep_xla.log | tail -15

echo "=== 3 bn_stats Pallas A/B ==="
timeout 3000 python bench.py 2>&1 | tail -2 | tee /tmp/bench_bnstats_xla.log
timeout 3000 env HTRVT_BN_STATS_IMPL=pallas python bench.py 2>&1 | tail -2 | tee /tmp/bench_bnstats_pallas.log

echo "=== 4 90-class float-vs-int8 (read90) ==="
timeout 7200 python tools/read90_int8.py --iters 3000 --bs 64 2>&1 | tail -10

echo "=== 5 serve selftest with down-buckets (float, then int8) ==="
timeout 2400 python -m htr_vt_tpu.cli.serve SYNTH --encoder conformer --sgm-enable \
    --synth-alphabet "abcdefghijklmnopqrstuvwxyz '" \
    --synth-train-size 4096 --synth-eval-size 512 \
    --checkpoint $CKPT --width-buckets 256,512 --selftest --selftest-n 64 \
    --out /tmp/serve_downbucket.jsonl 2>&1 | tail -8
timeout 2400 python -m htr_vt_tpu.cli.serve SYNTH --encoder conformer --sgm-enable \
    --synth-alphabet "abcdefghijklmnopqrstuvwxyz '" \
    --synth-train-size 4096 --synth-eval-size 512 \
    --checkpoint $CKPT --width-buckets 256,512 --selftest --selftest-n 64 \
    --quant int8 --out /tmp/serve_downbucket_int8.jsonl 2>&1 | tail -8

echo "=== 6 multi-width training recipe ==="
timeout 10800 python tools/train_multiwidth.py --iters 6000 --bs 64 \
    --widths 512,1024 --out output/multiwidth 2>&1 | tail -15

echo "=== 7 flash-attention A/B ==="
timeout 3600 python tools/bench_attn.py --bs 128 2>&1 | tee /tmp/bench_attn.log | tail -15

echo "=== 8 bundle tax + export + HTTP server smoke ==="
timeout 3600 python tools/bench_bundle.py 2>&1 | tee /tmp/bench_bundle.log | tail -10
timeout 3600 python -m htr_vt_tpu.cli.export SYNTH \
    --encoder conformer --sgm-enable \
    --synth-alphabet "abcdefghijklmnopqrstuvwxyz '" \
    --synth-train-size 4096 --synth-eval-size 512 \
    --checkpoint $CKPT \
    --out output/conformer_long/bundle --batch-size 64 \
    --quant int8 --platforms tpu --verify 2>&1 | tail -8

echo "=== 9 final bench refresh ==="
timeout 3000 python bench.py 2>&1 | tail -2 | tee /tmp/bench_final.log

echo "=== QUEUE4 ALL DONE ==="
