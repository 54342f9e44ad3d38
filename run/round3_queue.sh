#!/bin/bash
# Round-3 TPU work queue: waits for the conformer_long 20k run (foreground
# trainer owns the chip), then executes the remaining hardware items from
# VERDICT r2 in sequence:
#   1. operating-point evals of the best conformer checkpoint
#      (float / int8 / LM-rescored / LM-in-beam)            [#8, #10]
#   2. 90-class float-vs-int8 CER comparison                 [#8]
#   3. multi-width training recipe, per-bucket CER           [#7]
# Each step is timeout-bounded; results land under output/ and /tmp.
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
    --predictions-out /tmp/opeval_float.json

echo "=== 1b INT8 eval ==="
timeout 2400 python -m htr_vt_tpu.cli.test "${FLAGS[@]}" --checkpoint $CKPT \
    --quant int8 --predictions-out /tmp/opeval_int8.json

echo "=== 1c train char 5-gram ARPA from the SYNTH train corpus ==="
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

echo "=== 1d LM-rescored eval (proper prefix beam + char 5-gram) ==="
timeout 2400 python -m htr_vt_tpu.cli.test_with_lm "${FLAGS[@]}" --checkpoint $CKPT \
    --arpa /tmp/conformer_synth_char5.arpa --proper-beam --char-lm \
    --results-out /tmp/opeval_lm.json

echo "=== 1e LM-in-beam eval (fused char-LM decoding) ==="
timeout 2400 python -m htr_vt_tpu.cli.test_with_lm "${FLAGS[@]}" --checkpoint $CKPT \
    --arpa /tmp/conformer_synth_char5.arpa --proper-beam --char-lm --lm-in-beam \
    --results-out /tmp/opeval_lm_inbeam.json

echo "=== 2 90-class float-vs-int8 (read90) ==="
timeout 7200 python tools/read90_int8.py --iters 3000 --bs 64

echo "=== 3 multi-width training recipe ==="
timeout 10800 python tools/train_multiwidth.py --iters 6000 --bs 64 \
    --widths 512,1024 --out output/multiwidth

echo "=== ALL DONE ==="
