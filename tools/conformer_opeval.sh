#!/bin/bash
# Operating-point evals for the conformer_long best checkpoint (VERDICT r2 #8/#10),
# then resume training 14k -> 20k with the original 20k cosine schedule.
set -x
cd /root/repo
CKPT=/root/repo/output/conformer_long/best_CER
FLAGS=(SYNTH --encoder conformer --mask-mode mms --mask-ratio 0.3 --sgm-enable
       --synth-alphabet "abcdefghijklmnopqrstuvwxyz '"
       --synth-train-size 4096 --synth-eval-size 512
       --exp-name conformer_long --split test)

echo "=== FLOAT eval ==="
timeout 2400 python -m htr_vt_tpu.cli.test "${FLAGS[@]}" --checkpoint $CKPT \
    --predictions-out /tmp/opeval_float.json

echo "=== INT8 eval ==="
timeout 2400 python -m htr_vt_tpu.cli.test "${FLAGS[@]}" --checkpoint $CKPT \
    --quant int8 --predictions-out /tmp/opeval_int8.json

echo "=== Train char 5-gram ARPA from the SYNTH train corpus ==="
python - <<'EOF'
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

echo "=== LM-rescored eval (proper prefix beam + char 5-gram) ==="
timeout 2400 python -m htr_vt_tpu.cli.test_with_lm "${FLAGS[@]}" --checkpoint $CKPT \
    --arpa /tmp/conformer_synth_char5.arpa --proper-beam --char-lm \
    --results-out /tmp/opeval_lm.json

echo "=== LM-in-beam eval (fused char-LM decoding) ==="
timeout 2400 python -m htr_vt_tpu.cli.test_with_lm "${FLAGS[@]}" --checkpoint $CKPT \
    --arpa /tmp/conformer_synth_char5.arpa --proper-beam --char-lm --lm-in-beam \
    --results-out /tmp/opeval_lm_inbeam.json

echo "=== Resume conformer_long 14000 -> 20000 ==="
timeout 21600 python -m htr_vt_tpu.cli.train SYNTH --encoder conformer \
    --mask-mode mms --mask-ratio 0.3 --sgm-enable --tri-masked \
    --synth-alphabet "abcdefghijklmnopqrstuvwxyz '" \
    --synth-train-size 4096 --synth-eval-size 512 \
    --train-bs 64 --val-bs 64 --max-lr 1e-3 --weight-decay 0.5 \
    --total-iter 20000 --warm-up-iter 1000 --eval-iter 1000 --print-iter 200 \
    --seed 123 --exp-name conformer_long --resume auto
echo "=== ALL DONE ==="
