#!/bin/bash
# Encoder-decoder training (reference run/train_encoder_decoder_iam.sh; the
# reference's trainer is missing upstream — this framework completes it).
python -m htr_vt_tpu.cli.train IAM --exp-name iam_ed \
  --model-type encoder_decoder --decoder-layers 6 --decoder-heads 8 \
  --max-seq-len 256 --label-smoothing 0.1 \
  --max-lr 1e-3 --train-bs 128 --val-bs 8 --weight-decay 0.5 \
  --img-size 512 64 --total-iter 100000 "$@"
