#!/bin/bash
python -m htr_vt_tpu.cli.test IAM --exp-name iam_ed \
  --model-type encoder_decoder --decoder-layers 6 --decoder-heads 8 \
  --max-seq-len 256 --img-size 512 64 \
  --checkpoint output/iam_ed/best_CER "$@"
