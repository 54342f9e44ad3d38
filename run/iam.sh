#!/bin/bash
# Reference IAM recipe (run/iam.sh) on the TPU framework.
python -m htr_vt_tpu.cli.train IAM --exp-name iam \
  --max-lr 1e-3 --train-bs 128 --val-bs 8 --weight-decay 0.5 \
  --mask-ratio 0.4 --max-span-length 8 --img-size 512 64 \
  --proj 8 --dila-ero-max-kernel 2 --dila-ero-iter 1 --proba 0.5 \
  --total-iter 100000 "$@"

python -m htr_vt_tpu.cli.test IAM --exp-name iam --img-size 512 64 \
  --checkpoint output/iam/best_CER "$@"
