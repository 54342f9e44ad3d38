#!/bin/bash
# Reference LAM recipe (run/lam.sh): same flags, nb_cls 90 via preset.
python -m htr_vt_tpu.cli.train LAM --exp-name lam \
  --max-lr 1e-3 --train-bs 128 --val-bs 8 --weight-decay 0.5 \
  --mask-ratio 0.4 --max-span-length 8 --img-size 512 64 \
  --proj 8 --dila-ero-max-kernel 2 --dila-ero-iter 1 --proba 0.5 \
  --total-iter 100000 "$@"
