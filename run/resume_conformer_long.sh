#!/bin/bash
# Babysat resume of the conformer_long 20k run: stream-exact auto-resume
# restarts the trainer if the TPU tunnel drops, until 20k iters complete.
cd /root/repo
for attempt in 1 2 3 4 5 6; do
  nohup python -m htr_vt_tpu.cli.train SYNTH --encoder conformer \
    --mask-mode mms --mask-ratio 0.3 --tri-masked --sgm-enable \
    --synth-alphabet "abcdefghijklmnopqrstuvwxyz '" \
    --synth-train-size 4096 --synth-eval-size 512 \
    --train-bs 64 --val-bs 8 --total-iter 20000 --eval-iter 1000 \
    --exp-name conformer_long --resume auto \
    >> /tmp/conformer_long.log 2>&1 &
  TPID=$!
  echo $TPID > /tmp/train.pid
  echo "attempt $attempt: trainer pid $TPID"
  wait $TPID
  rc=$?
  if grep -q "Iter : 20000" output/conformer_long/run.log 2>/dev/null || \
     ls output/conformer_long | grep -q "_20000$"; then
    echo "run complete (rc=$rc)"; exit 0
  fi
  echo "trainer exited rc=$rc before completion (attempt $attempt); resuming"
  sleep 20
done
echo "giving up after 6 attempts"
exit 1
