#!/bin/bash
# Round-5 TPU queue 7 — TD=192 probe. bf16 (128,1536) sits at the
# one-chunk-per-block skeleton floor (782 grid steps); TD=256 failed both
# ways in r4 (scoped-VMEM OOM at TE=3072; 45-min Mosaic compile + 6%
# SLOWER at TE=1536 — the [256, TE] one-hot masks blow up scheduling).
# TD=192 is the untested midpoint: -33% blocks vs 128. Bounded probes;
# if the compile pathology reappears, timeout 3600 bounds the loss.
cd /root/repo
export PYTHONPATH=/root/repo:$PYTHONPATH
LOG=reval_r5/q7.log
run() {
  echo "=== $* ===" >> $LOG
  timeout 3600 "$@" >> $LOG 2>&1
  echo "rc=$?" >> $LOG
}
run python bench.py --kernel-precision default --td 192 --te 1536
run python bench.py --kernel-precision highest --td 192 --te 256
echo "queue7 done" >> $LOG
