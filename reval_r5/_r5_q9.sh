#!/bin/bash
# Round-5 TPU queue 9 — 16M-edge ceiling re-scorecard with the per-mode
# scanned layout ((64,256) bf16). r3 scorecard at TD=128: 2314 ms/step
# (16 segments, 1.2M nodes denser config: 2348 ms @ 13.63M msg/s).
cd /root/repo
export PYTHONPATH=/root/repo:$PYTHONPATH
LOG=reval_r5/q9.log
run() {
  echo "=== $* ===" >> $LOG
  timeout 5400 "$@" >> $LOG 2>&1
  echo "rc=$?" >> $LOG
}
run python scripts/tpu_scale_check.py --edges 16000000 --nodes 1200000 --scan-segments 16 --kernel-precision default
echo "queue9 done" >> $LOG
