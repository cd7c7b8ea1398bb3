#!/bin/bash
# Round-5 TPU queue 3 — scanned-layout degree sweep (VERDICT r4 #8).
#
# SCANNED_LAYOUT=(128,256) is a constant while the unscanned optimum
# demonstrably shifts with degree statistics; the r3 evidence for TE=256
# came from uniform graphs only (8M/16M-edge configs). Sweep TE per graph
# class at the 4M-edge / 4-segment scale, default (bf16) mode — the mode
# scanned configs actually run in: within-class rankings tell whether the
# scanned layout needs to be degree-aware.
cd /root/repo
export PYTHONPATH=/root/repo:$PYTHONPATH
LOG=reval_r5/q3.log
while ! grep -q "queue2 done" reval_r5/q2.log 2>/dev/null; do sleep 30; done
run() {
  echo "=== $* ===" >> $LOG
  timeout 3600 "$@" >> $LOG 2>&1
  echo "rc=$?" >> $LOG
}
SC="python scripts/tpu_scale_check.py --edges 4000000 --nodes 400000 --scan-segments 4 --kernel-precision default"
run $SC --te 256
run $SC --te 128
run $SC --te 384
run $SC --te 256 --skew 1.0
run $SC --te 128 --skew 1.0
run $SC --te 384 --skew 1.0
run $SC --te 256 --clustered
run $SC --te 128 --clustered
run $SC --te 384 --clustered
run $SC --te 256 --td 64
echo "queue3 done" >> $LOG
