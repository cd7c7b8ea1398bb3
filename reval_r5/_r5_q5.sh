#!/bin/bash
# Round-5 TPU queue 5 — scanned TD=64 cross-checks + the FINAL
# driver-style bench runs (the last hardware runs of the round).
#
# q3 found TD=64/TE=256 beats the scanned default (128,256) by 4.3% on
# the uniform 4M/4-segment config; before changing SCANNED_LAYOUT the
# win must hold on the other graph classes (provenance rule: one probe,
# one class is not a ranking).
cd /root/repo
export PYTHONPATH=/root/repo:$PYTHONPATH
LOG=reval_r5/q5.log
while ! grep -q "queue4 done" reval_r5/q4.log 2>/dev/null; do sleep 30; done
run() {
  echo "=== $* ===" >> $LOG
  timeout 3600 "$@" >> $LOG 2>&1
  echo "rc=$?" >> $LOG
}
SC="python scripts/tpu_scale_check.py --edges 4000000 --nodes 400000 --scan-segments 4 --kernel-precision default"
run $SC --te 256 --td 64 --skew 1.0
run $SC --te 256 --td 64 --clustered
echo "queue5 scanned probes done" >> $LOG
