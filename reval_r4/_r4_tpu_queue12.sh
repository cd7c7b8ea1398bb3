#!/bin/bash
# Final confirmations: fwd attribution, then the two auto-tuned bench
# runs exactly as the driver will invoke them.
cd /root/repo
export PYTHONPATH=/root/repo:$PYTHONPATH
LOG=reval_r4/queue12.log
WAIT_PID=${1:-}
if [ -n "$WAIT_PID" ]; then
  while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 20; done
fi
run() {
  echo "=== $* ===" >> $LOG
  timeout 3000 "$@" >> $LOG 2>&1
  echo "rc=$?" >> $LOG
}
run python scripts/tpu_bwd_profile.py --precision default --td 128 --te 1536 --forward
run python bench.py
run python bench.py --kernel-precision default
echo "queue12 done" >> $LOG
