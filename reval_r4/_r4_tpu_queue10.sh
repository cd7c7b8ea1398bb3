#!/bin/bash
# Re-probe TD=256/TE=3072 with the TD*TE envelope term (the kernels now
# auto-raise vmem_limit_bytes to ~33M for this layout).
cd /root/repo
export PYTHONPATH=/root/repo:$PYTHONPATH
LOG=reval_r4/queue10.log
WAIT_PID=${1:-}
if [ -n "$WAIT_PID" ]; then
  while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 30; done
fi
run() {
  echo "=== $* ===" >> $LOG
  timeout 3600 "$@" >> $LOG 2>&1
  echo "rc=$?" >> $LOG
}
run python bench.py --kernel-precision default --td 256 --te 3072
echo "queue10 done" >> $LOG
