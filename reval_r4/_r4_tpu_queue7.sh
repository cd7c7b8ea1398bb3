#!/bin/bash
# bf16 layout re-probe after the is_last-gated forward store: TD=128
# variants get cheaper (fewer per-chunk out stores), and the sweep's
# uniform-graph winner was (128,1536).
cd /root/repo
export PYTHONPATH=/root/repo:$PYTHONPATH
LOG=reval_r4/queue7.log
WAIT_PID=${1:-}
if [ -n "$WAIT_PID" ]; then
  while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 30; done
fi
run() {
  echo "=== $* ===" >> $LOG
  timeout 3600 "$@" >> $LOG 2>&1
  echo "rc=$?" >> $LOG
}
run python bench.py --kernel-precision default --td 128 --te 1536
run python bench.py --kernel-precision default --td 128 --te 768
echo "queue7 done" >> $LOG
