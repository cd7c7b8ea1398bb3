#!/bin/bash
# bf16-mode knockout attribution at the production layout (VERDICT r3
# next-3's fallback evidence): backward + forward op-level costs with the
# is_last/dense-stats kernels.
cd /root/repo
export PYTHONPATH=/root/repo:$PYTHONPATH
LOG=reval_r4/queue8.log
WAIT_PID=${1:-}
if [ -n "$WAIT_PID" ]; then
  while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 30; done
fi
run() {
  echo "=== $* ===" >> $LOG
  timeout 3600 "$@" >> $LOG 2>&1
  echo "rc=$?" >> $LOG
}
run python scripts/tpu_bwd_profile.py --precision default
run python scripts/tpu_bwd_profile.py --precision default --forward
echo "queue8 done" >> $LOG
