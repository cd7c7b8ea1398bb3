#!/bin/bash
# Round-4 TPU queue v6 (after the rehearsal): close the loop on the two
# layouts newly reachable by the auto-tuner but not yet numerics-checked
# at HEAD: fp32 TD=128/TE=512 (the bench fp32 pick) at standard shapes,
# and bf16 TD=128/TE=256 at the prod tile (the scanned-path layout at
# H*F=3200, needs the raised vmem limit).
cd /root/repo
export PYTHONPATH=/root/repo:$PYTHONPATH
LOG=reval_r4/queue6.log
WAIT_PID=${1:-}
if [ -n "$WAIT_PID" ]; then
  while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 30; done
fi

run() {
  echo "=== $* ===" >> $LOG
  timeout 3600 "$@" >> $LOG 2>&1
  echo "rc=$?" >> $LOG
}

run python scripts/tpu_kernel_check.py --edges 200000 --nodes 20000 \
  --rel 12 --heads 4 --feat 64 --precision highest --td 128 --te 512
run python scripts/tpu_kernel_check.py --edges 60000 --nodes 8000 \
  --rel 45 --heads 16 --feat 200 --precision default --td 128 --te 256
echo "queue6 done" >> $LOG
