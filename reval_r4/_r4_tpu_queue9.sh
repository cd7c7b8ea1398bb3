#!/bin/bash
# bf16 probes past the TD=128 block floor: TD=256 halves the block count
# (and at TE=3072, the padded slots) — the grid-step floor is the block
# count once TE exceeds the typical per-block edge count.
cd /root/repo
export PYTHONPATH=/root/repo:$PYTHONPATH
LOG=reval_r4/queue9.log
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
run python bench.py --kernel-precision default --td 256 --te 1536
echo "queue9 done" >> $LOG
