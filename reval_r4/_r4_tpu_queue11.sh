#!/bin/bash
# Final round-4 TPU sequence: validate the new production default layout
# (128,1536) on chip, record the auto-tuned bench, then the bf16
# knockout attribution; the TD=256 re-probe goes last (risk: Mosaic
# compile pathology at [256, TE] one-hot shapes — (256,1536) burned its
# whole 1h timeout in remote compile).
cd /root/repo
export PYTHONPATH=/root/repo:$PYTHONPATH
LOG=reval_r4/queue11.log
WAIT_PID=${1:-}
if [ -n "$WAIT_PID" ]; then
  while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 30; done
fi
run() {
  echo "=== $* ===" >> $LOG
  timeout ${T:-3600} "$@" >> $LOG 2>&1
  echo "rc=$?" >> $LOG
}
run python scripts/tpu_kernel_check.py --edges 200000 --nodes 20000 \
  --rel 12 --heads 4 --feat 64 --precision default --td 128 --te 1536
run python bench.py --kernel-precision default
run python scripts/tpu_bwd_profile.py --precision default --td 128 --te 1536
run python scripts/tpu_bwd_profile.py --precision default --td 128 --te 1536 --forward
T=2400 run python bench.py --kernel-precision default --td 256 --te 3072
echo "queue11 done" >> $LOG
