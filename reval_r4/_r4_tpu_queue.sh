#!/bin/bash
# Round-4 TPU job queue (ONE TPU process at a time):
# 1. wait for the in-flight kernel check (pid arg)
# 2. production-tile kernel checks at the tuner's VMEM-feasible layouts
#    (the bench-class layouts Mosaic-OOM at H*F=3200 — see
#    kernel_check_prod.log; the tuner now filters those)
# 3. layout auto-tuner on-chip validation sweep
cd /root/repo
WAIT_PID=${1:-}
if [ -n "$WAIT_PID" ]; then
  while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 20; done
fi

{
  echo "=== H=16 F=200 highest TD=128 TE=128 (tuner-feasible) ==="
  timeout 3600 env PYTHONPATH=.:$PYTHONPATH python scripts/tpu_kernel_check.py \
    --edges 200000 --nodes 20000 --rel 45 --heads 16 --feat 200 \
    --precision highest --td 128 --te 128
  echo "rc=$?"
  echo "=== H=16 F=200 default TD=64 TE=256 (tuner-feasible) ==="
  timeout 3600 env PYTHONPATH=.:$PYTHONPATH python scripts/tpu_kernel_check.py \
    --edges 200000 --nodes 20000 --rel 45 --heads 16 --feat 200 \
    --precision default --td 64 --te 256
  echo "rc=$?"
} >> reval_r4/kernel_check_prod_feasible.log 2>&1

timeout 18000 env PYTHONPATH=.:$PYTHONPATH python scripts/tpu_layout_sweep.py \
  >> reval_r4/layout_sweep.log 2>&1
echo "queue done rc=$?" >> reval_r4/layout_sweep.log
