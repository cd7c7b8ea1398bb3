#!/bin/bash
# Round-4 TPU queue v2 (ONE TPU process at a time):
# 1. wait for the in-flight old-code kernel check
# 2. kernel checks of the NEW dense [N,128] stats layout at the bench
#    tile's production layouts (interpret mode cannot catch Mosaic
#    miscompiles — CLAUDE.md)
# 3. production-tile (H*F=3200) checks at the tuner's VMEM-feasible
#    layouts (bench-class layouts Mosaic-OOM there)
# 4. bench both modes (stats-store fix: default-mode target >= 40M msg/s)
# 5. layout auto-tuner on-chip validation sweep
cd /root/repo
WAIT_PID=${1:-}
if [ -n "$WAIT_PID" ]; then
  while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 20; done
fi
export PYTHONPATH=/root/repo:$PYTHONPATH

{
  echo "=== NEW-STATS H=4 F=64 highest TD=128 TE=256 ==="
  timeout 3600 python scripts/tpu_kernel_check.py --edges 200000 \
    --nodes 20000 --rel 12 --heads 4 --feat 64 --precision highest \
    --td 128 --te 256
  echo "rc=$?"
  echo "=== NEW-STATS H=4 F=64 default TD=64 TE=768 ==="
  timeout 3600 python scripts/tpu_kernel_check.py --edges 200000 \
    --nodes 20000 --rel 12 --heads 4 --feat 64 --precision default \
    --td 64 --te 768
  echo "rc=$?"
} >> reval_r4/kernel_check_stats2d.log 2>&1

{
  echo "=== H=16 F=200 highest TD=128 TE=128 (tuner-feasible) ==="
  timeout 3600 python scripts/tpu_kernel_check.py --edges 200000 \
    --nodes 20000 --rel 45 --heads 16 --feat 200 --precision highest \
    --td 128 --te 128
  echo "rc=$?"
  echo "=== H=16 F=200 default TD=64 TE=256 (tuner-feasible) ==="
  timeout 3600 python scripts/tpu_kernel_check.py --edges 200000 \
    --nodes 20000 --rel 45 --heads 16 --feat 200 --precision default \
    --td 64 --te 256
  echo "rc=$?"
} >> reval_r4/kernel_check_prod_feasible.log 2>&1

{
  echo "=== bench default (new stats layout) ==="
  timeout 5400 python bench.py --kernel-precision default
  echo "rc=$?"
  echo "=== bench highest ==="
  timeout 5400 python bench.py
  echo "rc=$?"
} >> reval_r4/bench_stats2d.log 2>&1

timeout 18000 python scripts/tpu_layout_sweep.py \
  >> reval_r4/layout_sweep.log 2>&1
echo "queue2 done rc=$?" >> reval_r4/layout_sweep.log
