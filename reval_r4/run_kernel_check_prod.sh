#!/bin/bash
# On-chip kernel validation at the reference's production tile shapes
# (VERDICT r3 next-4): doc-scale H=16/F=200 (H*F=3200) and launcher-small
# H=16/F=128 (H*F=2048), both precision tiers at their production layouts.
cd /root/repo
for shape in "16 200" "16 128"; do
  set -- $shape
  H=$1; F=$2
  echo "=== H=$H F=$F highest TD=128/TE=256 ==="
  timeout 3600 env PYTHONPATH=.:$PYTHONPATH python scripts/tpu_kernel_check.py --edges 200000 --nodes 20000 \
    --rel 45 --heads $H --feat $F --precision highest --td 128 --te 256
  echo "rc=$?"
  echo "=== H=$H F=$F default TD=64/TE=768 ==="
  timeout 3600 env PYTHONPATH=.:$PYTHONPATH python scripts/tpu_kernel_check.py --edges 200000 --nodes 20000 \
    --rel 45 --heads $H --feat $F --precision default --td 64 --te 768
  echo "rc=$?"
done
