#!/bin/bash
# Round-3 master revalidation queue (fresh session). Single TPU process at
# a time; everything logged under reval_r3/. Order = value: validate HEAD
# kernels, then driver-comparable bench numbers, then memory probe, then
# kernel-attribution profiles.
set -u
OUT=${1:-reval_r3}
mkdir -p "$OUT"
cd "$(dirname "$0")/.."

run() { # name timeout cmd...
  local name=$1 to=$2; shift 2
  echo "=== $name: $* (timeout ${to}s) start=$(date +%H:%M:%S)" | tee -a "$OUT/summary.log"
  local t0=$SECONDS
  timeout "$to" "$@" > "$OUT/$name.log" 2>&1
  local rc=$?
  echo "=== $name rc=$rc ($((SECONDS - t0))s)" | tee -a "$OUT/summary.log"
  tail -4 "$OUT/$name.log" | tee -a "$OUT/summary.log"
  return $rc
}

P=.:/root/.axon_site
run kernel_check_highest 2700 env PYTHONPATH=$P python scripts/tpu_kernel_check.py
run bench_full    3600 python bench.py
run kernel_check_default 2700 env PYTHONPATH=$P python scripts/tpu_kernel_check.py --precision default
run bench_default 3600 python bench.py --kernel-precision default
run bench_small   2400 python bench.py --small
run scale_16m 3600 env PYTHONPATH=$P python scripts/tpu_scale_check.py \
    --edges 16000000 --nodes 1600000 --scan-segments 16 \
    --kernel-precision default --steps 4
run bwd_profile 5400 env PYTHONPATH=$P python scripts/tpu_bwd_profile.py
run fwd_profile 3600 env PYTHONPATH=$P python scripts/tpu_bwd_profile.py --forward
echo "=== r3 queue complete $(date +%H:%M:%S)" | tee -a "$OUT/summary.log"
