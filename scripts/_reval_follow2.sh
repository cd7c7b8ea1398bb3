#!/bin/bash
# Round-3 queue #2: kernel checks with the corrected PYTHONPATH (the axon
# sitecustomize dir must stay on it), the 16M memory probe, then the
# backward/forward kernel-attribution profiles.
set -u
OUT=${1:-reval_r3}
cd "$(dirname "$0")/.."
run() {
  local name=$1 to=$2; shift 2
  echo "=== $name: $* (timeout ${to}s)" | tee -a "$OUT/summary.log"
  local t0=$SECONDS
  timeout "$to" "$@" > "$OUT/$name.log" 2>&1
  local rc=$?
  echo "=== $name rc=$rc ($((SECONDS - t0))s)" | tee -a "$OUT/summary.log"
  tail -3 "$OUT/$name.log" | tee -a "$OUT/summary.log"
}
P=.:/root/.axon_site
run kernel_check_highest 2400 env PYTHONPATH=$P python scripts/tpu_kernel_check.py
run kernel_check_default 2400 env PYTHONPATH=$P python scripts/tpu_kernel_check.py --precision default
run scale_16m 3600 env PYTHONPATH=$P python scripts/tpu_scale_check.py \
    --edges 16000000 --nodes 1600000 --scan-segments 16 \
    --kernel-precision default --steps 4
run bwd_profile 5400 env PYTHONPATH=$P python scripts/tpu_bwd_profile.py
run fwd_profile 3600 env PYTHONPATH=$P python scripts/tpu_bwd_profile.py --forward
echo "=== queue2 complete" | tee -a "$OUT/summary.log"
