#!/bin/bash
# Follow-up to the round-3 revalidation run: wait for the main queue's
# driver (single TPU process rule), then run the kernel checks that failed
# on a missing PYTHONPATH.
set -u
OUT=${1:-reval_r3}
cd "$(dirname "$0")/.."
# Wait for the main revalidate driver to finish (it appends "complete").
while ! grep -q "revalidation complete" "$OUT/summary.log" 2>/dev/null; do
  sleep 30
done
run() {
  local name=$1 to=$2; shift 2
  echo "=== $name: $* (timeout ${to}s)" | tee -a "$OUT/summary.log"
  local t0=$SECONDS
  timeout "$to" "$@" > "$OUT/$name.log" 2>&1
  local rc=$?
  echo "=== $name rc=$rc ($((SECONDS - t0))s)" | tee -a "$OUT/summary.log"
  tail -3 "$OUT/$name.log" | tee -a "$OUT/summary.log"
}
run kernel_check_highest 2400 env PYTHONPATH=.:/root/.axon_site python scripts/tpu_kernel_check.py
run kernel_check_default 2400 env PYTHONPATH=.:/root/.axon_site python scripts/tpu_kernel_check.py --precision default
echo "=== follow-up complete" | tee -a "$OUT/summary.log"
