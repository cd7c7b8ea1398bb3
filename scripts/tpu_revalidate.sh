#!/bin/bash
# One-shot on-chip revalidation queue (VERDICT r2 next-1): run the moment
# the TPU relay returns, in dependency order, logging everything. Never
# run two TPU processes concurrently; each step runs under a generous
# timeout (first compiles go through the remote relay: minutes each).
#
# Usage: bash scripts/tpu_revalidate.sh [outdir]   (default reval_r3/)
set -u
OUT=${1:-reval_r3}
mkdir -p "$OUT"
cd "$(dirname "$0")/.."

run() { # name timeout cmd...
  local name=$1 to=$2; shift 2
  echo "=== $name: $* (timeout ${to}s)" | tee -a "$OUT/summary.log"
  local t0=$SECONDS
  timeout "$to" "$@" > "$OUT/$name.log" 2>&1
  local rc=$?
  echo "=== $name rc=$rc ($((SECONDS - t0))s)" | tee -a "$OUT/summary.log"
  tail -3 "$OUT/$name.log" | tee -a "$OUT/summary.log"
  return $rc
}

# 1. Kernel validation at HEAD (the outage-era commits dc1326a..6f3f0c9
#    landed with interpret-mode checks only): fwd + grads vs XLA, both
#    precision tiers, dropout 0.0 and 0.3 (the check runs both).
run kernel_check_highest 2400 env PYTHONPATH=.:/root/.axon_site python scripts/tpu_kernel_check.py
run kernel_check_default 2400 env PYTHONPATH=.:/root/.axon_site python scripts/tpu_kernel_check.py --precision default

# 2. Driver-comparable benchmark numbers (the r2 headline has no
#    driver-captured record).
run bench_full    3600 python bench.py
run bench_small   2400 python bench.py --small
run bench_default 3600 python bench.py --kernel-precision default

# 3. Memory-floor probe (VERDICT r2 next-8): 16M edges @ 1.6M nodes in
#    default mode — the bf16-pair packed stream halves the backward's
#    largest node-sized array (round-2 OOM'd here by 310 MB).
run scale_16m 3600 env PYTHONPATH=.:/root/.axon_site python scripts/tpu_scale_check.py \
    --edges 16000000 --nodes 1600000 --scan-segments 16 \
    --kernel-precision default --steps 4

echo "=== revalidation complete; see $OUT/" | tee -a "$OUT/summary.log"
