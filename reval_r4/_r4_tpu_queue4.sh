#!/bin/bash
# Round-4 TPU queue v4: production-tile feasibility with the raised-VMEM
# path (ops/pallas/fused._compiler_params), then the doc-scale CLI
# rehearsal (VERDICT r3 next-4), gated on the bf16 prod-tile kernel
# check passing.
cd /root/repo
export PYTHONPATH=/root/repo:$PYTHONPATH
LOG=reval_r4/queue4.log

run() {
  echo "=== $* ===" >> $LOG
  timeout 3600 "$@" >> $LOG 2>&1
  rc=$?
  echo "rc=$rc" >> $LOG
  return $rc
}

# 1. bf16 prod tile at the tuner's stock-limit pick (TD=64/TE=128).
run python scripts/tpu_kernel_check.py --edges 200000 --nodes 20000 \
  --rel 45 --heads 16 --feat 200 --precision default --td 64 --te 128
BF16_RC=$?

# 2. fp32 prod tile, minimal layout, raised vmem (measured alloc 20.99M,
#    raised limit ~23.8M).
run python scripts/tpu_kernel_check.py --edges 200000 --nodes 20000 \
  --rel 45 --heads 16 --feat 200 --precision highest --td 128 --te 128

# 3. fp32 prod tile at the tuner's raised-tier pick (TD=128/TE=512,
#    envelope ~42.5M -> limit ~53M).
run python scripts/tpu_kernel_check.py --edges 200000 --nodes 20000 \
  --rel 45 --heads 16 --feat 200 --precision highest --td 128 --te 512

# 4. Doc-scale CLI rehearsal (only if the bf16 prod-tile kernels passed).
if [ "$BF16_RC" = "0" ]; then
  echo "=== prod-shape rehearsal ===" >> $LOG
  bash reval_r4/_r4_tpu_queue3.sh
  echo "rehearsal chained rc=$?" >> $LOG
else
  echo "SKIP rehearsal: bf16 prod kernel check rc=$BF16_RC" >> $LOG
fi
echo "queue4 done" >> $LOG
