#!/bin/bash
# Round-4 TPU queue v5 (after queue4):
# 1. validate the is_last-gated forward store on chip at both production
#    bench layouts (every kernel change needs a real-TPU check),
# 2. prod-tile (H*F=3200) checks at 60k edges — small enough that the
#    XLA-oracle BACKWARD fits in HBM (queue4's 200k-edge configs ran the
#    Pallas side fine and then RESOURCE_EXHAUSTED inside the oracle),
# 3. the doc-scale CLI rehearsal (gated on 1+2),
# 4. bench in both modes at the deeper production dispatch (32 steps/call).
cd /root/repo
export PYTHONPATH=/root/repo:$PYTHONPATH
LOG=reval_r4/queue5.log
WAIT_PID=${1:-}
if [ -n "$WAIT_PID" ]; then
  while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 30; done
fi

run() {
  echo "=== $* ===" >> $LOG
  timeout 3600 "$@" >> $LOG 2>&1
  rc=$?
  echo "rc=$rc" >> $LOG
  return $rc
}

# 1. is_last change, standard shapes, both tiers at production layouts.
run python scripts/tpu_kernel_check.py --edges 200000 --nodes 20000 \
  --rel 12 --heads 4 --feat 64 --precision default --td 64 --te 768
K1=$?
run python scripts/tpu_kernel_check.py --edges 200000 --nodes 20000 \
  --rel 12 --heads 4 --feat 64 --precision highest --td 128 --te 256
K2=$?

# 2. prod tile, oracle-sized graph.
run python scripts/tpu_kernel_check.py --edges 60000 --nodes 8000 \
  --rel 45 --heads 16 --feat 200 --precision default --td 64 --te 128
K3=$?
run python scripts/tpu_kernel_check.py --edges 60000 --nodes 8000 \
  --rel 45 --heads 16 --feat 200 --precision highest --td 128 --te 128
run python scripts/tpu_kernel_check.py --edges 60000 --nodes 8000 \
  --rel 45 --heads 16 --feat 200 --precision highest --td 128 --te 512

# 3. Doc-scale rehearsal (bf16 auto-tuned layout) if kernels are good.
if [ "$K1" = "0" ] && [ "$K2" = "0" ] && [ "$K3" = "0" ]; then
  echo "=== prod-shape rehearsal ===" >> $LOG
  bash reval_r4/_r4_tpu_queue3.sh
  echo "rehearsal chained rc=$?" >> $LOG
else
  echo "SKIP rehearsal: K1=$K1 K2=$K2 K3=$K3" >> $LOG
fi

# 4. Bench, production dispatch depth.
run python bench.py --kernel-precision default
run python bench.py
echo "queue5 done" >> $LOG
