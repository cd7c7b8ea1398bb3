#!/bin/bash
# Round-5 TPU queue 8 — end-of-round kernel revalidation at the
# production layouts (both precision tiers, dropout 0.0 and 0.3). The
# kernels are byte-identical to r4's validated state this round, but the
# default layouts changed ((128,1536) bf16 / (128,256) fp32 via the
# re-grounded anchors) — revalidate fwd + all grads vs the XLA baseline
# at exactly the layouts production now picks.
cd /root/repo
export PYTHONPATH=/root/repo:$PYTHONPATH
LOG=reval_r5/q8.log
run() {
  echo "=== $* ===" >> $LOG
  timeout 3600 "$@" >> $LOG 2>&1
  echo "rc=$?" >> $LOG
}
run python scripts/tpu_kernel_check.py --td 128 --te 256
run python scripts/tpu_kernel_check.py --precision default --td 128 --te 1536
echo "queue8 done" >> $LOG
