#!/bin/bash
# Round-5 TPU queue 4 — bf16 full-step probes for the remaining anchor
# classes (zipf, dense). The propagate-only sweep's bf16 rankings proved
# unreliable on clustered (its 10% preference for (64,768) inverted on
# the full step); zipf and dense are the two classes whose bf16 anchors
# still rest on the propagate proxy.
cd /root/repo
export PYTHONPATH=/root/repo:$PYTHONPATH
LOG=reval_r5/q4.log
while ! grep -q "queue3 done" reval_r5/q3.log 2>/dev/null; do sleep 30; done
run() {
  echo "=== $* ===" >> $LOG
  timeout 3600 "$@" >> $LOG 2>&1
  echo "rc=$?" >> $LOG
}
run python bench.py --kernel-precision default --td 128 --te 512 --graph-class zipf
run python bench.py --kernel-precision default --td 128 --te 1536 --graph-class zipf
run python bench.py --kernel-precision default --td 128 --te 768 --graph-class zipf
run python bench.py --kernel-precision default --td 64 --te 768 --graph-class dense
run python bench.py --kernel-precision default --td 128 --te 1536 --graph-class dense
run python bench.py --kernel-precision default --td 128 --te 256 --graph-class dense
echo "queue4 done" >> $LOG
