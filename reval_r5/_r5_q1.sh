#!/bin/bash
# Round-5 TPU queue 1 — fp32 layout-tuner re-probe (VERDICT r4 #1).
#
# Round 4 froze the fp32 anchor rankings from a PRE-is_last propagate-only
# sweep; when the tuner went live in the round's last commit its pick
# (128,512) measured 16.2M vs 20.08M at the (128,256) it replaced. Ground
# truth here is the FULL TRAIN STEP (bench.py, scan dispatch) per graph
# class, on the final kernels:
#   item 0: --small --probe-pick dual-mode run = on-TPU verification of the
#           new bench.py paths (dual-mode JSON, probe-pick, partial gate)
#   items 1-3: fp32 uniform candidates -> new headline + uniform ranking
#   items 4-10: fp32 zipf/clustered/dense candidates -> anchor tables
#   items 11-12: bf16 clustered check (is_last shrank the TD=128 penalty;
#           only uniform was re-probed in r4 queue7)
cd /root/repo
export PYTHONPATH=/root/repo:$PYTHONPATH
LOG=reval_r5/q1.log
run() {
  echo "=== $* ===" >> $LOG
  timeout 3600 "$@" >> $LOG 2>&1
  echo "rc=$?" >> $LOG
}
run python bench.py --small --probe-pick
run python bench.py --kernel-precision highest --td 128 --te 256
run python bench.py --kernel-precision highest --td 128 --te 128
run python bench.py --kernel-precision highest --td 128 --te 384
run python bench.py --kernel-precision highest --td 128 --te 128 --graph-class zipf
run python bench.py --kernel-precision highest --td 128 --te 256 --graph-class zipf
run python bench.py --kernel-precision highest --td 128 --te 256 --graph-class clustered
run python bench.py --kernel-precision highest --td 128 --te 512 --graph-class clustered
run python bench.py --kernel-precision highest --td 128 --te 128 --graph-class clustered
run python bench.py --kernel-precision highest --td 128 --te 256 --graph-class dense
run python bench.py --kernel-precision highest --td 128 --te 512 --graph-class dense
run python bench.py --kernel-precision default --td 64 --te 768 --graph-class clustered
run python bench.py --kernel-precision default --td 128 --te 1536 --graph-class clustered
echo "queue1 done" >> $LOG
