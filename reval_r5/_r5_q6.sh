#!/bin/bash
# Round-5 TPU queue 6 — final hardware runs.
# 1/2: doc-scale legs with eval-every-100 on epoch 1 -> a fine-grained
#      eval-MRR CURVE off random (the 5-epoch legs eval first at step
#      500, by which point MRR had already converged to ~0.27).
# 3:   scanned bf16 at 8M edges / 8 segments with the new (64,256)
#      default — r3's TD=128 number at this config was 1066.5 ms/step.
# 4/5: THE final driver-style bench runs (dual-mode + probe-pick, then
#      --small) — the last hardware runs before the end-of-round
#      snapshot (VERDICT r4 #1 done-criterion).
cd /root/repo
export PYTHONPATH=/root/repo:$PYTHONPATH
LOG=reval_r5/q6.log
run() {
  echo "=== $* ===" >> $LOG
  timeout 7000 "$@" >> $LOG 2>&1
  echo "rc=$?" >> $LOG
}
common=(
  --synthetic --synthetic-nodes 24000 --synthetic-edges 120000
  --synthetic-rels 44 --synthetic-dim 1152 --synthetic-nn-pool 4096
  --synthetic-self-loops
  --architecture-name small
  --epochs 1 --batch-size 128 --num-neg 32
  --gat-out-dim 200 --gat-num-layers 2 --heads 16
  --scorer distmult --project-to-input-size --projection-layers 2
  --projection-dropout 0.3 --dropout 0.3
  --lr 1e-3 --lr-scheduler constant --weight-decay 1e-4
  --use-self-adv-neg --self-adv-alpha 1.0
  --relgat-weight 1.0 --pos-cosine-weight 1.0 --neg-cosine-weight 1.0
  --mse-weight 0.0
  --eval-every-n-steps 100 --save-every-n-steps 1000
  --log-every-n-steps 100 --steps-per-call 8
  --seed 7 --use-pallas
)
echo "=== fine-eval doc-scale fp32 ===" >> $LOG
timeout 7000 python -m relgat_projector_tpu.cli "${common[@]}" \
  --kernel-precision highest --save-dir reval_r5/fine-fp32-ckpt \
  > reval_r5/docscale_fine_fp32.log 2>&1
echo "fine fp32 rc=$?" >> $LOG
echo "=== fine-eval doc-scale bf16 ===" >> $LOG
timeout 7000 python -m relgat_projector_tpu.cli "${common[@]}" \
  --kernel-precision default --save-dir reval_r5/fine-bf16-ckpt \
  > reval_r5/docscale_fine_bf16.log 2>&1
echo "fine bf16 rc=$?" >> $LOG
run python scripts/tpu_scale_check.py --edges 8000000 --nodes 800000 --scan-segments 8 --kernel-precision default
run python bench.py --probe-pick
run python bench.py --small
echo "queue6 done" >> $LOG
