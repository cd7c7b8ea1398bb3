#!/bin/bash
# Round-5 TPU queue 2 — learning at the production shape (VERDICT r4 #3/#4).
#
# The r4 doc-scale rehearsal ran 1 epoch at the reference's 60-epoch lr
# (2e-5) and ended at eval MRR ~= random: operational proof only. These
# legs demonstrate LEARNING at the production tile (in_dim 1152, 45 rels
# incl. self-loop, 16h x 200 = H*F 3200, 2 layers, projection, self-adv
# multi-objective, dropout 0.3) with a tuned lr on a learnable KG
# (exact-ish NN structure + self-loops), and compare fp32 (raised-VMEM
# layouts — never before driven through a full doc-scale train) vs bf16
# (production mode, the r4 rehearsal's 5 non-finite steps) on the SAME
# seed: matched trajectories = bf16-gradient-fidelity evidence at the
# tile where its error envelope is widest (dh rel-err 2.3e-1).
#
# Graph: 24k nodes / 120k NN edges + 24k self-loops (~1012 steps/epoch at
# bs 128), 5 epochs each.
cd /root/repo
export PYTHONPATH=/root/repo:$PYTHONPATH
LOG=reval_r5/q2.log
# Serialize on queue 1 (one TPU process at a time).
while ! grep -q "queue1 done" reval_r5/q1.log 2>/dev/null; do sleep 30; done

common=(
  --synthetic --synthetic-nodes 24000 --synthetic-edges 120000
  --synthetic-rels 44 --synthetic-dim 1152 --synthetic-nn-pool 4096
  --synthetic-self-loops
  --architecture-name small
  --epochs 5 --batch-size 128 --num-neg 32
  --gat-out-dim 200 --gat-num-layers 2 --heads 16
  --scorer distmult --project-to-input-size --projection-layers 2
  --projection-dropout 0.3 --dropout 0.3
  --lr 1e-3 --lr-scheduler constant --weight-decay 1e-4
  --use-self-adv-neg --self-adv-alpha 1.0
  --relgat-weight 1.0 --pos-cosine-weight 1.0 --neg-cosine-weight 1.0
  --mse-weight 0.0
  --eval-every-n-steps 500 --save-every-n-steps 1000
  --log-every-n-steps 100 --steps-per-call 8
  --seed 7 --use-pallas
)

echo "=== doc-scale learning leg: fp32 (highest, raised-VMEM layouts) ===" >> $LOG
timeout 14000 python -m relgat_projector_tpu.cli "${common[@]}" \
  --kernel-precision highest \
  --save-dir reval_r5/docscale-fp32-ckpt \
  > reval_r5/docscale_fp32.log 2>&1
echo "fp32 leg rc=$?" >> $LOG

echo "=== doc-scale learning leg: bf16 (default, production mode) ===" >> $LOG
timeout 14000 python -m relgat_projector_tpu.cli "${common[@]}" \
  --kernel-precision default \
  --save-dir reval_r5/docscale-bf16-ckpt \
  > reval_r5/docscale_bf16.log 2>&1
echo "bf16 leg rc=$?" >> $LOG
echo "queue2 done" >> $LOG
