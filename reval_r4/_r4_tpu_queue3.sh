#!/bin/bash
# Round-4 TPU queue v3: production-shape rehearsal (VERDICT r3 next-4).
# Doc-scale config: in_dim 1152, 45 relations, 16 heads x out_dim 200
# (H*F = 3200), 2 layers, projection-to-input, self-adversarial
# multi-objective, eval + checkpointing, production scan dispatch, bf16
# kernels, blocked layout AUTO-TUNED (the hardcoded bench layouts
# Mosaic-OOM at this tile). Synthetic KG at 120k nodes / 600k edges.
# Partitioner note: node partitioning activates with halo shards (>1
# device); single-chip rehearsals exercise it via the 8-device CPU dryrun
# leg 2 instead.
cd /root/repo
WAIT_PID=${1:-}
if [ -n "$WAIT_PID" ]; then
  while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 30; done
fi
export PYTHONPATH=/root/repo:$PYTHONPATH

timeout 14000 python -m relgat_projector_tpu.cli \
  --synthetic --synthetic-nodes 120000 --synthetic-edges 600000 \
  --synthetic-rels 45 --synthetic-dim 1152 --synthetic-nn-pool 2048 \
  --architecture-name small \
  --epochs 1 --batch-size 128 --num-neg 32 \
  --gat-out-dim 200 --gat-num-layers 2 --heads 16 \
  --scorer distmult --project-to-input-size --projection-layers 2 \
  --projection-dropout 0.3 --dropout 0.3 \
  --lr 2e-5 --lr-scheduler linear --weight-decay 1e-4 \
  --use-self-adv-neg --self-adv-alpha 1.0 \
  --relgat-weight 1.0 --pos-cosine-weight 1.0 --neg-cosine-weight 1.0 \
  --mse-weight 0.0 \
  --eval-every-n-steps 1000 --save-every-n-steps 1000 \
  --log-every-n-steps 64 --steps-per-call 8 \
  --kernel-precision default --use-pallas \
  --save-dir reval_r4/prod-shape-ckpt \
  >> reval_r4/prod_shape_rehearsal.log 2>&1
echo "rehearsal rc=$?" >> reval_r4/prod_shape_rehearsal.log
