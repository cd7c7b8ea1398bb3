#!/usr/bin/env bash
# Tuned "small" production configuration — parity with the reference's
# training_scripts/run-relgat-trainer-base-model.sh:22-132 (60 epochs,
# bs 128, num_neg 32, out_dim 128, 2 layers, 16 heads, lr 2e-5, distmult,
# projection-to-input with 2 layers, multi-objective 1/1/1/0, dropout 0.3,
# linear scheduler, wd 1e-4, early-stop patience 10, self-adversarial).
#
# Usage:
#   ./run-relgat-trainer-base-model.sh <nodes.pkl> <relations.json> \
#       <triplets.json> [out_dir]
# or with no arguments: trains on a synthetic KG (smoke mode).
set -euo pipefail

EPOCHS=60
BATCH_SIZE=128
NUM_NEG=32
GAT_OUT_DIM=128
GAT_NUM_LAYERS=2
HEADS=16
LR=2e-5
DROPOUT=0.3
WEIGHT_DECAY=1e-4
PATIENCE=10
OUT_DIR="${4:-relgat-out}"

DATA_ARGS=()
if [[ $# -ge 3 ]]; then
  DATA_ARGS+=(
    --nodes-embeddings-path "$1"
    --relations-mapping "$2"
    --relations-triplets "$3"
  )
else
  echo "No dataset paths given - running on a synthetic KG (smoke mode)."
  DATA_ARGS+=(--synthetic)
fi

exec python -m relgat_projector_tpu.cli \
  "${DATA_ARGS[@]}" \
  --architecture-name small \
  --epochs "$EPOCHS" \
  --batch-size "$BATCH_SIZE" \
  --num-neg "$NUM_NEG" \
  --gat-out-dim "$GAT_OUT_DIM" \
  --gat-num-layers "$GAT_NUM_LAYERS" \
  --heads "$HEADS" \
  --scorer distmult \
  --project-to-input-size \
  --projection-layers 2 \
  --projection-dropout "$DROPOUT" \
  --dropout "$DROPOUT" \
  --lr "$LR" \
  --lr-scheduler linear \
  --weight-decay "$WEIGHT_DECAY" \
  --use-self-adv-neg \
  --self-adv-alpha 1.0 \
  --relgat-weight 1.0 \
  --pos-cosine-weight 1.0 \
  --neg-cosine-weight 1.0 \
  --mse-weight 0.0 \
  --early-stop-patience "$PATIENCE" \
  --eval-every-n-steps 500 \
  --save-every-n-steps 500 \
  --save-dir "$OUT_DIR" \
  --use-pallas
