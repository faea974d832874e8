#!/bin/bash
# Backbone pretraining over seeds (TPU counterpart of the reference's
# scripts/continual/slurm_run_backbone.sh:30-40 Slurm array).
#
# Default: ALL seeds train simultaneously on one chip through the vmapped
# multi-seed engine (one staging + one compile serve every lane; aggregate
# img/s matches sequential on one chip — see engine/multiseed_pretrain.py;
# --shard_seeds scales over a mesh).  VMAP=0 falls back to sequential
# single-seed runs (one chip replaces the per-seed V100); use
# SEEDS="1 2 3" to shard across hosts either way.
set -e
CURRENT="$PWD"
DUMPED_PATH="${DUMPED_PATH:-$CURRENT/dumped}"
DATA_PATH="${DATA_PATH:-$CURRENT/data}"
SEEDS="${SEEDS:-1 2 3 4 5 6 7 8 9 10}"
VMAP="${VMAP:-1}"
SEED_BATCH="${SEED_BATCH:-5}"   # HBM bound; 5 lanes fit a v5e comfortably

BASE="$DUMPED_PATH/backbones/continual/resnet18"
mkdir -p "$BASE"

if [ "$VMAP" = "1" ]; then
  python tools/run_seeds.py --pretrain --vmap --seed_batch "$SEED_BATCH" \
      --seeds $SEEDS \
      --model_path_pattern "$BASE/{seed}" -- \
      --trial pretrain \
      --model_path "$BASE" \
      --tb_path "$BASE/tb" \
      --data_root "$DATA_PATH" \
      --classifier linear \
      --model resnet18 \
      --save_freq 100 \
      --continual \
      --no_dropblock \
      --no_linear_bias \
      > "$BASE/train.out" 2> "$BASE/train.err"
else
  for SEED in $SEEDS; do
    EXP_FOLDER="$BASE/$SEED"
    mkdir -p "$EXP_FOLDER"
    python train_supervised.py --trial "pretrain_$SEED" \
        --model_path "$EXP_FOLDER" \
        --tb_path "$EXP_FOLDER/tb" \
        --data_root "$DATA_PATH" \
        --classifier linear \
        --model resnet18 \
        --save_freq 100 \
        --continual \
        --no_dropblock \
        --no_linear_bias \
        --set_seed "$SEED" \
        > "$EXP_FOLDER/train.out" 2> "$EXP_FOLDER/train.err"
  done
fi
