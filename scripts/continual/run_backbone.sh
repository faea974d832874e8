#!/bin/bash
# Backbone pretraining over seeds (TPU counterpart of the reference's
# scripts/continual/slurm_run_backbone.sh:30-40 Slurm array).
# One TPU chip replaces the per-seed V100; seeds run sequentially here —
# use SEEDS="1 2 3" to shard across hosts.
set -e
CURRENT="$PWD"
DUMPED_PATH="${DUMPED_PATH:-$CURRENT/dumped}"
DATA_PATH="${DATA_PATH:-$CURRENT/data}"
SEEDS="${SEEDS:-1 2 3 4 5 6 7 8 9 10}"

for SEED in $SEEDS; do
  EXP_FOLDER="$DUMPED_PATH/backbones/continual/resnet18/$SEED"
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
