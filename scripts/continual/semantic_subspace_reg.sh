#!/bin/bash
# Semantic subspace regularizer + memory
# (reference scripts/continual/slurm_semantic_subspace_reg.sh:36-59).
set -e
CURRENT="$PWD"
DUMPED_PATH="${DUMPED_PATH:-$CURRENT/dumped}"
DATA_PATH="${DATA_PATH:-$CURRENT/data}"
EXP_FOLDER="$DUMPED_PATH/continual/finetune_semantic_subspace_memory"
SEEDS="${SEEDS:-1 2 3 4 5 6 7 8 9 10}"
mkdir -p "$EXP_FOLDER"

TRLOSS=0.0; LR=0.002; LMBD=0.2; LMBDN=0.1; PULL=0.2; TEMP=3.0; WD=5e-4

for SEED in $SEEDS; do
  EXP_NAME="seed_${SEED}_pull_${PULL}_temp_${TEMP}"
  BACKBONE_PATH="$DUMPED_PATH/backbones/continual/resnet18/$SEED/resnet18_last.ckpt"
  python eval_incremental.py --model_path "$BACKBONE_PATH" \
      --model resnet18 \
      --no_dropblock \
      --data_root "$DATA_PATH" \
      --n_shots 5 \
      --classifier linear \
      --eval_mode few-shot-incremental-fine-tune \
      --min_novel_epochs 20 \
      --learning_rate $LR \
      --freeze_backbone_at 1 \
      --test_base_batch_size 2000 \
      --continual \
      --num_workers 0 \
      --n_queries 25 \
      --lmbd_reg_transform_w $LMBD \
      --lmbd_reg_novel $LMBDN \
      --weight_decay $WD \
      --target_train_loss $TRLOSS \
      --label_pull $PULL \
      --glove \
      --temperature $TEMP \
      --set_seed "$SEED" \
      --n_base_support_samples 1 \
      --memory_replay 1 \
      > "$EXP_FOLDER/$EXP_NAME.out" 2> "$EXP_FOLDER/$EXP_NAME.err"
done
