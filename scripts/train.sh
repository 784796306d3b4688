#!/bin/bash
# Two-phase multitask training driver (reference exp/gpv/scripts/train.sh):
# phase 1 trains with DETR frozen, phase 2 finetunes end-to-end from the
# phase-1 best checkpoint.
LEARNING_DATASETS=$1
DATA_SPLIT=$2
EXP_NAME=$3
OUTPUT_DIR=$4
DATA_DIR=$5

# single-chip recipe: global batch 120 fits one 16 GB chip via grad
# accumulation (8 x 15 microbatches, measured 531 ms/step — BASELINE.md);
# on an N-chip mesh set tpu.mesh.data=N and shrink/drop the accumulation.
ACCUM=${GRAD_ACCUM_STEPS:-8}

DETR_CKPT="${DATA_DIR}/detr/detr_coco_sce.pth"
if [[ $DATA_SPLIT == "original_split" ]]; then
    DETR_CKPT="${DATA_DIR}/detr/detr_coco.pth"
fi

python -m gpv_tpu.cli.train \
    exp_name=$EXP_NAME \
    output_dir=$OUTPUT_DIR \
    data_dir=$DATA_DIR \
    learning_datasets=$LEARNING_DATASETS \
    task_configs.data_split=$DATA_SPLIT \
    model.pretr_detr=$DETR_CKPT \
    training.freeze=True \
    training.grad_accum_steps=$ACCUM

CKPT="${OUTPUT_DIR}/${EXP_NAME}/ckpts/model"

python -m gpv_tpu.cli.train \
    exp_name=$EXP_NAME \
    output_dir=$OUTPUT_DIR \
    data_dir=$DATA_DIR \
    learning_datasets=$LEARNING_DATASETS \
    task_configs.data_split=$DATA_SPLIT \
    training.ckpt=$CKPT \
    training.freeze=False \
    training.grad_accum_steps=$ACCUM
