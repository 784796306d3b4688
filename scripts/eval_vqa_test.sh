#!/bin/bash
# VQA eval-server predictions (reference exp/gpv/scripts/eval_vqa_test.sh).
EXP_NAME=$1
SUBSET=$2   # test | testdev
OUTPUT_DIR=$3
DATA_DIR=$4
python -m gpv_tpu.cli.compute_test_predictions kind=vqa \
    exp_name=$EXP_NAME output_dir=$OUTPUT_DIR data_dir=$DATA_DIR \
    learning_datasets=vqa model.max_text_len=5 eval.subset=$SUBSET
