#!/bin/bash
# Captioning eval-server predictions (reference exp/gpv/scripts/eval_cap_test.sh).
EXP_NAME=$1
SUBSET=$2   # val | test
OUTPUT_DIR=$3
DATA_DIR=$4
python -m gpv_tpu.cli.compute_test_predictions kind=cap \
    exp_name=$EXP_NAME output_dir=$OUTPUT_DIR data_dir=$DATA_DIR \
    learning_datasets=cap model.max_text_len=20 eval.subset=$SUBSET
