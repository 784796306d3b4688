#!/bin/bash
# Task x subset offline eval matrix (reference exp/gpv/scripts/eval.sh),
# with the per-task max_text_len settings.
EXP_NAME=$1
TASK=$2     # all | all_but_refexp | <task_name>
SUBSET=$3   # val_test | <subset_name>
SPLIT=$4    # original_split | gpv_split
OUTPUT_DIR=$5
DATA_DIR=$6

if [[ $TASK == "all" ]]; then
    TASK_LIST=("RefCocop" "CocoClassification" "CocoVqa" "CocoDetection" "CocoCaptioning")
elif [[ $TASK == "all_but_refexp" ]]; then
    TASK_LIST=("CocoClassification" "CocoVqa" "CocoDetection" "CocoCaptioning")
else
    TASK_LIST=($TASK)
fi

if [[ $SUBSET == "val_test" ]]; then
    SUBSET_LIST=("val" "test")
else
    SUBSET_LIST=($SUBSET)
fi

for task in ${TASK_LIST[@]}; do
    for subset in ${SUBSET_LIST[@]}; do
        case $task in
            CocoDetection)      max_text_len=20; learning_datasets="det" ;;
            CocoVqa)            max_text_len=5;  learning_datasets="vqa" ;;
            CocoCaptioning)     max_text_len=20; learning_datasets="cap" ;;
            CocoClassification) max_text_len=5;  learning_datasets="cls" ;;
            RefCocop)           max_text_len=5;  learning_datasets="refcocop" ;;
            *) echo "unknown task ${task}"; exit 1 ;;
        esac
        echo "== ${task} / ${subset} (max_text_len=${max_text_len}) =="
        python -m gpv_tpu.cli.compute_predictions \
            exp_name=$EXP_NAME \
            output_dir=$OUTPUT_DIR \
            data_dir=$DATA_DIR \
            learning_datasets=$learning_datasets \
            task_configs.data_split=$SPLIT \
            model.max_text_len=$max_text_len \
            eval.task=$task \
            eval.subset=$subset
    done
done
