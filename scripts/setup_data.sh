#!/bin/bash
# Download + preprocess everything (reference setup_data.sh).
DATA_DIR=$1
python -m gpv_tpu.cli.download data_dir=$DATA_DIR
python -m gpv_tpu.cli.preprocess data_dir=$DATA_DIR
