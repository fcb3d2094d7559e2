#!/bin/bash
# Base-model evaluation — translation of reference scripts/evaluate_oem_base.sh.
uname -a
date

DATASET=oem
DATA_PATH=${DATA_PATH:-YOUR_PATH_FOR_OEM_TEST_DATA}
REPO_ROOT=$(cd "$(dirname "$0")/.." && pwd)
TRAIN_LIST=${TRAIN_LIST:-$REPO_ROOT/segland_tpu/data/list/oem/train.txt}
VAL_LIST=${VAL_LIST:-$REPO_ROOT/segland_tpu/data/list/oem/test.txt}
SHOT=5
MODEL=${MODEL:-swin_pop}
BACKBONE=${BACKBONE:-swin-s}
RESTORE_PATH=${RESTORE_PATH:-$REPO_ROOT/model_saved/best.ckpt}
BASE_SIZE=1024,1024
OS=8
SAVE=${SAVE:-0}
SAVE_DIR=${SAVE_DIR:-$REPO_ROOT/output}
SEED=123

cd "$REPO_ROOT"
python -m segland_tpu.cli.eval_base --dataset ${DATASET} --data-dir ${DATA_PATH} \
    --train-list ${TRAIN_LIST} --val-list ${VAL_LIST} \
    --model ${MODEL} --restore-from ${RESTORE_PATH} --backbone ${BACKBONE} \
    --base-size ${BASE_SIZE} --save-path ${SAVE_DIR} --save ${SAVE} --save-prob ${SAVE} \
    --shot ${SHOT} --os ${OS} --random-seed ${SEED} \
    --dtype bfloat16 --fused --device-normalize "$@"
