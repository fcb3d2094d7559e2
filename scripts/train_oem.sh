#!/bin/bash
# Base-class training — 1:1 translation of the reference scripts/train_oem.sh
# env-var block (reference scripts/train_oem.sh:7-36) to the segland_tpu CLI.
uname -a
date

DATASET=oem
DATA_PATH=${DATA_PATH:-YOUR_PATH_FOR_OEM_TRAIN_DATA}
REPO_ROOT=$(cd "$(dirname "$0")/.." && pwd)
TRAIN_LIST=${TRAIN_LIST:-$REPO_ROOT/segland_tpu/data/list/oem/train.txt}
VAL_LIST=${VAL_LIST:-$REPO_ROOT/segland_tpu/data/list/oem/val.txt}
MODEL=${MODEL:-seghr_pop}
BACKBONE=${BACKBONE:-hr-w32}
RESTORE_PATH=${RESTORE_PATH:-}   # optional pretrained-backbone .pth
LR=1e-3
WD=1e-4
BS=4
START=0
STEPS=200
BASE_SIZE=1024,1024
INPUT_SIZE=768,768
OS=8
SEED=123
SAVE_DIR=${SAVE_DIR:-$REPO_ROOT/model_saved}

cd "$REPO_ROOT"
python -m segland_tpu.cli.train_base --dataset ${DATASET} --data-dir ${DATA_PATH} \
    --train-list ${TRAIN_LIST} --val-list ${VAL_LIST} --random-seed ${SEED} \
    --model ${MODEL} --backbone ${BACKBONE} \
    ${RESTORE_PATH:+--restore-from ${RESTORE_PATH}} ${RESTORE_PATH:+--finetune} \
    --input-size ${INPUT_SIZE} --base-size ${BASE_SIZE} \
    --learning-rate ${LR} --weight-decay ${WD} --batch-size ${BS} \
    --start-epoch ${START} --num-epoch ${STEPS} \
    --os ${OS} --snapshot-dir ${SAVE_DIR} --snapshot-frequency 50 \
    --dtype bfloat16 "$@"
