#!/bin/bash
# Novel-class fine-tuning — translation of reference scripts/ft_oem.sh:7-38.
uname -a
date

DATASET=oem
DATA_PATH=${DATA_PATH:-YOUR_PATH_FOR_OEM_TRAIN_DATA}
REPO_ROOT=$(cd "$(dirname "$0")/.." && pwd)
TRAIN_LIST=${TRAIN_LIST:-$REPO_ROOT/segland_tpu/data/list/oem/train.txt}
VAL_LIST=${VAL_LIST:-$REPO_ROOT/segland_tpu/data/list/oem/val.txt}
SHOT=5
MODEL=${MODEL:-swin_pop}
BACKBONE=${BACKBONE:-swin-s}
RESTORE_PATH=${RESTORE_PATH:-$REPO_ROOT/model_saved/best.ckpt}  # base ckpt (.pth or .ckpt)
LR=1e-4
WD=1e-4
BS=1
START=0
STEPS=500
BASE_SIZE=1024,1024
INPUT_SIZE=1024,1024
OS=8
SEED=123
SAVE_DIR=${SAVE_DIR:-$REPO_ROOT/model_saved_ft}

cd "$REPO_ROOT"
python -m segland_tpu.cli.ft_pop --dataset ${DATASET} --data-dir ${DATA_PATH} \
    --train-list ${TRAIN_LIST} --val-list ${VAL_LIST} --random-seed ${SEED} \
    --model ${MODEL} --backbone ${BACKBONE} --restore-from ${RESTORE_PATH} \
    --input-size ${INPUT_SIZE} --base-size ${BASE_SIZE} \
    --learning-rate ${LR} --weight-decay ${WD} --batch-size ${BS} \
    --start-epoch ${START} --num-epoch ${STEPS} \
    --os ${OS} --snapshot-dir ${SAVE_DIR} \
    --shot ${SHOT} --freeze-backbone --fix-lr --update-base --update-epoch 1 \
    --dtype bfloat16 "$@"
