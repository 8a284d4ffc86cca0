#!/bin/bash
# Eval driver (parity with reference eval.sh): single-scale then multi-scale.
# Point the variables at your checkpoint roots ({out_dir}/ckpt/{exp_name})
# and dataset directories.
SINGLE_CKPT=${SINGLE_CKPT:-/data/out/ckpt/lego}
DATA_DIR=${DATA_DIR:-/data/nerf_synthetic/lego}
OUT_DIR=${OUT_DIR:-/data/eval_out}

python eval.py \
        --ckpt=$SINGLE_CKPT \
        --data=$DATA_DIR \
        --out_dir=$OUT_DIR \
        --save_image \
        --scale 1

MULTI_CKPT=${MULTI_CKPT:-/data/out/ckpt/lego_multi}
MULTI_DATA_DIR=${MULTI_DATA_DIR:-/data/multi_blender/lego}

python eval.py \
        --ckpt=$MULTI_CKPT \
        --data=$MULTI_DATA_DIR \
        --out_dir=$OUT_DIR \
        --save_image \
        --scale 4
