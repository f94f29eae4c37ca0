#!/bin/bash
# SOON fine-tuning (role of map_nav_src/soon/main.py: object pseudo-labels,
# detection metrics, predObjId submissions).
DATA_ROOT=${DATA_ROOT:-datasets/SOON}
python -m vln_bevbert_tpu.cli.finetune \
    --dataset soon \
    --data_root "$DATA_ROOT" \
    --feedback dagger \
    --pretrain_ckpt runs/pt_soon/ckpt_100000 \
    --output_dir runs/ft_soon \
    "$@"
