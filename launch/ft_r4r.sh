#!/bin/bash
# R4R fine-tuning (role of map_nav_src/scripts/run_r4r.sh: long compositional
# paths, CLS/nDTW-focused eval, ndtw expert).
DATA_ROOT=${DATA_ROOT:-datasets/R4R}
python -m vln_bevbert_tpu.cli.finetune \
    --dataset r4r \
    --data_root "$DATA_ROOT" \
    --feedback dagger \
    --expert_policy ndtw \
    --pretrain_ckpt runs/pt_r2r/ckpt_100000 \
    --output_dir runs/ft_r4r \
    "$@"
