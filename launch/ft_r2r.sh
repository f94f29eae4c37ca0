#!/bin/bash
# R2R DAgger fine-tuning (role of /root/reference/scripts/ft_r2r.bash).
DATA_ROOT=${DATA_ROOT:-datasets/R2R}
python -m vln_bevbert_tpu.cli.finetune \
    --dataset r2r \
    --data_root "$DATA_ROOT" \
    --feedback dagger \
    --pretrain_ckpt runs/pt_r2r/ckpt_100000 \
    --output_dir runs/ft_r2r \
    "$@"
