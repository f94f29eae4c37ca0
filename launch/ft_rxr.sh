#!/bin/bash
# RxR fine-tuning with the XLM-R text encoder and nDTW expert policy
# (role of /root/reference/scripts/ft_rxr.bash).
DATA_ROOT=${DATA_ROOT:-datasets/RxR}
python -m vln_bevbert_tpu.cli.finetune \
    --dataset rxr \
    --data_root "$DATA_ROOT" \
    --feedback dagger \
    --expert_policy ndtw \
    --pretrain_ckpt runs/pt_r2r/ckpt_100000 \
    --output_dir runs/ft_rxr \
    "$@"
