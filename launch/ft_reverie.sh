#!/bin/bash
# REVERIE object-grounding fine-tuning (role of /root/reference/scripts/ft_rvr.bash
# and map_nav_src/reverie/main_nav_obj.py: object tokens + OG head,
# RGS/RGSPL best-checkpoint selection, predObjId submissions).
DATA_ROOT=${DATA_ROOT:-datasets/REVERIE}
python -m vln_bevbert_tpu.cli.finetune \
    --dataset reverie \
    --data_root "$DATA_ROOT" \
    --feedback dagger \
    --pretrain_ckpt runs/pt_reverie/ckpt_100000 \
    --output_dir runs/ft_reverie \
    "$@"
