#!/bin/bash
# R2R-CE scheduled-sampling training (role of /root/reference/bevbert_ce/run_r2r/main.bash).
python -m vln_bevbert_tpu.cli.ce_train \
    --iters 10000 \
    --log_every 500 \
    --sample_ratio 0.75 \
    --decay_interval 2000 \
    --output_dir runs/ce_r2r \
    "$@"
