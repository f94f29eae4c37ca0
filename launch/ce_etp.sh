#!/bin/bash
# R2R-CE topo-only ETP training (role of the reference's SS-ETP trainer,
# /root/reference/bevbert_ce/vlnce_baselines/ss_trainer_ETP.py).
python -m vln_bevbert_tpu.cli.ce_train \
    --trainer ss-etp \
    --waypoint_ckpt "${WAYPOINT_CKPT:-data/wp_pred/check_cwp_bestdist_hfov90}" \
    --iters 10000 \
    --log_every 500 \
    --sample_ratio 0.75 \
    --decay_interval 2000 \
    --num_env_workers 8 \
    --output_dir runs/ce_etp \
    "$@"
