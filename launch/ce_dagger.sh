#!/bin/bash
# R2R-CE DAgger recollection training (role of the reference's registered
# "dagger" trainer, /root/reference/bevbert_ce/vlnce_baselines/
# dagger_trainer.py:186-188 + IL.DAGGER defaults in config/default.py).
# Usage: launch/ce_dagger.sh [bev|etp|prevalent] [extra flags...]
# Frozen waypoint predictor from $WAYPOINT_CKPT (published path by default);
# pass --allow_random_frozen in "$@" for synthetic smoke runs.
policy=${1:-prevalent}; shift || true
python -m vln_bevbert_tpu.cli.ce_train \
    --trainer dagger \
    --policy "$policy" \
    --waypoint_ckpt "${WAYPOINT_CKPT:-data/wp_pred/check_cwp_bestdist_hfov90}" \
    --dagger_iters 10 \
    --update_size 5000 \
    --dagger_p 0.75 \
    --dagger_epochs 4 \
    --output_dir runs/ce_dagger \
    "$@"
