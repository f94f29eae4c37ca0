#!/bin/bash
# R2R-CE train / eval / infer (role of /root/reference/bevbert_ce/run_r2r/main.bash).
# Usage: launch/ce_r2r.sh {train|eval|infer} [extra flags...]
# The frozen waypoint predictor loads from $WAYPOINT_CKPT (default: the
# reference's published path, ss_trainer_BEV.py:238); pass
# --allow_random_frozen in "$@" instead for synthetic smoke runs.
mode=${1:-train}; shift || true
wp=${WAYPOINT_CKPT:-data/wp_pred/check_cwp_bestdist_hfov90}
case $mode in
  train)
    python -m vln_bevbert_tpu.cli.ce_train \
      --run_type train \
      --waypoint_ckpt "$wp" \
      --iters 10000 --log_every 500 \
      --sample_ratio 0.75 --decay_interval 2000 \
      --num_env_workers 8 \
      --output_dir runs/ce_r2r "$@"
    ;;
  eval)
    python -m vln_bevbert_tpu.cli.ce_train \
      --run_type eval \
      --waypoint_ckpt "$wp" \
      --ckpt_path_dir runs/ce_r2r \
      --back_algo control \
      --output_dir runs/ce_r2r_eval "$@"
    ;;
  infer)
    python -m vln_bevbert_tpu.cli.ce_train \
      --run_type inference \
      --waypoint_ckpt "$wp" \
      --predictions_file preds.json \
      --back_algo control \
      --output_dir runs/ce_r2r_infer "$@"
    ;;
  *) echo "usage: $0 {train|eval|infer} [flags]"; exit 1;;
esac
