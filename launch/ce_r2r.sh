#!/bin/bash
# R2R-CE train / eval / infer (role of /root/reference/bevbert_ce/run_r2r/main.bash).
# Usage: launch/ce_r2r.sh {train|eval|infer} [extra flags...]
mode=${1:-train}; shift || true
case $mode in
  train)
    python -m vln_bevbert_tpu.cli.ce_train \
      --run_type train \
      --iters 10000 --log_every 500 \
      --sample_ratio 0.75 --decay_interval 2000 \
      --num_env_workers 8 \
      --output_dir runs/ce_r2r "$@"
    ;;
  eval)
    python -m vln_bevbert_tpu.cli.ce_train \
      --run_type eval \
      --ckpt_path_dir runs/ce_r2r \
      --back_algo control \
      --output_dir runs/ce_r2r_eval "$@"
    ;;
  infer)
    python -m vln_bevbert_tpu.cli.ce_train \
      --run_type inference \
      --predictions_file preds.json \
      --back_algo control \
      --output_dir runs/ce_r2r_infer "$@"
    ;;
  *) echo "usage: $0 {train|eval|infer} [flags]"; exit 1;;
esac
