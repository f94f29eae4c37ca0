#!/bin/bash
# R2R map pretraining (role of /root/reference/scripts/pt_r2r.bash).
# One process drives all local TPU chips via the dp mesh; multihost pods
# launch this same script per host.
DATA_ROOT=${DATA_ROOT:-datasets/R2R}
python -m vln_bevbert_tpu.cli.pretrain \
    --dataset r2r \
    --data_root "$DATA_ROOT" \
    --tasks mlm.5.sap.5.masksem.1 \
    --output_dir runs/pt_r2r \
    "$@"
