#!/bin/bash
# REVERIE object-aware map pretraining (role of /root/reference/scripts/pt_rvr.bash:
# task mix mlm.1.mrc.1.sap.1.og.1 over the object-token model).
DATA_ROOT=${DATA_ROOT:-datasets/REVERIE}
python -m vln_bevbert_tpu.cli.pretrain \
    --dataset reverie \
    --data_root "$DATA_ROOT" \
    --tasks mlm.1.mrc.1.sap.1.og.1 \
    --output_dir runs/pt_reverie \
    "$@"
