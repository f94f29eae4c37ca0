#!/bin/bash
# SOON object-aware map pretraining (role of the reference's
# pretrain_src/train_soon_obj.py entry; same proxy-task mix as REVERIE).
DATA_ROOT=${DATA_ROOT:-datasets/SOON}
python -m vln_bevbert_tpu.cli.pretrain \
    --dataset soon \
    --data_root "$DATA_ROOT" \
    --tasks mlm.1.mrc.1.sap.1.og.1 \
    --output_dir runs/pt_soon \
    "$@"
