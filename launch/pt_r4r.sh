#!/bin/bash
# R4R map pretraining (role of /root/reference/pretrain_src/run_r4r.sh ->
# train_r4r.py). The reference repo does not ship its config/r4r_pretrain.json
# (run_r4r.sh references it but only the soon configs are in-tree), so
# configs/r4r_pretrain.json reconstructs the envelope from train_r4r.py's
# task set (mlm/sap, run dir name "cmt-vitbase-mlm.sap"), parser.py defaults
# (lr 3e-5, grad_norm 2.0, warmup 10k, 100k steps, batch 16) and the R2R
# model/features R4R reuses (R4R paths are concatenated R2R paths).
DATA_ROOT=${DATA_ROOT:-datasets/R4R}
python -m vln_bevbert_tpu.cli.pretrain \
    --dataset r4r \
    --data_root "$DATA_ROOT" \
    --config configs/r4r_pretrain.json \
    --tasks mlm.1.sap.1 \
    --output_dir runs/pt_r4r \
    "$@"
