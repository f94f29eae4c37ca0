"""Pretraining CLI — role of /root/reference/pretrain_src/train_r2r.py (and
its r4r/reverie/soon variants) + scripts/pt_*.bash.

Real MP3D data: point --data_root at a directory holding the reference-format
files (connectivity/, annotation jsonl, HDF5 feature stores). Without real
data, --synthetic runs the identical pipeline over generated fixtures (smoke
tests, benchmarking, CI).

Distributed: single-program over all local TPU chips via a dp mesh; multihost
works by launching the same program per host (jax.distributed.initialize) —
the MetaLoader task schedule is a shared PRNG, so no cross-host sync is
needed (SURVEY.md section 5, distributed backend).
"""

from __future__ import annotations

import argparse
import json
import os

import numpy as np


def parse_args(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--config", default=None, help="JSON config overrides")
    p.add_argument("--data_root", default=None)
    p.add_argument("--dataset", default="r2r", choices=["r2r", "r4r", "reverie", "soon"])
    p.add_argument("--synthetic", action="store_true")
    p.add_argument("--output_dir", default="runs/pretrain")
    p.add_argument("--num_steps", type=int, default=None)
    p.add_argument("--batch_size", type=int, default=None)
    p.add_argument("--tasks", default=None, help="e.g. mlm.5.sap.5.masksem.1")
    p.add_argument("--train_files", default=None,
                   help="comma-separated trajectory annotation files "
                        "(jsonl/json), overriding the data_root layout — "
                        "the reference's train_traj_files lists "
                        "(config/*_pretrain.json)")
    p.add_argument("--val_files", default=None,
                   help="like --train_files for the validation split")
    p.add_argument("--resume", default=None)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--num_workers", type=int, default=None,
                   help="forked batch-builder processes (default: config)")
    p.add_argument("--init_bert", action="store_true",
                   help="initialise the language stack from HF bert-base")
    return p.parse_args(argv)


def parse_task_ratio(spec: str):
    """'mlm.5.sap.5.masksem.1' -> (('mlm','sap','masksem'), (5.,5.,1.))
    (ref task-ratio DSL, pretrain_src/utils/misc.py:27-37)."""
    parts = spec.split(".")
    tasks, ratios = [], []
    for i in range(0, len(parts), 2):
        tasks.append(parts[i])
        ratios.append(float(parts[i + 1]))
    return tuple(tasks), tuple(ratios)


def _split_files(spec):
    return [s for s in spec.split(",") if s.strip()] if spec else None


def build_synthetic_db(cfg, seed=0, tmpdir="/tmp/bevbert_synth"):
    import numpy as np

    from ..data.feature_db import H5FeatureDB, write_synthetic_features
    from ..data.loader import make_synthetic_annotations
    from ..data.nav_graph import (
        build_scanvp_cands,
        load_nav_graphs,
        write_synthetic_connectivity,
    )
    from ..data.pathdata import TextPathData

    rng = np.random.default_rng(seed)
    conn = os.path.join(tmpdir, "conn")
    fts = os.path.join(tmpdir, "fts")
    if not os.path.exists(os.path.join(conn, "scans.txt")):
        write_synthetic_connectivity(conn, rng, n_scans=4, n_nodes=20)
    graphs = load_nav_graphs(conn)
    cands = build_scanvp_cands(graphs)
    if not os.path.exists(os.path.join(fts, "view_fts.hdf5")):
        write_synthetic_features(
            fts, rng, {s: g.node_ids for s, g in graphs.items()},
            image_feat_size=cfg.model.image_feat_size,
            grid_feat_size=cfg.model.bev_grid_feat_size,
            grid_hw=cfg.shapes.grid_hw, num_views=cfg.shapes.num_views,
        )
    annos = make_synthetic_annotations(graphs, rng, n_items=256)
    return TextPathData(
        annos, graphs, cands,
        view_db=H5FeatureDB(os.path.join(fts, "view_fts.hdf5")),
        grid_db=H5FeatureDB(os.path.join(fts, "grid_fts.hdf5"),
                            dtype=np.float16),
        depth_db=H5FeatureDB(os.path.join(fts, "depth.hdf5")),
        sem_db=H5FeatureDB(os.path.join(fts, "sem.hdf5"), dtype=np.uint8),
        image_feat_size=cfg.model.image_feat_size,
        max_txt_len=cfg.shapes.max_txt_len,
        bev_dim=cfg.model.bev_dim, bev_res=cfg.model.bev_res,
        num_views=cfg.shapes.num_views,
    )


def build_real_db(cfg, data_root, dataset, split="train", traj_files=None):
    import json as _json

    from ..data.annotations import read_annotation_file
    from ..data.feature_db import H5FeatureDB
    from ..data.nav_graph import build_scanvp_cands, load_nav_graphs
    from ..data.pathdata import TextPathData

    conn = os.path.join(data_root, "connectivity")
    graphs = load_nav_graphs(conn)
    cands_file = os.path.join(data_root, "scanvp_candview_relangles.json")
    if os.path.exists(cands_file):
        with open(cands_file) as f:
            cands = _json.load(f)
    else:
        cands = build_scanvp_cands(graphs)
    # explicit traj-file lists mirror the reference's
    # data_cfg.{train,val_*}_traj_files (train_r2r.py:164-193,
    # config/*_pretrain.json), so published pretrain annotations are
    # consumable unconverted; default falls back to the native layout
    annos = []
    if traj_files:
        for path in traj_files:
            annos += read_annotation_file(path)
    else:
        annos = read_annotation_file(
            os.path.join(data_root, f"{dataset}_{split}_enc.jsonl"))
    return TextPathData(
        annos, graphs, cands,
        view_db=H5FeatureDB(os.path.join(data_root, "view_fts.hdf5")),
        grid_db=H5FeatureDB(os.path.join(data_root, "grid_fts.hdf5"),
                            dtype=np.float16),
        depth_db=H5FeatureDB(os.path.join(data_root, "depth.hdf5")),
        sem_db=H5FeatureDB(os.path.join(data_root, "sem.hdf5"), dtype=np.uint8),
        image_feat_size=cfg.model.image_feat_size,
        obj_feat_size=cfg.model.obj_feat_size,
        obj_prob_size=cfg.model.obj_prob_size,
        max_txt_len=cfg.shapes.max_txt_len,
        bev_dim=cfg.model.bev_dim, bev_res=cfg.model.bev_res,
        num_views=cfg.shapes.num_views,
        dataset="r2r" if dataset in ("r2r", "r4r") else dataset,
    )


def main(argv=None):
    args = parse_args(argv)

    from ..configs import PretrainConfig, load_config
    from ..data.loader import PretrainLoader
    from ..parallel import make_mesh
    from ..pretrain import PretrainTrainer

    overrides = {}
    if args.num_workers is not None:
        overrides["num_workers"] = args.num_workers
    if args.batch_size:
        overrides["train_batch_size"] = args.batch_size
    if args.num_steps:
        overrides["optim.num_train_steps"] = args.num_steps
    overrides["seed"] = args.seed
    overrides["output_dir"] = args.output_dir
    cfg = load_config(PretrainConfig, args.config, **overrides)
    if args.tasks:
        cfg.tasks, cfg.mix_ratio = parse_task_ratio(args.tasks)
    if args.dataset in ("reverie", "soon") and cfg.model.obj_feat_size == 0:
        cfg.model.obj_feat_size = 768
        cfg.model.obj_prob_size = 1000

    if args.synthetic or not args.data_root:
        nav_db = build_synthetic_db(cfg, args.seed)
        val_db = nav_db
    else:
        nav_db = build_real_db(cfg, args.data_root, args.dataset, "train",
                               traj_files=_split_files(args.train_files))
        val_db = build_real_db(cfg, args.data_root, args.dataset, "val_unseen",
                               traj_files=_split_files(args.val_files))

    import jax

    # train_batch_size is per chip; the loader scales it to the global batch
    # (per_chip x n_dev), matching the reference's per-GPU batch under DDP
    n_dev = jax.device_count()
    mesh = make_mesh() if n_dev > 1 else None
    train_loader = PretrainLoader(nav_db, cfg, seed=cfg.seed, n_devices=n_dev,
                                  num_workers=cfg.num_workers)
    val_loader = PretrainLoader(
        val_db, cfg, seed=cfg.seed + 1, prefetch=0, n_devices=n_dev
    )
    trainer = PretrainTrainer(cfg, train_loader, {"val_unseen": val_loader}, mesh=mesh)

    if args.init_bert:
        from ..models.surgery import load_hf_bert, transfer_pretrained

        hf = load_hf_bert(cfg.model.lang_bert_name, cfg.model.num_l_layers)
        trainer.state = trainer.state.replace(
            params={
                **trainer.state.params,
                "bert": transfer_pretrained(hf, trainer.state.params["bert"]),
            }
        )
    if args.resume:
        trainer.restore(args.resume)

    trainer.train()
    trainer.save(int(trainer.state.step))


if __name__ == "__main__":
    main()
