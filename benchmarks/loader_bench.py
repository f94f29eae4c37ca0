"""Host data-pipeline throughput at the flagship pretrain scale.

Measures PretrainLoader.build_batch (nav_db example synthesis +
static-shape batch packing) producing flagship batches — the host side that
must feed the ~454 samples/s device step (bench.py). The reference's
equivalent is the torch DataLoader worker path
(/root/reference/pretrain_src/data/loader.py:149-164 over
dataset.py:489-578), which SURVEY.md §3.1 names as its bottleneck too.

World: synthetic MP3D-scale fixtures — scans of ~100 viewpoints with
flagship feature shapes (36x768 views, 12x196x768 fp16 grids, 14x14 depth /
semantics), R2R-length paths — so the numbers isolate pipeline code cost
from disk layout.

Usage:
  python benchmarks/loader_bench.py [--steps 4] [--workers N] [--profile]

Prints one JSON line:
  {"loader_samples_per_sec": ..., "per_core": ..., "workers": N,
   "batch": B, "steps": S}
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_world(tmp: str, n_scans: int = 3, n_nodes: int = 100,
                n_items: int = 256, seed: int = 0):
    from vln_bevbert_tpu.configs import PretrainConfig
    from vln_bevbert_tpu.data.feature_db import (
        H5FeatureDB,
        write_synthetic_features,
    )
    from vln_bevbert_tpu.data.loader import make_synthetic_annotations
    from vln_bevbert_tpu.data.nav_graph import (
        build_scanvp_cands,
        write_synthetic_connectivity,
    )
    from vln_bevbert_tpu.data.pathdata import TextPathData

    cfg = PretrainConfig()  # flagship R2R defaults
    rng = np.random.default_rng(seed)
    graphs = write_synthetic_connectivity(
        os.path.join(tmp, "conn"), rng, n_scans=n_scans, n_nodes=n_nodes
    )
    paths = write_synthetic_features(
        os.path.join(tmp, "feats"), rng,
        {s: g.node_ids for s, g in graphs.items()},
        image_feat_size=cfg.model.image_feat_size,
        grid_feat_size=cfg.model.bev_grid_feat_size,
        grid_hw=cfg.shapes.grid_hw, num_views=cfg.shapes.num_views,
    )
    annos = make_synthetic_annotations(
        graphs, rng, n_items=n_items, min_len=4,
        max_len=7, txt_len=(20, 60),
    )
    nav_db = TextPathData(
        annos, graphs, build_scanvp_cands(graphs),
        view_db=H5FeatureDB(paths["img_ft"]),
        grid_db=H5FeatureDB(paths["rgb"], dtype=np.float16),
        depth_db=H5FeatureDB(paths["depth"]),
        sem_db=H5FeatureDB(paths["sem"], dtype=np.uint8),
        image_feat_size=cfg.model.image_feat_size,
        angle_feat_size=cfg.model.angle_feat_size,
        max_txt_len=cfg.shapes.max_txt_len,
        bev_dim=cfg.model.bev_dim, bev_res=cfg.model.bev_res,
        num_views=cfg.shapes.num_views,
    )
    return cfg, nav_db


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=4,
                    help="batches to time (after 1 warmup for cache fills)")
    ap.add_argument("--workers", type=int, default=0,
                    help=">0: time the process-pool path with N workers")
    ap.add_argument("--batch", type=int, default=None,
                    help="global batch size (default: flagship per-chip 16)")
    ap.add_argument("--profile", action="store_true",
                    help="cProfile one batch build and print the top sinks")
    args = ap.parse_args()

    with tempfile.TemporaryDirectory() as tmp:
        cfg, nav_db = build_world(tmp)
        if args.batch:
            cfg.train_batch_size = args.batch
        from vln_bevbert_tpu.data.loader import PretrainLoader

        loader = PretrainLoader(nav_db, cfg, seed=0,
                                num_workers=args.workers)
        B = loader.global_batch_size

        if args.profile:
            import cProfile
            import pstats

            loader.build_batch(0)  # warm caches
            prof = cProfile.Profile()
            prof.enable()
            for s in range(args.steps):
                loader.build_batch(s + 1)
            prof.disable()
            stats = pstats.Stats(prof, stream=sys.stderr)
            stats.sort_stats("cumulative").print_stats(30)

        if args.workers > 0:
            it = iter(loader)
            next(it)  # warmup: workers up, caches filling
            t0 = time.time()
            for _ in range(args.steps):
                next(it)
            dt = time.time() - t0
        else:
            loader.build_batch(0)  # warmup: LRU/caches fill
            t0 = time.time()
            for s in range(args.steps):
                loader.build_batch(s + 1)
            dt = time.time() - t0

        sps = args.steps * B / dt
        print(json.dumps({
            "loader_samples_per_sec": round(sps, 3),
            "sec_per_batch": round(dt / args.steps, 3),
            "workers": args.workers,
            "batch": B,
            "steps": args.steps,
        }))


if __name__ == "__main__":
    main()
