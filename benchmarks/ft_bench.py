"""Full-scale fine-tuning throughput on TPU: nav steps/sec (BASELINE.md's
second headline hook)."""
import os, sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time, numpy as np, jax
from vln_bevbert_tpu.utils.cache import enable_persistent_cache
enable_persistent_cache("/tmp/jax_cache")

from vln_bevbert_tpu.configs import FinetuneConfig, ModelConfig, ShapeConfig
from vln_bevbert_tpu.data.feature_db import H5FeatureDB, write_synthetic_features
from vln_bevbert_tpu.data.loader import make_synthetic_annotations
from vln_bevbert_tpu.data.nav_graph import build_scanvp_cands, load_nav_graphs, write_synthetic_connectivity
from vln_bevbert_tpu.nav.agent import GMapNavAgent
from vln_bevbert_tpu.nav.env import R2RNavBatch

root = "/tmp/ftbench_world"
rng = np.random.default_rng(0)
import os
if not os.path.exists(root + "/conn/scans.txt"):
    write_synthetic_connectivity(root + "/conn", rng, n_scans=2, n_nodes=24)
graphs = load_nav_graphs(root + "/conn")
cands = build_scanvp_cands(graphs)
cfg = FinetuneConfig()  # full scale: 768 hidden, bev 21, batch 4
cfg.max_action_len = 15
if not os.path.exists(root + "/fts/view_fts.hdf5"):
    write_synthetic_features(root + "/fts", rng,
        {s: g.node_ids for s, g in graphs.items()},
        image_feat_size=cfg.model.image_feat_size,
        grid_feat_size=cfg.model.bev_grid_feat_size,
        grid_hw=cfg.shapes.grid_hw, num_views=cfg.shapes.num_views)
annos = make_synthetic_annotations(graphs, rng, n_items=64)
env = R2RNavBatch(annos, graphs, cands,
    view_db=H5FeatureDB(root + "/fts/view_fts.hdf5"),
    grid_db=H5FeatureDB(root + "/fts/grid_fts.hdf5"),
    depth_db=H5FeatureDB(root + "/fts/depth.hdf5"),
    batch_size=cfg.batch_size, image_feat_size=cfg.model.image_feat_size)
agent = GMapNavAgent(cfg, env)
t0 = time.time()
agent.init_params()
print(f"init {time.time()-t0:.0f}s", flush=True)

# warm-up rollout compiles language/pano/lift/splat/nav/replay programs
t0 = time.time()
trajs, loss = agent.rollout(feedback="sample", train=True)
print(f"first rollout+learn {time.time()-t0:.0f}s loss={loss:.3f}", flush=True)

n_roll = 4
t0 = time.time()
total_steps = 0
for _ in range(n_roll):
    trajs, loss = agent.rollout(feedback="sample", train=True)
    total_steps += sum(len(t["path"]) - 1 for t in trajs)
dt = time.time() - t0
print(f"{n_roll} train rollouts in {dt:.1f}s -> "
      f"{n_roll*cfg.batch_size/dt:.2f} episodes/s, "
      f"{total_steps/dt:.1f} nav steps/s (B={cfg.batch_size}) loss={loss:.3f}",
      flush=True)
