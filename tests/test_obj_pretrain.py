"""REVERIE/SOON pretrain data path end-to-end: object annotations ->
TextPathData (pos_vps sampling, object tokens, act labels) -> static batches
-> mrc/og/sap losses through the model."""

import numpy as np
import pytest

from vln_bevbert_tpu.configs import ModelConfig, OptimConfig, PretrainConfig, ShapeConfig
from vln_bevbert_tpu.data.feature_db import H5FeatureDB, write_synthetic_features
from vln_bevbert_tpu.data.loader import PretrainLoader, make_synthetic_object_world
from vln_bevbert_tpu.data.nav_graph import (
    build_scanvp_cands,
    load_nav_graphs,
    write_synthetic_connectivity,
)
from vln_bevbert_tpu.data.pathdata import TextPathData
from vln_bevbert_tpu.nav.obj_env import ObjectDB

TINY = ModelConfig(
    vocab_size=30522, hidden_size=32, num_attention_heads=2, intermediate_size=64,
    num_l_layers=1, num_pano_layers=1, num_x_layers=1, image_feat_size=16,
    obj_feat_size=20, obj_prob_size=8, bev_grid_feat_size=12, bev_dim=5,
    bev_res=1.5, dtype="float32",
)
SHAPES = ShapeConfig(
    max_txt_len=48, max_steps=8, max_pano_len=40, max_gmap_len=24,
    max_local_len=8, max_objects=3, num_views=2, grid_hw=4, max_masked_tokens=6,
)


@pytest.fixture(scope="module")
def reverie_db(tmp_path_factory):
    root = tmp_path_factory.mktemp("reverie_world")
    rng = np.random.default_rng(5)
    write_synthetic_connectivity(str(root / "conn"), rng, n_scans=1, n_nodes=10)
    graphs = load_nav_graphs(str(root / "conn"))
    cands = build_scanvp_cands(graphs)
    paths = write_synthetic_features(
        str(root / "fts"), rng,
        {s: g.node_ids for s, g in graphs.items()},
        image_feat_size=TINY.image_feat_size,
        grid_feat_size=TINY.bev_grid_feat_size,
        grid_hw=SHAPES.grid_hw, num_views=SHAPES.num_views,
    )
    annos, obj_data, obj2vps = make_synthetic_object_world(
        graphs, rng, n_items=10,
        obj_feat_size=TINY.obj_feat_size, obj_prob_size=TINY.obj_prob_size,
    )
    nav_db = TextPathData(
        annos, graphs, cands,
        view_db=H5FeatureDB(paths["img_ft"]),
        grid_db=H5FeatureDB(paths["rgb"]),
        depth_db=H5FeatureDB(paths["depth"]),
        sem_db=H5FeatureDB(paths["sem"]),
        obj_db=ObjectDB(obj_data),
        image_feat_size=TINY.image_feat_size,
        obj_feat_size=TINY.obj_feat_size,
        obj_prob_size=TINY.obj_prob_size,
        max_objects=SHAPES.max_objects,
        max_txt_len=SHAPES.max_txt_len,
        bev_dim=TINY.bev_dim, bev_res=1.5, num_views=SHAPES.num_views,
        dataset="reverie",
    )
    return nav_db, obj2vps


def test_reverie_example_structure(reverie_db):
    nav_db, obj2vps = reverie_db
    rng = np.random.default_rng(0)
    ex = nav_db.get_input(0, "pos", rng, return_act_label=True,
                          return_obj_label=True, return_obj_probs=True)
    # pos end-vp: the path ends at an object-visible viewpoint -> stop labels
    assert ex.global_act_label == 0 and ex.local_act_label == 0
    assert ex.traj_obj_fts is not None
    assert ex.obj_label == 0  # objId is the first object at the goal
    assert ex.obj_probs is not None and ex.obj_probs.shape[1] == TINY.obj_prob_size
    np.testing.assert_allclose(ex.obj_probs.sum(1), 1.0, atol=1e-5)
    # negative end-vp types work and give non-stop labels or ignore
    ex2 = nav_db.get_input(0, "neg_others", rng, return_act_label=True)
    assert ex2.global_act_label != 0 or ex2.local_act_label != 0


@pytest.mark.slow
def test_reverie_pretrain_tasks_run(reverie_db):
    import jax

    nav_db, _ = reverie_db
    cfg = PretrainConfig(
        model=TINY, shapes=SHAPES,
        optim=OptimConfig(warmup_steps=1, num_train_steps=8),
        tasks=("mlm", "mrc", "sap", "og", "masksem"),
        mix_ratio=(1, 1, 1, 1, 1), train_batch_size=2,
    )
    loader = PretrainLoader(nav_db, cfg, prefetch=0)
    from vln_bevbert_tpu.parallel import init_pretrain_state, make_pretrain_step

    seen = set()
    it = iter(loader)
    task0, batch0 = next(it)
    model, projector, state = init_pretrain_state(cfg, batch0)
    step = make_pretrain_step(model, projector, None)
    state, m = step(state, batch0, jax.random.key(0), task0.split("_")[0])
    seen.add(task0.split("_")[0])
    for _ in range(7):
        task, batch = next(it)
        base = task.split("_")[0]
        state, m = step(state, batch, jax.random.key(0), base)
        assert np.isfinite(float(m["loss"])), task
        seen.add(base)
    assert {"mrc", "og"} & seen, seen
