"""REVERIE/SOON object-navigation stack tests."""

import numpy as np
import pytest

from vln_bevbert_tpu.configs import FinetuneConfig, ModelConfig, ShapeConfig
from vln_bevbert_tpu.data.feature_db import H5FeatureDB, write_synthetic_features
from vln_bevbert_tpu.data.loader import make_synthetic_annotations
from vln_bevbert_tpu.data.nav_graph import (
    build_scanvp_cands,
    load_nav_graphs,
    write_synthetic_connectivity,
)
from vln_bevbert_tpu.nav.agent import GMapNavAgent
from vln_bevbert_tpu.nav.obj_env import (
    ObjectDB,
    ReverieObjectNavBatch,
    SoonObjectNavBatch,
    point_in_convex_quad,
)

TINY = ModelConfig(
    vocab_size=30522, hidden_size=32, num_attention_heads=2, intermediate_size=64,
    num_l_layers=1, num_pano_layers=1, num_x_layers=1, image_feat_size=16,
    obj_feat_size=20, obj_prob_size=8, bev_grid_feat_size=12, bev_dim=5,
    bev_res=1.5, dtype="float32",
)
SHAPES = ShapeConfig(
    max_txt_len=48, max_steps=5, max_pano_len=40, max_gmap_len=16,
    max_local_len=8, max_objects=3, num_views=2, grid_hw=4, max_pc_steps=3,
)


def test_point_in_convex_quad():
    quad = [(0, 0), (2, 0), (2, 2), (0, 2)]
    assert point_in_convex_quad((1, 1), quad)
    assert not point_in_convex_quad((3, 1), quad)
    # reversed winding also works
    assert point_in_convex_quad((1, 1), quad[::-1])


@pytest.fixture(scope="module")
def obj_world(tmp_path_factory):
    root = tmp_path_factory.mktemp("obj_world")
    rng = np.random.default_rng(11)
    write_synthetic_connectivity(str(root / "conn"), rng, n_scans=1, n_nodes=8)
    graphs = load_nav_graphs(str(root / "conn"))
    cands = build_scanvp_cands(graphs)
    paths = write_synthetic_features(
        str(root / "fts"), rng,
        {s: g.node_ids for s, g in graphs.items()},
        image_feat_size=TINY.image_feat_size,
        grid_feat_size=TINY.bev_grid_feat_size,
        grid_hw=SHAPES.grid_hw, num_views=SHAPES.num_views,
    )
    # objects: 2 per viewpoint, ids unique per scan
    obj_data, obj2vps = {}, {}
    oid = 0
    for scan, g in graphs.items():
        for vp in g.node_ids:
            ids = [str(oid), str(oid + 1)]
            oid += 2
            obj_data[f"{scan}_{vp}"] = {
                "fts": rng.normal(size=(2, TINY.obj_feat_size + TINY.obj_prob_size)).astype(np.float32),
                "directions": rng.uniform(-1, 1, (2, 2)).astype(np.float32),
                "sizes": rng.uniform(20, 100, (2, 2)).astype(np.float32),
                "obj_ids": ids,
            }
            for i in ids:
                obj2vps[f"{scan}_{i}"] = [vp]
    annos = make_synthetic_annotations(graphs, rng, n_items=6, min_len=2, max_len=4)
    for a in annos:
        scan, goal = a["scan"], a["path"][-1]
        a["objId"] = obj_data[f"{scan}_{goal}"]["obj_ids"][0]
        a["end_vps"] = [goal]
    env = ReverieObjectNavBatch(
        annos, graphs, cands,
        view_db=H5FeatureDB(paths["img_ft"]),
        grid_db=H5FeatureDB(paths["rgb"]),
        depth_db=H5FeatureDB(paths["depth"]),
        batch_size=2,
        image_feat_size=TINY.image_feat_size,
        obj_db=ObjectDB(obj_data),
        obj2vps=obj2vps,
        max_objects=SHAPES.max_objects,
    )
    cfg = FinetuneConfig(model=TINY, shapes=SHAPES, batch_size=2,
                         max_action_len=4, learning_rate=1e-3, dataset="reverie")
    agent = GMapNavAgent(cfg, env)
    agent.init_params()
    return env, agent, obj2vps


def test_obj_obs(obj_world):
    env, _, _ = obj_world
    obs = env.reset()
    for ob in obs:
        assert len(ob["obj_ids"]) == 2
        assert ob["obj_img_fts"].shape[1] == TINY.obj_feat_size + TINY.obj_prob_size
        assert ob["gt_obj_id"] is not None


@pytest.mark.slow
def test_obj_rollout_and_learn(obj_world):
    env, agent, _ = obj_world
    trajs, loss = agent.rollout(feedback="teacher", train=True)
    assert loss is not None and np.isfinite(loss)
    # teacher trajectories include gt paths; pred_objid is populated
    assert all("pred_objid" in t for t in trajs)


def test_obj_eval_metrics(obj_world):
    env, agent, obj2vps = obj_world
    preds = agent.test(max_batches=2)
    avg, _ = env.eval_metrics(preds)
    for key in ("sr", "spl", "rgs", "rgspl", "oracle_sr"):
        assert key in avg and np.isfinite(avg[key])


def test_soon_eval_item(obj_world):
    env, _, _ = obj_world
    scan = list(env.graphs)[0]
    g = env.graphs[scan]
    soon = SoonObjectNavBatch.__new__(SoonObjectNavBatch)
    soon.graphs = env.graphs
    a, b = g.node_ids[0], g.node_ids[2]
    gt_item = {
        "scan": scan,
        "path": g.path(a, b),
        "bboxes": {
            b: {
                "heading": 0.5, "elevation": 0.1,
                "target": {
                    "left_top": {"heading": 0.3, "elevation": 0.3},
                    "right_top": {"heading": 0.7, "elevation": 0.3},
                    "right_bottom": {"heading": 0.7, "elevation": -0.1},
                    "left_bottom": {"heading": 0.3, "elevation": -0.1},
                },
            }
        },
    }
    # walked exactly to the goal, predicted direction inside the bbox
    pred_path = [[a]] + [[vp] for vp in g.path(a, b)]
    scores = soon.eval_soon_item(pred_path, 0.5, 0.1, gt_item)
    assert scores["det_success"] and scores["success"]
    assert scores["nav_error"] == 0
    # direction outside the bbox
    scores2 = soon.eval_soon_item(pred_path, 2.0, 0.1, gt_item)
    assert not scores2["det_success"]
