"""Fine-tuning stack integration tests on the synthetic world: graph sim,
GraphMap bookkeeping, rollout-then-replay DAgger agent, metrics."""

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
from vln_bevbert_tpu.nav.env import R2RNavBatch
from vln_bevbert_tpu.nav.eval_utils import compute_cls, compute_dtw_metrics
from vln_bevbert_tpu.nav.graph_map import FloydGraph

TINY = ModelConfig(
    vocab_size=30522, hidden_size=32, num_attention_heads=2, intermediate_size=64,
    num_l_layers=1, num_pano_layers=1, num_x_layers=1, image_feat_size=16,
    obj_feat_size=0, bev_grid_feat_size=12, bev_dim=5, bev_res=1.5,
    dtype="float32",
)
SHAPES = ShapeConfig(
    max_txt_len=64, max_steps=6, max_pano_len=40, max_gmap_len=16,
    max_local_len=8, max_objects=0, num_views=4, grid_hw=4, max_pc_steps=4,
)


@pytest.fixture(scope="module")
def nav_world(tmp_path_factory):
    root = tmp_path_factory.mktemp("nav_world")
    rng = np.random.default_rng(7)
    write_synthetic_connectivity(str(root / "conn"), rng, n_scans=1, n_nodes=9)
    graphs = load_nav_graphs(str(root / "conn"))
    cands = build_scanvp_cands(graphs)
    paths = write_synthetic_features(
        str(root / "fts"), rng,
        {s: g.node_ids for s, g in graphs.items()},
        image_feat_size=TINY.image_feat_size,
        grid_feat_size=TINY.bev_grid_feat_size,
        grid_hw=SHAPES.grid_hw, num_views=SHAPES.num_views,
    )
    annos = make_synthetic_annotations(graphs, rng, n_items=6, min_len=2, max_len=4)
    env = R2RNavBatch(
        annos, graphs, cands,
        view_db=H5FeatureDB(paths["img_ft"]),
        grid_db=H5FeatureDB(paths["rgb"]),
        depth_db=H5FeatureDB(paths["depth"]),
        batch_size=2,
        image_feat_size=TINY.image_feat_size,
    )
    cfg = FinetuneConfig(model=TINY, shapes=SHAPES, batch_size=2,
                         max_action_len=6, learning_rate=1e-3)
    agent = GMapNavAgent(cfg, env)
    agent.init_params()
    return env, agent


def test_floyd_graph_shortest_paths():
    g = FloydGraph()
    g.add_edge("a", "b", 1.0)
    g.add_edge("b", "c", 1.0)
    g.add_edge("a", "c", 5.0)
    for node in ("a", "b", "c"):
        g.update(node)
    assert g.distance("a", "c") == pytest.approx(2.0)
    assert g.path("a", "c") == ["b", "c"]
    assert g.path("a", "a") == []


def test_dtw_cls_identity():
    dist = lambda a, b: 0.0 if a == b else 5.0
    ref = ["a", "b", "c"]
    out = compute_dtw_metrics(dist, ref, ref)
    assert out["DTW"] == 0 and out["nDTW"] == 1 and out["SDTW"] == 1
    assert compute_cls(dist, ref, ref) == pytest.approx(1.0)


def test_env_obs_structure(nav_world):
    env, _ = nav_world
    obs = env.reset()
    assert len(obs) == 2
    for ob in obs:
        assert ob["feature"].shape == (36, TINY.image_feat_size + 4)
        assert ob["rgb"].shape[0] == SHAPES.num_views
        assert ob["depth"].shape == (SHAPES.num_views, 4, 4)
        for cand in ob["candidate"]:
            assert cand["viewpointId"] in env.graphs[ob["scan"]].neighbors(
                ob["viewpoint"]
            )
    # teleport moves the sim
    target = obs[0]["candidate"][0]["viewpointId"]
    env.teleport(0, target, 0.5)
    obs2 = env.get_obs()
    assert obs2[0]["viewpoint"] == target


def test_teacher_rollout_follows_gt_and_learns(nav_world):
    env, agent = nav_world
    trajs, loss = agent.rollout(feedback="teacher", train=True)
    assert loss is not None and np.isfinite(loss)
    # teacher-forced trajectories replicate the ground-truth paths
    by_id = {t["instr_id"]: sum(t["path"], []) for t in trajs}
    for item in env.batch:
        walked = by_id[item["instr_id"]]
        gt = item["path"]
        assert walked[: len(gt)] == gt, (walked, gt)


def test_sample_rollout_updates_params(nav_world):
    env, agent = nav_world
    import jax

    before = jax.tree.map(np.asarray, agent.params)
    losses = agent.train_iters(1, feedback="sample")
    assert losses and all(np.isfinite(l) for l in losses)
    after = agent.params
    changed = any(
        not np.allclose(a, b)
        for a, b in zip(jax.tree.leaves(before), jax.tree.leaves(after))
    )
    assert changed


def test_eval_metrics_teacher_is_perfect(nav_world):
    env, agent = nav_world
    env.reset_epoch()
    trajs, _ = agent.rollout(feedback="teacher", train=False)
    preds = [
        {"instr_id": t["instr_id"], "trajectory": t["path"]} for t in trajs
    ]
    avg, _ = env.eval_metrics(preds)
    # the walked path contains the goal (teacher forcing), so the oracle
    # metrics are perfect; final SR depends on the stop-node redirect
    # (ref agent.py:602-615), which is untrained here
    assert avg["oracle_sr"] == 100.0
    assert avg["oracle_error"] == 0.0
    assert 0.0 <= avg["sr"] <= 100.0
    assert avg["nDTW"] > 0.0


def test_argmax_eval_runs(nav_world):
    env, agent = nav_world
    preds = agent.test(max_batches=3)
    assert preds
    avg, _ = env.eval_metrics(preds)
    assert 0 <= avg["sr"] <= 100
    assert avg["nav_error"] >= 0


def test_ndtw_expert_policy(nav_world):
    """R4R-style fidelity expert: teacher targets come from nDTW deltas
    (ref _teacher_action_r4r expert_policy=ndtw, agent.py:400-406)."""
    env, agent = nav_world
    orig = agent.cfg.expert_policy
    agent.cfg.expert_policy = "ndtw"
    try:
        trajs, loss = agent.rollout(feedback="sample", train=True)
        assert loss is not None and np.isfinite(loss)
    finally:
        agent.cfg.expert_policy = orig


def test_expl_sample_rollout(nav_world):
    """expl_sample feedback: argmax policy with epsilon exploration over
    actionable map nodes (ref agent.py:569-580)."""
    env, agent = nav_world
    env.reset_epoch()
    trajs, loss = agent.rollout(feedback="expl_sample", train=True)
    assert len(trajs) == 2
    assert loss is None or np.isfinite(loss)
    assert all(len(t["path"]) >= 1 for t in trajs)


def test_act_visited_nodes_masks(nav_world):
    """--act_visited_nodes: only the current node is 'visited', previously
    visited nodes remain actionable (ref agent.py:205-210)."""
    import dataclasses

    env, agent = nav_world
    env.reset_epoch()
    obs = env.reset()
    from vln_bevbert_tpu.nav.graph_map import GraphMap

    gmaps = [GraphMap(ob["viewpoint"]) for ob in obs]
    for ob, g in zip(obs, gmaps):
        g.update_graph(ob)
    T, V = agent.cfg.max_action_len, agent.num_pano_slots
    store = {"view_lens": np.zeros((T, len(obs)), np.int32)}
    default = agent._nav_gmap_variable(obs, gmaps, store)
    agent.cfg = dataclasses.replace(agent.cfg, act_visited_nodes=True)
    try:
        avn = agent._nav_gmap_variable(obs, gmaps, store)
    finally:
        agent.cfg = dataclasses.replace(agent.cfg, act_visited_nodes=False)
    # with act_visited_nodes exactly one non-stop slot is marked visited
    assert avn["gmap_visited_masks"][:, 1:].sum(-1).tolist() == [1, 1]
    assert (avn["gmap_visited_masks"].sum(-1)
            <= default["gmap_visited_masks"].sum(-1)).all()
