"""CE eval-mode control integration, leaderboard writers, ckpt-dir eval."""

import json
import os

import numpy as np
import pytest

from vln_bevbert_tpu.ce.agent import CEAgent
from vln_bevbert_tpu.ce.env import SyntheticContinuousEnv, make_synthetic_ce_episodes
from vln_bevbert_tpu.ce.inference import (
    evaluate_checkpoint_dir,
    run_inference,
)
from vln_bevbert_tpu.configs import FinetuneConfig, ModelConfig, ShapeConfig

TINY = ModelConfig(
    vocab_size=30522, hidden_size=32, num_attention_heads=2, intermediate_size=64,
    num_l_layers=1, num_pano_layers=1, num_x_layers=1, image_feat_size=16,
    obj_feat_size=0, bev_grid_feat_size=12, bev_dim=5, bev_res=1.5,
    dtype="float32",
)
SHAPES = ShapeConfig(
    max_txt_len=64, max_steps=5, max_pano_len=20, max_gmap_len=16,
    max_local_len=8, max_objects=0, num_views=12, grid_hw=4, max_pc_steps=3,
)


@pytest.fixture(scope="module")
def ce_ctrl_world():
    rng = np.random.default_rng(5)
    episodes = make_synthetic_ce_episodes(rng, n=4)
    env = SyntheticContinuousEnv(
        episodes, batch_size=2, num_views=12, grid_hw=4,
        grid_feat_size=TINY.bev_grid_feat_size,
        view_feat_size=TINY.image_feat_size,
        depth_feat_shape=(4, 2, 2),
        obstacles=[(3.0, 3.0, 0.4)],
    )
    cfg = FinetuneConfig(model=TINY, shapes=SHAPES, batch_size=2,
                         max_action_len=3, learning_rate=1e-3,
                         ce_back_algo="control", ce_tryout=True)
    agent = CEAgent(cfg, env)
    agent.init_params()
    return env, agent


def test_eval_rollout_through_control(ce_ctrl_world):
    """Eval rollouts execute turn-discretized control (not teleports): walked
    paths are unit-step resolution and metrics stay finite."""
    env, agent = ce_ctrl_world
    env.reset_epoch()
    trajs, _ = agent.rollout(feedback="argmax", train=False)
    moved = False
    for tr in trajs:
        pos = np.asarray(tr["positions"])
        assert len(tr["headings"]) == len(pos)
        if len(pos) > 1:
            steps = np.linalg.norm(np.diff(pos, axis=0), axis=1)
            moved = moved or len(steps) > 0
            # control moves in forward_unit steps (plus teleport-free): no
            # single hop may exceed a few metres in one entry unless it was
            # an explicit front-node teleport with empty back path
            assert steps.max() < 5.0
            # most motion increments are the 0.25m unit step
            near_unit = np.abs(steps - env.forward_unit) < 1e-6
            assert near_unit.mean() > 0.5
    assert moved
    metrics = agent.evaluate(num_batches=1)
    assert all(np.isfinite(v) for v in metrics.values())


@pytest.mark.slow
def test_train_rollout_still_teleports(ce_ctrl_world):
    env, agent = ce_ctrl_world
    _, loss = agent.rollout(feedback="teacher", train=True)
    assert loss is not None and np.isfinite(loss)


def test_run_inference_r2r_and_rxr(ce_ctrl_world, tmp_path):
    env, agent = ce_ctrl_world
    r2r_file = str(tmp_path / "preds_r2r.json")
    path_eps = run_inference(agent, r2r_file, task_type="r2r", max_batches=4)
    assert os.path.exists(r2r_file)
    data = json.load(open(r2r_file))
    assert set(data) == set(path_eps) and len(data) == env.size()
    ep = next(iter(data.values()))
    assert all(set(e) == {"position", "heading"} for e in ep)
    assert all(len(e["position"]) == 3 for e in ep)

    rxr_file = str(tmp_path / "preds_rxr.jsonl")
    run_inference(agent, rxr_file, task_type="rxr", max_batches=4)
    lines = [json.loads(l) for l in open(rxr_file)]
    assert len(lines) == env.size()
    ids = [l["instruction_id"] for l in lines]
    assert ids == sorted(ids)
    for l in lines:
        # consecutive duplicates removed
        for a, b in zip(l["path"], l["path"][1:]):
            assert a != b


def test_evaluate_checkpoint_dir(ce_ctrl_world, tmp_path):
    env, agent = ce_ctrl_world
    ckpt_dir = tmp_path / "ckpts"
    os.makedirs(ckpt_dir)
    agent.save_ckpt(str(ckpt_dir / "ckpt_10"))
    agent.save_ckpt(str(ckpt_dir / "ckpt_2"))
    out_dir = tmp_path / "evals"
    results = evaluate_checkpoint_dir(
        agent, str(ckpt_dir), str(out_dir), num_batches=1
    )
    assert list(results) == ["ckpt_2", "ckpt_10"]  # step order, not lexical
    for name, m in results.items():
        assert os.path.exists(out_dir / f"stats_{name}_val_unseen.json")
        assert np.isfinite(m["success"])
    # second run skips (reads back the stats files)
    again = evaluate_checkpoint_dir(
        agent, str(ckpt_dir), str(out_dir), num_batches=1
    )
    assert again.keys() == results.keys()


@pytest.mark.slow
def test_ce_cli_with_real_format_episodes(tmp_path):
    """cli.ce_train --data_path consumes a release-format json.gz and runs
    eval over it (the dataset-loader -> env -> agent path)."""
    import gzip
    import json

    import numpy as np

    from vln_bevbert_tpu.cli import ce_train

    eps = []
    rng = np.random.default_rng(0)
    for i in range(4):
        start = [float(rng.uniform(0, 5)), 0.0, float(rng.uniform(0, 5))]
        path = [start]
        for _ in range(2):
            p = path[-1]
            path.append([p[0] + float(rng.uniform(1, 2)), 0.0,
                         p[2] + float(rng.uniform(1, 2))])
        eps.append({
            "episode_id": i, "trajectory_id": i,
            "scene_id": "mp3d/S/S.glb",
            "start_position": start,
            "start_rotation": [0.0, 0.0, 0.0, 1.0],
            "goals": [{"position": path[-1], "radius": 3.0}],
            "reference_path": path,
            "instruction": {"instruction_text": "go",
                            "instruction_tokens":
                                rng.integers(2000, 4000, 12).tolist()},
        })
    data_path = tmp_path / "val_unseen.json.gz"
    with gzip.open(data_path, "wt") as f:
        json.dump({"episodes": eps, "instruction_vocab": {"word_list": []}}, f)

    cfg = tmp_path / "cfg.json"
    cfg.write_text(json.dumps({
        "model": {"vocab_size": 30522, "hidden_size": 32,
                  "num_attention_heads": 2, "intermediate_size": 64,
                  "num_l_layers": 1, "num_pano_layers": 1, "num_x_layers": 1,
                  "image_feat_size": 16, "bev_grid_feat_size": 12,
                  "bev_dim": 5, "bev_res": 1.5, "dtype": "float32"},
        "shapes": {"max_txt_len": 32, "max_steps": 4, "max_pano_len": 16,
                   "max_gmap_len": 12, "max_local_len": 8, "max_objects": 0,
                   "num_views": 12, "grid_hw": 4, "max_pc_steps": 3},
        "batch_size": 2, "max_action_len": 3,
    }))
    out = tmp_path / "run"
    ce_train.main([
        "--config", str(cfg), "--data_path", str(data_path),
        "--run_type", "eval", "--eval_batches", "1",
        "--output_dir", str(out), "--seed", "0", "--allow_random_frozen",
    ])
    metrics = [json.loads(l)
               for l in (out / "metrics.jsonl").read_text().splitlines()]
    assert any("eval/success" in m for m in metrics)
