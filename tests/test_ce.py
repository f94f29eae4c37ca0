"""Continuous-environment (R2R-CE) stack tests: habitat-convention geometry,
ghost-node graph map, waypoint predictor, synthetic env, SS rollout."""

import math

import numpy as np
import pytest

from vln_bevbert_tpu.ce.env import (
    CEEpisode,
    SyntheticContinuousEnv,
    make_synthetic_ce_episodes,
)
from vln_bevbert_tpu.ce.geometry_ce import (
    estimate_cand_pos,
    heading_from_quaternion,
    quaternion_from_heading,
)
from vln_bevbert_tpu.ce.graph_map import CEGraphMap
from vln_bevbert_tpu.ce.waypoint_predictor import (
    NUM_ANGLES,
    NUM_CLASSES,
    WaypointPredictor,
    extract_waypoints,
    nms_peaks,
    ring_neighbor_bias,
)
from vln_bevbert_tpu.configs import FinetuneConfig, ModelConfig, ShapeConfig


def test_quaternion_heading_roundtrip():
    for h in [0.0, 0.5, math.pi, 5.5]:
        q = quaternion_from_heading(h)
        assert heading_from_quaternion(q) == pytest.approx(h % (2 * math.pi), abs=1e-6)


def test_estimate_cand_pos():
    pos = np.array([1.0, 0.0, 2.0])
    ori = quaternion_from_heading(0.0)
    # heading 0 faces -z: a candidate at relative angle 0, distance 2 is at z-2
    out = estimate_cand_pos(pos, ori, [0.0], [2.0])
    np.testing.assert_allclose(out[0], [1.0, 0.0, 0.0], atol=1e-6)
    # relative angle pi/2 (counter-clockwise in habitat) -> -x direction
    out = estimate_cand_pos(pos, ori, [math.pi / 2], [2.0])
    np.testing.assert_allclose(out[0], [-1.0, 0.0, 2.0], atol=1e-6)


def test_ghost_graph_map_merge_and_fronts():
    g = CEGraphMap(loc_noise=0.5, merge_ghost=True)
    ori = quaternion_from_heading(0.0)
    pos0 = np.array([0.0, 0.0, 0.0])
    cur, cand_vp, cand_pos = g.identify_node(pos0, ori, [0.0, math.pi], [2.0, 2.0])
    assert cur == "0" and len(cand_pos) == 2
    assigns = g.update_graph(None, 1, cur, pos0, None, cand_vp, cand_pos,
                             [np.ones(4), np.ones(4)])
    assert all(a.startswith("g") for a in assigns)
    assert len(g.ghost_mean_pos) == 2
    # revisit from a new node: a candidate near ghost 0 merges into it
    pos1 = np.array([0.5, 0.0, 0.0])
    cur1, cvp1, cpos1 = g.identify_node(pos1, ori, [0.3], [1.9])
    assigns1 = g.update_graph(cur, 2, cur1, pos1, None, cvp1, cpos1, [np.ones(4)])
    total_sightings = sum(g.ghost_embeds[gv][1] for gv in g.ghost_embeds)
    assert total_sightings == 3
    # fronts recorded; front_to_ghost_dist returns a real node
    for gvp in g.ghost_mean_pos:
        d, front = g.front_to_ghost_dist(gvp)
        assert front in g.node_pos and d > 0
    # a candidate landing on an existing node connects instead of ghosting
    pos2 = np.array([4.0, 0.0, 0.0])
    cur2, cvp2, cpos2 = g.identify_node(pos2, ori, [math.pi / 2], [4.0])
    assigns2 = g.update_graph(cur1, 3, cur2, pos2, None, cvp2, cpos2, [np.ones(4)])
    assert assigns2[0] == "0"  # candidate at origin localises to node 0
    assert g.graph.distance(cur2, "0") <= 4.01


def test_ring_neighbor_bias():
    b = ring_neighbor_bias(12, 1)[0, 0]
    assert b[0, 0] == 0 and b[0, 1] == 0 and b[0, 11] == 0
    assert b[0, 2] < -9999 and b[5, 9] < -9999


def test_nms_peaks_and_extract():
    heat = np.full((1, NUM_ANGLES, NUM_CLASSES), -10.0, np.float32)
    heat[0, 10, 3] = 5.0
    heat[0, 60, 8] = 4.0
    heat[0, 11, 3] = 4.5  # should be suppressed (within sigma of peak 1)
    angles, dists, scores = extract_waypoints(heat)
    deg = np.round(np.degrees(angles[0]), 5)
    # reference NMS keeps max_predictions peaks in angle order, so the two
    # real peaks are present, the suppressed neighbour is not
    assert len(deg) <= 5
    assert 30.0 in deg and 180.0 in deg and 33.0 not in deg
    assert (3 + 1) * 0.25 in np.round(dists[0], 3)
    # the real peaks carry the dominant scores
    by_score = np.argsort(-scores[0])[:2]
    assert set(np.round(deg[by_score], 5)) == {30.0, 180.0}


def test_nms_fractional_angle_center():
    """The ref's suppression center on the angle axis is FRACTIONAL
    (utils.py:54: y = ix / width true division -> ai + di/n_dist), so for a
    peak at (a=20, d=6), sigma angle 5: rows 16..25 are suppressed — row
    a-5=15 survives, row a+5=25 is suppressed (ADVICE r2)."""
    heat = np.full((1, NUM_ANGLES, NUM_CLASSES), -10.0, np.float32)
    heat[0, 20, 6] = 5.0
    heat[0, 15, 6] = 4.0  # exactly 5 rows below: survives (center 20.5)
    heat[0, 25, 6] = 4.0  # exactly 5 rows above: suppressed
    peaks = nms_peaks(
        np.exp(heat), max_predictions=5, sigma=(7.0, 5.0)
    )
    assert peaks[0, 20, 6] > 0
    assert peaks[0, 15, 6] > 0
    assert peaks[0, 25, 6] == 0


def test_waypoint_train_sampling():
    rng = np.random.default_rng(3)
    heat = np.full((2, NUM_ANGLES, NUM_CLASSES), -10.0, np.float32)
    heat[:, 10, 3] = 50.0  # sharp peak -> sampling concentrates on it
    heat[:, 60, 8] = 45.0
    angles, dists, _ = extract_waypoints(heat, in_train=True, rng=rng)
    for k in range(2):
        deg = np.degrees(angles[k])
        assert len(deg) <= 5
        # sampled cells stay inside each peak's camera region (10 angle bins)
        assert any(abs(a - 30.0) <= 30.0 for a in deg)
        assert all(0.25 <= d <= 3.0 for d in dists[k])


def test_waypoint_predictor_shapes():
    import jax

    cfg = ModelConfig(hidden_size=32, num_attention_heads=2,
                      intermediate_size=64, dtype="float32")
    model = WaypointPredictor(cfg, depth_feat_size=4 * 2 * 2)
    x = np.random.default_rng(0).normal(size=(2 * 12, 4, 2, 2)).astype(np.float32)
    params = model.init(jax.random.key(0), x)
    out = model.apply(params, x)
    assert out.shape == (2, NUM_ANGLES, NUM_CLASSES)


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
def ce_world():
    rng = np.random.default_rng(3)
    episodes = make_synthetic_ce_episodes(rng, n=6)
    env = SyntheticContinuousEnv(
        episodes, batch_size=2, num_views=12, grid_hw=4,
        grid_feat_size=TINY.bev_grid_feat_size,
        view_feat_size=TINY.image_feat_size,
        depth_feat_shape=(4, 2, 2),
    )
    from vln_bevbert_tpu.ce.agent import CEAgent

    cfg = FinetuneConfig(model=TINY, shapes=SHAPES, batch_size=2,
                         max_action_len=4, learning_rate=1e-3)
    agent = CEAgent(cfg, env)
    agent.init_params()
    return env, agent


def test_ce_env_determinism(ce_world):
    env, _ = ce_world
    env.reset_epoch()
    obs1 = env.reset()
    f1 = obs1[0]["rgb"].copy()
    env.reset_epoch()
    obs2 = env.reset()
    np.testing.assert_array_equal(f1, obs2[0]["rgb"])
    env.teleport(0, obs1[0]["position"] + [1, 0, 0])
    obs3 = env.observations()
    assert not np.array_equal(f1, obs3[0]["rgb"])


@pytest.mark.slow
def test_ce_teacher_rollout_learns(ce_world):
    env, agent = ce_world
    trajs, loss = agent.rollout(feedback="teacher", train=True)
    assert loss is not None and np.isfinite(loss)
    assert all(len(t["positions"]) >= 1 for t in trajs)


def test_ce_scheduled_sampling_and_eval(ce_world):
    env, agent = ce_world
    _, loss = agent.rollout(feedback="sample", train=True, sample_ratio=0.75)
    assert loss is not None and np.isfinite(loss)
    metrics = agent.evaluate(num_batches=1)
    for k in ("success", "spl", "ndtw", "distance_to_goal", "oracle_success"):
        assert k in metrics and np.isfinite(metrics[k])


def test_ce_teacher_reaches_goal(ce_world):
    """Following the oracle teacher in the open plane must bring the agent
    close to the goal (waypoints permitting) far more often than not."""
    env, agent = ce_world
    env.reset_epoch()
    d2g = []
    for _ in range(2):
        trajs, _ = agent.rollout(feedback="teacher", train=False)
        for i, tr in enumerate(trajs):
            d_start = float(np.linalg.norm(
                np.asarray(env.batch[i].start_pos) - env.batch[i].goal))
            d_end = env.dist_to_goal(i, tr["positions"][-1])
            d2g.append((d_start, d_end))
    improved = sum(1 for s, e in d2g if e < s or e < 3.0)
    assert improved >= len(d2g) // 2, d2g


def test_ce_sensor_suite_and_topdown_map(ce_world):
    from vln_bevbert_tpu.ce.sensors import attach_sensors, render_top_down_map

    env, _ = ce_world
    env.reset_epoch()
    obs = attach_sensors(env, env.reset())
    for i, ob in enumerate(obs):
        assert ob["globalgps"].shape == (3,)
        assert 0.0 <= ob["progress"] <= 1.0
        assert ob["shortest_path_sensor"].shape == (3,)
        assert np.isfinite(ob["heading_sensor"])
    # walking toward the goal raises progress
    env.teleport(0, np.asarray(env.batch[0].goal))
    obs2 = attach_sensors(env, env.observations())
    assert obs2[0]["progress"] >= obs[0]["progress"]
    assert obs2[0]["progress"] == pytest.approx(1.0, abs=1e-6)

    ep = env.batch[0]
    walked = np.stack([ep.start_pos, ep.gt_positions[1], ep.goal])
    img = render_top_down_map(walked, ep.gt_positions, ep.goal)
    assert img.shape == (256, 256, 3) and img.dtype == np.uint8
    # all three ink colours are present (gt green, walked blue, goal ring)
    flat = img.reshape(-1, 3)
    for color in ((60, 180, 75), (0, 90, 200), (220, 80, 80)):
        assert (flat == color).all(axis=1).any(), color


def test_obs_transforms():
    from vln_bevbert_tpu.ce.obs_transforms import (
        CenterCropperPerSensor,
        ResizerPerSensor,
        apply_obs_transforms,
        center_crop,
        resize,
    )

    rng = np.random.default_rng(0)
    img = rng.integers(0, 255, (12, 300, 400, 3)).astype(np.uint8)
    c = center_crop(img, 224)
    assert c.shape == (12, 224, 224, 3)
    # crop is centred: the centre pixel survives
    np.testing.assert_array_equal(c[:, 112, 112], img[:, 150, 200])
    # padding branch when the target exceeds the frame
    assert center_crop(img[:, :100, :100], 224).shape == (12, 224, 224, 3)
    r = resize(img, (128, 160))
    assert r.shape == (12, 128, 160, 3)
    assert resize(img, (300, 400)) is img

    obs = [{"rgb_0": img.copy(), "depth": rng.uniform(0, 1, (1, 256, 256, 1))}]
    pipeline = [
        ResizerPerSensor([("rgb_0", (256, 341))]),
        CenterCropperPerSensor([("rgb_0", 224), ("depth", 256)]),
    ]
    out = apply_obs_transforms(pipeline, obs)
    assert out[0]["rgb_0"].shape == (12, 224, 224, 3)
    assert out[0]["depth"].shape == (1, 256, 256, 1)


def test_vlnce_dataset_loaders(tmp_path):
    """Parse fabricated R2R_VLNCE / RxR release-format files
    (ref habitat_extensions/task.py:106-133, 218-260; gt files
    ss_trainer_BEV.py:637-643)."""
    import gzip
    import json

    from vln_bevbert_tpu.ce.dataset import (
        apply_gt_paths,
        load_gt_paths,
        load_rxr_episodes,
        load_vlnce_episodes,
    )

    data = {
        "instruction_vocab": {"word_list": ["walk", "to", "the", "door"]},
        "episodes": [
            {
                "episode_id": 7,
                "trajectory_id": 1,
                "scene_id": "mp3d/SCENE1/SCENE1.glb",
                "start_position": [1.0, 0.2, -3.0],
                "start_rotation": [0.0, 0.0, 0.0, 1.0],
                "goals": [{"position": [4.0, 0.2, -6.0], "radius": 3.0}],
                "reference_path": [[1.0, 0.2, -3.0], [2.5, 0.2, -4.5],
                                   [4.0, 0.2, -6.0]],
                "instruction": {"instruction_text": "walk to the door",
                                "instruction_tokens": [5, 6, 7, 8]},
            },
            {
                "episode_id": 8,
                "trajectory_id": 2,
                "scene_id": "mp3d/SCENE2/SCENE2.glb",
                "start_position": [0.0, 0.0, 0.0],
                "start_rotation": [0.0, 0.7071068, 0.0, 0.7071068],
                "goals": [],
                "reference_path": [[0.0, 0.0, 0.0], [0.0, 0.0, -2.0]],
                "instruction": {"instruction_text": "go", 
                                "instruction_tokens": [9]},
            },
        ],
    }
    p = tmp_path / "val_unseen.json.gz"
    with gzip.open(p, "wt") as f:
        json.dump(data, f)

    eps = load_vlnce_episodes(str(p))
    assert len(eps) == 2
    assert eps[0].episode_id == "7"
    np.testing.assert_array_equal(eps[0].instr_encoding, [5, 6, 7, 8])
    np.testing.assert_allclose(eps[0].goal, [4.0, 0.2, -6.0])
    assert eps[0].start_heading == pytest.approx(0.0)
    # quaternion [0, sin(45), 0, cos(45)] = +90deg yaw
    assert eps[1].start_heading == pytest.approx(np.pi / 2, abs=1e-5)
    # no goals -> goal falls back to the last reference-path point
    np.testing.assert_allclose(eps[1].goal, [0.0, 0.0, -2.0])
    # scene filter
    assert len(load_vlnce_episodes(str(p), scenes=["SCENE1"])) == 1
    # custom tokenizer wins over release tokens
    tok = load_vlnce_episodes(str(p), tokenizer=lambda s: [len(s)])
    np.testing.assert_array_equal(tok[0].instr_encoding, [16])

    # RxR per-role files + language filter
    rxr = dict(data)
    rxr["episodes"] = [dict(data["episodes"][0])]
    rxr["episodes"][0]["instruction"] = {
        "instruction_text": "walk", "instruction_tokens": [3],
        "language": "hi-IN",
    }
    rp = tmp_path / "val_unseen_guide.json.gz"
    with gzip.open(rp, "wt") as f:
        json.dump(rxr, f)
    tmpl = str(tmp_path / "val_unseen_{role}.json.gz")
    assert len(load_rxr_episodes(tmpl)) == 1
    assert len(load_rxr_episodes(tmpl, languages=["en-US"])) == 0

    # gt locations override the sparse reference path
    gt = {"7": {"locations": [[1.0, 0.2, -3.0], [1.5, 0.2, -3.5],
                              [2.0, 0.2, -4.0], [4.0, 0.2, -6.0]],
                "actions": [1, 1, 1, 0]}}
    gp = tmp_path / "val_unseen_gt.json.gz"
    with gzip.open(gp, "wt") as f:
        json.dump(gt, f)
    gt_map = load_gt_paths(str(gp))
    apply_gt_paths(eps, gt_map)
    assert len(eps[0].gt_positions) == 4
    assert len(eps[1].gt_positions) == 2  # untouched
