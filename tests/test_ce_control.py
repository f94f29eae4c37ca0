"""Low-level CE control: turn discretization, forward stepping, tryout
collision recovery, and the structured act-0/act-4 executor
(ref habitat_extensions/nav.py:109-161, environments.py:363-479)."""

import math

import numpy as np
import pytest

from vln_bevbert_tpu.ce.control import LowLevelController, rel_angle_dist
from vln_bevbert_tpu.ce.env import CEEpisode, SyntheticContinuousEnv


def make_env(obstacles=None, start=(0.0, 0.0, 0.0), heading=0.0):
    ep = CEEpisode(
        episode_id="e0",
        instr_encoding=np.array([101, 5, 102]),
        start_pos=np.asarray(start, np.float64),
        start_heading=heading,
        gt_positions=np.zeros((2, 3)),
        goal=np.zeros(3),
    )
    env = SyntheticContinuousEnv([ep], batch_size=1, obstacles=obstacles)
    env.reset()
    return env


def test_rel_angle_dist():
    # heading 0 faces -z; target straight ahead
    ang, dis = rel_angle_dist([0, 0, 0], [0, 0, -2.0], 0.0)
    assert ang == pytest.approx(0.0) and dis == pytest.approx(2.0)
    # target to the left (+x is right of -z? habitat ccw-positive: -x)
    ang, _ = rel_angle_dist([0, 0, 0], [-1.0, 0, 0], 0.0)
    assert ang == pytest.approx(math.pi / 2)
    ang, _ = rel_angle_dist([0, 0, 0], [1.0, 0, 0], 0.0)
    assert ang == pytest.approx(-math.pi / 2)


def test_turn_discretization():
    env = make_env()
    ctrl = LowLevelController(env)
    ctrl.turn(0, math.radians(100.0))  # rounds to 90
    assert env.headings[0] == pytest.approx(math.radians(90.0))
    ctrl.turn(0, math.radians(-100.0))
    assert env.headings[0] == pytest.approx(0.0, abs=1e-9)
    ctrl.turn(0, math.radians(344.0))  # 344 -> 330 -> wraps to -30
    assert env.headings[0] == pytest.approx(math.radians(330.0))


def test_single_step_control_reaches_target():
    env = make_env()
    ctrl = LowLevelController(env)
    target = np.array([0.0, 0.0, -2.0])
    ctrl.single_step_control(0, target, tryout=False)
    # 2.0 // 0.25 = 8 forward units, straight line
    np.testing.assert_allclose(env.positions[0], target, atol=1e-9)
    assert len(ctrl.visited) == 8


def test_forward_blocked_without_tryout():
    # wall at z=-1 between agent and target
    env = make_env(obstacles=[(0.0, -1.0, 0.3)])
    ctrl = LowLevelController(env)
    ctrl.single_step_control(0, np.array([0.0, 0.0, -2.0]), tryout=False)
    # agent walks into the obstacle boundary and stays stuck on repeat steps
    assert env.positions[0][2] > -1.0 + 0.3 - 0.26
    assert env.previous_step_collided(0)


def test_tryout_recovers_around_obstacle():
    env = make_env(obstacles=[(0.0, -1.0, 0.3)])
    ctrl = LowLevelController(env, rng=np.random.default_rng(0))
    ctrl.single_step_control(0, np.array([0.0, 0.0, -2.5]), tryout=True)
    blocked_line_progress = -1.0 + 0.3
    # the probe sweep must have moved the agent off the blocked straight line
    assert abs(env.positions[0][0]) > 0.0 or env.positions[0][2] < blocked_line_progress
    # and strictly further than the no-tryout run along some direction
    assert np.linalg.norm(env.positions[0] - np.array([0, 0, 0])) > 0.7


def test_execute_act4_back_path_and_ghost():
    env = make_env()
    ctrl = LowLevelController(env)
    back_path = [("a", np.array([0.0, 0.0, -1.0])), ("b", np.array([1.0, 0.0, -1.0]))]
    visited = ctrl.execute(0, {
        "act": 4, "back_path": back_path,
        "front_pos": back_path[-1][1],
        "ghost_pos": np.array([1.0, 0.0, -2.0]),
        "tryout": False,
    })
    assert len(visited) > 2
    # ends within a couple of unit-steps of the ghost (turn discretization)
    assert np.linalg.norm(env.positions[0] - np.array([1.0, 0.0, -2.0])) < 0.5


def test_execute_act0_stop_teleport_and_control():
    env = make_env()
    ctrl = LowLevelController(env)
    ctrl.execute(0, {"act": 0, "back_path": None,
                     "stop_pos": np.array([2.0, 0.0, 0.0]), "tryout": False})
    np.testing.assert_allclose(env.positions[0], [2.0, 0.0, 0.0])
    assert not env.active[0]

    env2 = make_env()
    ctrl2 = LowLevelController(env2)
    ctrl2.execute(0, {"act": 0,
                      "back_path": [("a", np.array([0.0, 0.0, -1.0]))],
                      "stop_pos": None, "tryout": True})
    np.testing.assert_allclose(env2.positions[0], [0.0, 0.0, -1.0], atol=1e-9)
    assert not env2.active[0]
