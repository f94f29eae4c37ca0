"""Mock-driven conformance tests for the real-simulator bindings.

tests/test_binding_conformance.py pins the SURFACE (method names and
signatures); these tests inject fake ``habitat`` / ``MatterSim`` modules and
EXECUTE the binding code paths, asserting the call sequences and state
semantics the reference drives (VERDICT r4 item 6):

- MatterSim: rendering-disabled graph-state-machine construction + episode
  teleports (/root/reference/map_nav_src/r2r/env.py:48-92),
- habitat: pose access, 12-view ring rendering, HIGHTOLOW low-level control
  (turn units + navmesh-filtered forward with collision detection,
  habitat_extensions/nav.py:109-161), oracle geodesics
  (environments.py:108-160,307-520).
"""

import math
import sys
import types
from types import SimpleNamespace as NS

import numpy as np
import pytest

from vln_bevbert_tpu.ce.geometry_ce import (
    heading_from_quaternion,
    quaternion_from_heading,
)

# --------------------------------------------------------------------------
# fake habitat
# --------------------------------------------------------------------------


class _Quat:
    def __init__(self, arr):
        if hasattr(arr, "x"):
            self.x, self.y, self.z, self.w = arr.x, arr.y, arr.z, arr.w
        else:
            self.x, self.y, self.z, self.w = (float(v) for v in np.asarray(arr))

    def asarray(self):
        return np.array([self.x, self.y, self.z, self.w])


class _FakeHabitatSim:
    """Minimal habitat-sim twin: agent state, sensor render, navmesh step
    filter with an optional wall plane at z = wall_z (motion clipped there),
    and a geodesic oracle distinguishable from euclidean (x1.5)."""

    def __init__(self):
        self._pos = np.zeros(3)
        self._rot = _Quat(quaternion_from_heading(0.0))
        self.wall_z = None
        self.calls = []

    def get_agent_state(self):
        return NS(position=self._pos.copy(), rotation=self._rot)

    def set_agent_state(self, position, rotation, reset_sensors=True):
        self.calls.append(("set_agent_state", np.asarray(position, float).copy(),
                           bool(reset_sensors)))
        self._pos = np.asarray(position, float).copy()
        self._rot = _Quat(rotation)
        return True

    def get_sensor_observations(self):
        h = heading_from_quaternion(self._rot.asarray())
        rgb = np.full((8, 8, 3), h, np.float32)
        depth = np.full((8, 8), 2.0, np.float32)
        depth[0, 0] = 0.0  # no-depth pixel: pooling must mask it out
        return {"rgb": rgb, "depth": depth}

    def step_filter(self, start, target):
        target = np.asarray(target, float).copy()
        if self.wall_z is not None and target[2] < self.wall_z:
            target[2] = self.wall_z
        return target

    def geodesic_distance(self, a, b):
        self.calls.append(("geodesic",))
        return 1.5 * float(np.linalg.norm(np.asarray(a, float) - np.asarray(b, float)))


class _FakeHabitatEnv:
    def __init__(self, config=None):
        self.sim = _FakeHabitatSim()
        self.current_episode = None
        self.reset_count = 0

    def reset(self):
        self.reset_count += 1
        ep = self.current_episode
        self.sim._pos = np.asarray(ep.start_position, float)
        self.sim._rot = _Quat(quaternion_from_heading(ep.start_heading))


def _episode(i, start=(0.0, 0.0, 0.0), goal=(2.0, 0.0, -2.0)):
    return NS(
        episode_id=f"ep{i}",
        instruction=NS(instruction_tokens=[1, 2, 3 + i]),
        reference_path=[list(start), [1.0, 0.0, -1.0], list(goal)],
        goals=[NS(position=list(goal))],
        start_position=list(start),
        start_heading=0.0,
    )


@pytest.fixture()
def habitat_env(monkeypatch):
    fake = types.ModuleType("habitat")
    fake.Env = _FakeHabitatEnv
    monkeypatch.setitem(sys.modules, "habitat", fake)
    from vln_bevbert_tpu.ce.habitat_binding import HabitatContinuousEnv

    env = HabitatContinuousEnv(
        habitat_config=None, episodes=[_episode(0), _episode(1)],
        batch_size=2, num_views=4, grid_hw=2,
    )
    return env


def test_habitat_reset_and_observation_assembly(habitat_env):
    obs = habitat_env.reset()
    assert len(obs) == 2
    o = obs[0]
    assert o["episode_id"] == "ep0"
    np.testing.assert_array_equal(o["instr_encoding"], [1, 2, 3])
    np.testing.assert_allclose(o["position"], [0.0, 0.0, 0.0])
    assert o["view_fts"].shape[0] == 4        # the camera ring
    assert o["depth"].shape == (4, 2, 2)      # pooled grids per view
    assert o["gt_path"].shape == (3, 3)
    # masked-nonzero pooling (grid_depth.py:58-110): the zero pixel must not
    # dilute the cell mean
    np.testing.assert_allclose(o["depth"], 2.0)
    # resets actually drove the underlying envs
    assert all(e.reset_count == 1 for e in habitat_env.envs)


def test_habitat_ring_render_restores_pose(habitat_env):
    habitat_env.reset()
    h0 = habitat_env.headings[0]
    p0 = habitat_env.positions[0].copy()
    habitat_env.observations()
    # the ring render rotates the agent through every view heading; it must
    # put the pose back (the reference's fixed 12-camera rig never moves the
    # agent, ss_trainer_BEV.py:107-179)
    assert abs(habitat_env.headings[0] - h0) < 1e-9
    np.testing.assert_allclose(habitat_env.positions[0], p0)


def test_habitat_low_level_control_semantics(habitat_env):
    habitat_env.reset()
    sim = habitat_env.envs[0].sim

    # rotate by one HIGHTOLOW turn unit (30deg, nav.py:38-56)
    habitat_env.rotate(0, habitat_env.turn_unit)
    assert abs(habitat_env.headings[0] - math.radians(30)) < 1e-9
    # rotation must not move the agent
    np.testing.assert_allclose(habitat_env.positions[0], [0, 0, 0])

    # forward at heading 0 moves -z by forward_unit (0.25m), no collision
    habitat_env.rotate(0, -habitat_env.turn_unit)
    collided = habitat_env.forward_step(0)
    assert not collided and not habitat_env.previous_step_collided(0)
    np.testing.assert_allclose(
        habitat_env.positions[0], [0.0, 0.0, -habitat_env.forward_unit],
        atol=1e-9,
    )

    # navmesh clipping => collision flag (the 'tryout' recovery in
    # ce/control.py keys on exactly this signal, ref nav.py:109-161)
    sim.wall_z = -0.3
    habitat_env.forward_step(0)   # -0.25 -> -0.5 clipped at -0.3
    assert habitat_env.previous_step_collided(0)
    np.testing.assert_allclose(habitat_env.positions[0], [0.0, 0.0, -0.3])


def test_habitat_teleport_and_oracle(habitat_env):
    habitat_env.reset()
    habitat_env.teleport(1, [1.0, 0.0, -1.0], heading=math.radians(90))
    np.testing.assert_allclose(habitat_env.positions[1], [1.0, 0.0, -1.0])
    assert abs(habitat_env.headings[1] - math.radians(90)) < 1e-9

    # oracle queries route to sim.geodesic_distance (environments.py:108-121)
    sim = habitat_env.envs[1].sim
    n_before = sum(c[0] == "geodesic" for c in sim.calls)
    d = habitat_env.dist_to_goal(1)
    expected = 1.5 * float(np.linalg.norm(np.array([1.0, 0.0, -1.0])
                                          - np.array([2.0, 0.0, -2.0])))
    assert abs(d - expected) < 1e-9
    assert sum(c[0] == "geodesic" for c in sim.calls) == n_before + 1

    batched = habitat_env.dists_to_goal(1, [[1, 0, -1], [2, 0, -2]])
    assert batched.shape == (2,)
    assert abs(batched[1]) < 1e-9


def test_habitat_eval_episode_metrics(habitat_env):
    habitat_env.reset()
    walked = np.asarray(habitat_env.batch[0].reference_path, float)
    metrics = habitat_env.eval_episode(0, walked)
    # walking the reference path exactly => success with oracle success
    assert metrics["success"] == 1.0
    assert metrics["oracle_success"] == 1.0
    assert metrics["distance_to_goal"] < 1e-6


# --------------------------------------------------------------------------
# fake MatterSim
# --------------------------------------------------------------------------


class _FakeMatterSim:
    def __init__(self):
        self.calls = []
        self._state = None

    def __getattr__(self, name):
        # record every set*/initialize call with its args
        if name.startswith("set") or name == "initialize":
            def _rec(*args):
                self.calls.append((name, args))
            return _rec
        raise AttributeError(name)

    def newEpisode(self, scans, vps, headings, elevations):
        self.calls.append(("newEpisode", (scans, vps, headings, elevations)))
        self._state = NS(
            scanId=scans[0],
            location=NS(viewpointId=vps[0]),
            heading=headings[0],
            elevation=elevations[0],
            navigableLocations=[NS(viewpointId=vps[0])],
        )

    def getState(self):
        return [self._state]


@pytest.fixture()
def mattersim(monkeypatch):
    fake = types.ModuleType("MatterSim")
    fake.Simulator = _FakeMatterSim
    monkeypatch.setitem(sys.modules, "MatterSim", fake)
    from vln_bevbert_tpu.nav.mattersim_binding import MatterSimSimulator

    return MatterSimSimulator("/fake/connectivity")


def test_mattersim_construction_sequence(mattersim):
    """The binding must configure MatterSim exactly as the reference does
    before initialize (map_nav_src/r2r/env.py:48-61): nav graph path,
    rendering OFF, discretized angles, 60deg VFOV, batch size 1."""
    calls = mattersim.sim.calls
    names = [c[0] for c in calls]
    assert names.index("setRenderingEnabled") < names.index("initialize")
    by_name = dict(calls)
    assert by_name["setNavGraphPath"] == ("/fake/connectivity",)
    assert by_name["setRenderingEnabled"] == (False,)
    assert by_name["setDiscretizedViewingAngles"] == (True,)
    assert abs(by_name["setCameraVFOV"][0] - math.radians(60)) < 1e-9
    assert by_name["setBatchSize"] == (1,)
    assert "setDatasetPath" not in by_name  # only with scan_data_dir


def test_mattersim_episode_teleport_and_state(mattersim):
    """new_episode must forward listified args (the reference's per-slot
    newEpisode calls, env.py:70-75) and get_state must mirror the sim."""
    mattersim.new_episode("scanA", "vp1", 1.25, 0.0)
    call = [c for c in mattersim.sim.calls if c[0] == "newEpisode"][-1]
    assert call[1] == (["scanA"], ["vp1"], [1.25], [0.0])
    st = mattersim.get_state()
    assert st.scan == "scanA" and st.viewpoint == "vp1"
    assert st.heading == 1.25 and st.elevation == 0.0
    assert mattersim.navigable_locations()[0].viewpointId == "vp1"
