"""Subprocess vector-env pool: surface parity with the in-process env and a
full CE rollout through worker processes (ref env_utils.py:35-126)."""

import numpy as np
import pytest

from vln_bevbert_tpu.ce.env import (
    SyntheticContinuousEnv,
    make_synthetic_ce_episodes,
)
from vln_bevbert_tpu.ce.env_pool import SubprocVectorEnv, make_synthetic_pool
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
def pool():
    rng = np.random.default_rng(3)
    episodes = make_synthetic_ce_episodes(rng, n=8)
    p = make_synthetic_pool(
        episodes, num_workers=2, slots_per_worker=1,
        num_views=12, grid_hw=4, grid_feat_size=TINY.bev_grid_feat_size,
        view_feat_size=TINY.image_feat_size, depth_feat_shape=(4, 2, 2),
    )
    yield p
    p.close()


def test_pool_surface_matches_inprocess(pool):
    assert pool.batch_size == 2
    assert pool.num_views == 12 and pool.grid_hw == 4
    obs = pool.reset()
    assert len(obs) == 2
    for ob in obs:
        assert ob["rgb"].shape == (12, 16, TINY.bev_grid_feat_size)
    # slot-routed oracle + action calls
    d0 = pool.dist_to_goal(0)
    assert np.isfinite(d0)
    pool.teleport(1, obs[1]["position"] + [1.0, 0.0, 0.0])
    obs2 = pool.observations()
    assert not np.array_equal(obs[1]["rgb"], obs2[1]["rgb"])
    np.testing.assert_array_equal(obs[0]["rgb"], obs2[0]["rgb"])
    # headings/batch gather across workers
    assert pool.headings.shape == (2,)
    assert len(pool.batch) == 2
    # low-level control primitives route to the right worker
    h0 = pool.headings[0]
    pool.rotate(0, pool.turn_unit)
    assert pool.headings[0] == pytest.approx((h0 + pool.turn_unit) % (2 * np.pi))
    pool.forward_step(0)
    assert isinstance(pool.previous_step_collided(0), (bool, np.bool_))


def test_pool_async_observations(pool):
    pool.reset()
    pool.begin_observations()
    obs = pool.end_observations()
    assert len(obs) == 2
    # begin is idempotent; a second end without begin re-dispatches
    obs2 = pool.observations()
    np.testing.assert_array_equal(obs[0]["rgb"], obs2[0]["rgb"])


def test_pool_inflight_guard_on_gather_paths(pool):
    """Gather-style RPCs (reset/size/properties) must fail loudly while
    observation replies are pending — a silent send would mis-pair pipe
    messages and return the observation payload as the gather result
    (ADVICE r2)."""
    pool.reset()
    pool.begin_observations()
    try:
        with pytest.raises(AssertionError, match="in flight"):
            pool.size()
        with pytest.raises(AssertionError, match="in flight"):
            _ = pool.headings
        with pytest.raises(AssertionError, match="in flight"):
            pool.teleport(0, np.zeros(3))
    finally:
        pool.end_observations()  # drain so later tests see a clean pipe


def test_pool_worker_error_surfaces(pool):
    with pytest.raises(RuntimeError, match="env worker failed"):
        pool.teleport(0, "not-a-position-at-all", heading="nope")


def test_pool_determinism_vs_inprocess():
    """Same episodes split 2x1 through the pool == one in-process env with
    the per-worker seeds; sensor features are pose-deterministic."""
    rng = np.random.default_rng(3)
    episodes = make_synthetic_ce_episodes(rng, n=4)
    kw = dict(num_views=12, grid_hw=4, grid_feat_size=12, view_feat_size=16,
              depth_feat_shape=(4, 2, 2))
    p = make_synthetic_pool(episodes, num_workers=2, slots_per_worker=1, **kw)
    try:
        obs_pool = p.reset()
        e0 = SyntheticContinuousEnv(episodes[0::2], batch_size=1, seed=0, **kw)
        e1 = SyntheticContinuousEnv(episodes[1::2], batch_size=1, seed=1, **kw)
        obs_ref = e0.reset() + e1.reset()
        for a, b in zip(obs_pool, obs_ref):
            assert a["episode_id"] == b["episode_id"]
            np.testing.assert_array_equal(a["rgb"], b["rgb"])
    finally:
        p.close()


@pytest.mark.slow
def test_ce_rollout_through_pool():
    from vln_bevbert_tpu.ce.agent import CEAgent

    rng = np.random.default_rng(9)
    episodes = make_synthetic_ce_episodes(rng, n=6)
    pool = make_synthetic_pool(
        episodes, num_workers=2, slots_per_worker=1,
        num_views=12, grid_hw=4, grid_feat_size=TINY.bev_grid_feat_size,
        view_feat_size=TINY.image_feat_size, depth_feat_shape=(4, 2, 2),
    )
    try:
        cfg = FinetuneConfig(model=TINY, shapes=SHAPES, batch_size=2,
                             max_action_len=3, learning_rate=1e-3)
        agent = CEAgent(cfg, pool)
        agent.init_params()
        trajs, loss = agent.rollout(feedback="teacher", train=True)
        assert loss is not None and np.isfinite(loss)
        metrics = agent.evaluate(num_batches=1)
        assert np.isfinite(metrics["success"])
    finally:
        pool.close()
