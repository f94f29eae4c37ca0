"""Data-parallel train-step tests on the virtual 8-CPU-device mesh."""

import jax
import numpy as np
import pytest

from vln_bevbert_tpu.configs import ModelConfig, OptimConfig, PretrainConfig, ShapeConfig
from vln_bevbert_tpu.data.synthetic import synthetic_pretrain_batch
from vln_bevbert_tpu.parallel import (
    init_pretrain_state,
    make_mesh,
    make_pretrain_step,
)
from vln_bevbert_tpu.parallel.mesh import shard_batch

TINY = ModelConfig(
    vocab_size=400, hidden_size=32, num_attention_heads=2, intermediate_size=64,
    num_l_layers=1, num_pano_layers=1, num_x_layers=1, image_feat_size=24,
    obj_feat_size=0, bev_grid_feat_size=20, bev_dim=5, dtype="float32",
    max_position_embeddings=64,
)
SHAPES = ShapeConfig(
    max_txt_len=16, max_steps=3, max_pano_len=8, max_gmap_len=10,
    max_local_len=6, max_objects=0, num_views=2, grid_hw=4, max_masked_tokens=4,
)


def tiny_cfg(**optim):
    return PretrainConfig(
        model=TINY, shapes=SHAPES,
        optim=OptimConfig(warmup_steps=2, num_train_steps=10, **optim),
        tasks=("mlm", "sap", "masksem"), train_batch_size=8,
    )


def make_batch(batch=8, seed=0):
    rng = np.random.default_rng(seed)
    b = synthetic_pretrain_batch(rng, batch, SHAPES, TINY, with_objects=False, raw_bev=True)
    b["txt_ids"] = (b["txt_ids"] % 300).astype(np.int32)
    b["mlm_tgt"] = (b["mlm_tgt"] % 300).astype(np.int32)
    b["mlm_ids"] = (b["mlm_ids"] % 300).astype(np.int32)
    return b


@pytest.mark.slow
def test_eight_device_dp_step_runs_all_tasks():
    assert jax.device_count() >= 8, "conftest must provide 8 virtual devices"
    cfg = tiny_cfg()
    batch = make_batch(8)
    model, projector, state = init_pretrain_state(cfg, batch)
    mesh = make_mesh(jax.devices()[:8])
    step = make_pretrain_step(model, projector, mesh)
    rng = jax.random.key(0)
    with mesh:
        sb = shard_batch(mesh, batch)
        for task in cfg.tasks:
            state, metrics = step(state, sb, rng, task)
            assert np.isfinite(float(metrics["loss"])), task
            if task in ("mlm", "sap"):  # always supervised; masksem's
                # sem-mask/mrc-mask intersection can be empty on tiny worlds
                assert float(metrics["grad_norm"]) > 0, task
    assert int(state.step) == len(cfg.tasks)


@pytest.mark.slow
def test_dp_equals_single_device():
    """The sharded step must produce the same update as a single-device run
    (the gradient psum is a mean over an identical global batch)."""
    cfg = tiny_cfg()
    batch = make_batch(8, seed=3)
    rng = jax.random.key(1)

    model, projector, state1 = init_pretrain_state(cfg, batch)
    step1 = make_pretrain_step(model, projector, None)
    state1, m1 = step1(state1, batch, rng, "sap")

    model, projector, state8 = init_pretrain_state(cfg, batch)
    mesh = make_mesh(jax.devices()[:8])
    step8 = make_pretrain_step(model, projector, mesh)
    with mesh:
        state8, m8 = step8(state8, shard_batch(mesh, batch), rng, "sap")

    np.testing.assert_allclose(float(m1["loss"]), float(m8["loss"]), rtol=1e-5)
    l1 = jax.tree.leaves(state1.params)
    l8 = jax.tree.leaves(state8.params)
    for a, b in zip(l1, l8):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


@pytest.mark.slow
def test_finetune_replay_dp_equals_single_device():
    """The mesh-sharded fine-tune replay update (learn_from_bundle) must match
    the single-device update on an identical global batch — the TPU analogue
    of the reference's fine-tune DDP (agent_base.py:121-123)."""
    from vln_bevbert_tpu.configs import FinetuneConfig
    from vln_bevbert_tpu.data.synthetic import synthetic_replay_bundle
    from vln_bevbert_tpu.nav.agent import make_replay_agent

    ft_shapes = ShapeConfig(
        max_txt_len=16, max_steps=3, max_pano_len=6, max_gmap_len=8,
        max_local_len=4, max_objects=0, num_views=2, grid_hw=4, max_pc_steps=2,
    )
    cfg = FinetuneConfig(
        model=TINY, shapes=ft_shapes, batch_size=8, max_action_len=3,
        learning_rate=1e-3,
    )
    rb = synthetic_replay_bundle(np.random.default_rng(11), cfg, 8)
    T = rb["targets"].shape[0]
    keys = jax.random.split(jax.random.key(7), T + 2)
    rb = dict(rb, rng=keys[:T], rng_lang=keys[T], rng_pano=keys[T + 1])

    a1 = make_replay_agent(cfg, batch_size=8, mesh=None, seed=0)
    loss1, g1 = a1._fn("loss_grad")(a1.params, rb)

    from vln_bevbert_tpu.parallel.mesh import shard_replay_bundle

    mesh = make_mesh(jax.devices()[:8])
    a8 = make_replay_agent(cfg, batch_size=8, mesh=mesh, seed=0)
    loss8, g8 = a8._fn("loss_grad")(a8.params, shard_replay_bundle(mesh, rb))

    # identical loss and gradients (up to f32 reduction-order noise): the
    # psum'd sharded grads equal the single-device grads, which is the
    # invariant DDP provides the reference. Post-Adam params are NOT compared
    # tightly — adam normalises near-zero grads by ~eps, amplifying reduction
    # noise on unsupervised leaves to O(lr).
    np.testing.assert_allclose(float(loss1), float(loss8), rtol=1e-5)
    for a, b in zip(jax.tree.leaves(g1), jax.tree.leaves(g8)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-6
        )

    # and the full update path runs under the mesh
    loss_step = a8.learn_from_bundle({k: v for k, v in rb.items()
                                      if not k.startswith("rng")})
    assert np.isfinite(loss_step)


@pytest.mark.slow
def test_dp_equals_single_device_hidden768():
    """Flagship-WIDTH DP equality (VERDICT r3 missing 3): hidden 768, full
    30522 vocab and 768-wide heads — the dims where width-specific sharding
    bugs (e.g. the MLM gather) would hide from the hidden-32 tests. Depth is
    cut (2+1+1 layers) and sequence shapes are tiny: DP sharding is per-array,
    so width is pinned by ONE layer of each kind; depth only multiplies the
    8-virtual-devices-on-1-core execution cost."""
    wide = ModelConfig(
        hidden_size=768, num_attention_heads=12, intermediate_size=3072,
        num_l_layers=2, num_pano_layers=1, num_x_layers=1,
        image_feat_size=768, obj_feat_size=0, bev_grid_feat_size=768,
        bev_dim=5, dtype="float32", max_position_embeddings=512,
    )
    cfg = PretrainConfig(
        model=wide, shapes=SHAPES,
        optim=OptimConfig(warmup_steps=2, num_train_steps=10),
        tasks=("mlm",), train_batch_size=8,
    )
    rng_np = np.random.default_rng(21)
    batch = synthetic_pretrain_batch(
        rng_np, 8, SHAPES, wide, with_objects=False, raw_bev=True
    )
    rng = jax.random.key(4)

    model, projector, s1 = init_pretrain_state(cfg, batch)
    step1 = make_pretrain_step(model, projector, None)
    s1, m1 = step1(s1, batch, rng, "mlm")

    model, projector, s8 = init_pretrain_state(cfg, batch)
    mesh = make_mesh(jax.devices()[:8])
    step8 = make_pretrain_step(model, projector, mesh)
    with mesh:
        s8, m8 = step8(s8, shard_batch(mesh, batch), rng, "mlm")

    np.testing.assert_allclose(float(m1["loss"]), float(m8["loss"]), rtol=1e-5)
    for a, b in zip(jax.tree.leaves(s1.params), jax.tree.leaves(s8.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)


@pytest.mark.slow
def test_loss_decreases_over_steps():
    cfg = tiny_cfg(learning_rate=1e-3)
    batch = make_batch(8, seed=5)
    model, projector, state = init_pretrain_state(cfg, batch)
    step = make_pretrain_step(model, projector, None)
    rng = jax.random.key(2)
    losses = []
    for _ in range(8):
        state, metrics = step(state, batch, rng, "sap")
        losses.append(float(metrics["loss"]))
    assert losses[-1] < losses[0], losses


@pytest.mark.slow
def test_block_step_matches_per_step_sequence():
    """make_pretrain_block_step (lax.scan over the step body) must produce
    the same state as N individual dispatches — both with one re-fed batch
    and with a stacked K-batch axis."""
    from vln_bevbert_tpu.parallel.train_step import make_pretrain_block_step

    cfg = tiny_cfg(learning_rate=1e-3)
    batch = make_batch(8, seed=9)
    model, projector, state0 = init_pretrain_state(cfg, batch)
    step = make_pretrain_step(model, projector, None)
    block = make_pretrain_block_step(model, projector, None)
    rng = jax.random.key(3)

    K = 3
    s_seq = state0
    for _ in range(K):
        s_seq, m_seq = step(s_seq, batch, rng, "sap")

    _, _, state0b = init_pretrain_state(cfg, batch)
    s_blk, m_blk = block(state0b, batch, rng, task="sap", length=K)
    assert int(s_blk.step) == K
    np.testing.assert_allclose(
        float(m_seq["loss"]), float(m_blk["loss"]), rtol=1e-5
    )
    for a, b in zip(jax.tree.leaves(s_seq.params), jax.tree.leaves(s_blk.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-6)

    # stacked mode: K distinct micro-batches, one per scan step
    batches = [make_batch(8, seed=20 + i) for i in range(K)]
    stacked = {k: np.stack([b[k] for b in batches]) for k in batches[0]}
    _, _, s0c = init_pretrain_state(cfg, batch)
    s_seq2 = s0c
    for b in batches:
        s_seq2, m2 = step(s_seq2, b, rng, "sap")
    _, _, s0d = init_pretrain_state(cfg, batch)
    s_blk2, mb2 = block(s0d, stacked, rng, task="sap", length=K, stacked=True)
    np.testing.assert_allclose(float(m2["loss"]), float(mb2["loss"]), rtol=1e-5)
    for a, b in zip(jax.tree.leaves(s_seq2.params), jax.tree.leaves(s_blk2.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-6)


def test_fused_update_block_step_matches_default():
    """OptimConfig.fused_update=True (single-tree-pass clip+AdamW,
    optim.py:fused_adamw_clip) must train identically to the default optax
    chain through the REAL compiled block step — same losses, same params —
    exercising trace, lax.scan and state donation on the fused state tree."""
    import dataclasses

    from vln_bevbert_tpu.parallel.train_step import make_pretrain_block_step

    batch = make_batch(8)
    results = []
    for fused in (False, True):
        cfg = tiny_cfg(fused_update=fused, mu_dtype="bfloat16")
        model, projector, state = init_pretrain_state(cfg, batch)
        block = make_pretrain_block_step(model, projector, None, unroll=2)
        rng = jax.random.key(7)
        state, metrics = block(state, batch, rng, task="mlm", length=2)
        state, metrics = block(state, batch, rng, task="sap", length=2)
        results.append((float(metrics["loss"]),
                        jax.tree_util.tree_leaves(state.params)))
    assert np.isclose(results[0][0], results[1][0], rtol=1e-5)
    for a, b in zip(results[0][1], results[1][1]):
        np.testing.assert_allclose(np.asarray(a, np.float32),
                                   np.asarray(b, np.float32),
                                   rtol=5e-5, atol=1e-6)
