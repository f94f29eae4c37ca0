"""Optimizer factory tests: low-precision Adam moments and parity.

The reference trains with AdamW (pretrain_src/optim/misc.py:12-37); here the
moment STORAGE precision is configurable (OptimConfig.mu_dtype/nu_dtype) to
cut the bandwidth-bound optimizer pass. These tests pin: (a) float32
scale_by_adam_lp == optax.scale_by_adam bit-for-bit, (b) stochastic rounding
is unbiased, (c) bf16-state AdamW converges like f32 on a quadratic.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from vln_bevbert_tpu.configs import OptimConfig
from vln_bevbert_tpu.parallel.optim import (
    _stochastic_round,
    lookahead,
    make_optimizer,
    ralamb,
    scale_by_adam_lp,
)


def _tree(seed=0):
    k = jax.random.key(seed)
    return {
        "w": jax.random.normal(jax.random.fold_in(k, 0), (8, 16)),
        "b": jax.random.normal(jax.random.fold_in(k, 1), (16,)),
    }


def test_adam_lp_fp32_matches_optax():
    params = _tree(0)
    tx_ref = optax.scale_by_adam(b1=0.9, b2=0.98, eps=1e-8)
    tx_lp = scale_by_adam_lp(b1=0.9, b2=0.98, eps=1e-8)
    s_ref, s_lp = tx_ref.init(params), tx_lp.init(params)
    for i in range(5):
        grads = jax.tree_util.tree_map(
            lambda p: jnp.sin(p * (i + 1)), params
        )
        u_ref, s_ref = tx_ref.update(grads, s_ref)
        u_lp, s_lp = tx_lp.update(grads, s_lp)
        for a, b in zip(jax.tree_util.tree_leaves(u_ref),
                        jax.tree_util.tree_leaves(u_lp)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-6, atol=1e-7)


def test_stochastic_round_unbiased_and_exact_on_representable():
    # representable bf16 values round exactly
    x = jnp.array([1.0, -2.5, 0.0, 3.140625], jnp.float32)
    bits = jnp.array([0xABCD, 0x1234, 0xFFFF, 0x8000], jnp.uint32)
    out = _stochastic_round(x, bits, jnp.bfloat16)
    np.testing.assert_array_equal(np.asarray(out, np.float32), np.asarray(x))

    # a value a quarter of the way into the bf16 gap above 1.0 (gap = 2^-7)
    # must round up with p ~= 0.25
    lo = jnp.float32(1.0)
    x = lo + 0.25 * (2.0 ** -7)
    key = jax.random.key(7)
    bits = jax.random.bits(key, (20000,), jnp.uint32)
    out = _stochastic_round(jnp.full((20000,), x), bits, jnp.bfloat16)
    frac_up = float(jnp.mean((out.astype(jnp.float32) > lo)))
    assert abs(frac_up - 0.25) < 0.02
    # non-finite passthrough
    out = _stochastic_round(jnp.array([jnp.inf, -jnp.inf, jnp.nan]),
                            jnp.full((3,), 0xFFFF, jnp.uint32), jnp.bfloat16)
    assert np.isinf(np.asarray(out)[0]) and np.isnan(np.asarray(out)[2])


@pytest.mark.parametrize("sr", [True, False])
def test_bf16_state_adamw_converges_like_fp32(sr):
    def loss_fn(p):
        return jnp.sum((p["w"] - 3.0) ** 2) + jnp.sum((p["b"] + 1.0) ** 2)

    def run(nu_dtype, state_sr):
        cfg = OptimConfig(
            learning_rate=0.05, warmup_steps=0, num_train_steps=400,
            weight_decay=0.0, grad_norm=100.0,
            mu_dtype="bfloat16", nu_dtype=nu_dtype, state_sr=state_sr,
        )
        params = _tree(1)
        tx = make_optimizer(cfg, params_for_mask=params)
        st = tx.init(params)

        @jax.jit
        def step(params, st):
            g = jax.grad(loss_fn)(params)
            up, st = tx.update(g, st, params)
            return optax.apply_updates(params, up), st

        for _ in range(300):
            params, st = step(params, st)
        return float(loss_fn(params))

    f32 = run("float32", False)
    bf16 = run("bfloat16", sr)
    # both reach near-zero on the quadratic; bf16 state must not stall
    assert bf16 < max(10.0 * f32, 1e-2), (f32, bf16)


def test_make_optimizer_nu_dtype_state_leaves():
    params = _tree(2)
    cfg = OptimConfig(mu_dtype="bfloat16", nu_dtype="bfloat16")
    tx = make_optimizer(cfg, params_for_mask=params)
    st = tx.init(params)
    # find the ScaleByAdamLPState moment leaves anywhere in the chain state
    flat = jax.tree_util.tree_flatten_with_path(st)[0]
    mu_dts = {str(v.dtype) for p, v in flat if any("mu" in str(k) for k in p)}
    nu_dts = {str(v.dtype) for p, v in flat if any("'nu'" in str(k) or ".nu" in str(k) for k in p)}
    assert "bfloat16" in mu_dts
    assert "bfloat16" in nu_dts
    # one update step executes and keeps dtypes
    g = jax.tree_util.tree_map(jnp.ones_like, params)
    up, st2 = tx.update(g, st, params)
    flat2 = jax.tree_util.tree_flatten_with_path(st2)[0]
    nu_dts2 = {str(v.dtype) for p, v in flat2 if any("'nu'" in str(k) or ".nu" in str(k) for k in p)}
    assert "bfloat16" in nu_dts2


def test_lookahead_sync_math():
    """k=2, alpha=0.5 over constant SGD updates: pin the slow-weight pull
    against hand-computed values (reference lookahead.py:29-54 semantics,
    slow buffer seeded at init per the paper)."""
    p0 = {"w": jnp.array([4.0])}
    tx = lookahead(k=2, alpha=0.5)
    st = tx.init(p0)
    u = {"w": jnp.array([-1.0])}

    # step 1 (no sync): params 4 -> 3, slow stays 4
    u1, st = tx.update(u, st, p0)
    p1 = optax.apply_updates(p0, u1)
    np.testing.assert_allclose(np.asarray(p1["w"]), [3.0])
    np.testing.assert_allclose(np.asarray(st.slow["w"]), [4.0])
    # step 2 (sync): fast candidate 2, slow = 4 + .5*(2-4) = 3, params -> 3
    u2, st = tx.update(u, st, p1)
    p2 = optax.apply_updates(p1, u2)
    np.testing.assert_allclose(np.asarray(p2["w"]), [3.0])
    np.testing.assert_allclose(np.asarray(st.slow["w"]), [3.0])
    # step 3 (no sync): 3 -> 2
    u3, st = tx.update(u, st, p2)
    p3 = optax.apply_updates(p2, u3)
    np.testing.assert_allclose(np.asarray(p3["w"]), [2.0])
    np.testing.assert_allclose(np.asarray(st.slow["w"]), [3.0])
    # step 4 (sync): candidate 1, slow = 3 + .5*(1-3) = 2
    u4, st = tx.update(u, st, p3)
    p4 = optax.apply_updates(p3, u4)
    np.testing.assert_allclose(np.asarray(p4["w"]), [2.0])
    np.testing.assert_allclose(np.asarray(st.slow["w"]), [2.0])


def test_ralamb_first_step_matches_reference_math():
    """Step 1 sits in the un-rectified branch (N_sma < 5): the update must
    be -wd*lr*p - (lr/(1-b1)) * trust_ratio * mu with
    trust_ratio = clamp(||p||,0,10) / ||candidate|| (ralamb.py:58-99)."""
    b1, b2, eps, wd, lr = 0.9, 0.98, 1e-8, 0.01, 0.05
    p = {"w": jnp.array([3.0, -4.0])}  # ||p|| = 5
    g = {"w": jnp.array([1.0, 2.0])}
    tx = ralamb(lambda _: lr, b1=b1, b2=b2, eps=eps, weight_decay=wd)
    st = tx.init(p)
    u, st = tx.update(g, st, p)

    pf = np.array([3.0, -4.0])
    gf = np.array([1.0, 2.0])
    mu = (1 - b1) * gf
    step_size = 1.0 / (1 - b1)  # un-rectified branch at step 1
    p1 = pf - wd * lr * pf
    cand = p1 - step_size * lr * mu
    tr = min(np.linalg.norm(pf), 10.0) / np.linalg.norm(cand)
    expected = (p1 - pf) - step_size * lr * tr * mu
    # impl math is f32, expectation computed in f64: allow f32 rounding
    np.testing.assert_allclose(np.asarray(u["w"]), expected, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(st.mu["w"]), mu, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(st.nu["w"]), (1 - b2) * gf**2,
                               rtol=1e-5)


@pytest.mark.parametrize(
    "name", ["ralamb", "rangerlars", "adam", "adamax", "adamw+lookahead"]
)
def test_make_optimizer_variants_converge(name):
    """Every reference-selectable optimizer (optim/misc.py:25-31 plus the
    lookahead wrapper) builds from the factory and solves a quadratic."""
    def loss_fn(p):
        return jnp.sum((p["w"] - 3.0) ** 2) + jnp.sum((p["b"] + 1.0) ** 2)

    cfg = OptimConfig(
        optim=name, learning_rate=0.1, warmup_steps=0, num_train_steps=500,
        weight_decay=0.0, grad_norm=100.0,
        mu_dtype="float32", nu_dtype="float32",
    )
    params = _tree(4)
    tx = make_optimizer(cfg, params_for_mask=params)
    st = tx.init(params)

    @jax.jit
    def step(params, st):
        g = jax.grad(loss_fn)(params)
        up, st = tx.update(g, st, params)
        return optax.apply_updates(params, up), st

    start = float(loss_fn(params))
    for _ in range(300):
        params, st = step(params, st)
    end = float(loss_fn(params))
    assert np.isfinite(end) and end < 0.05 * start, (name, start, end)


def test_lp_opt_state_orbax_roundtrip(tmp_path):
    """ScaleByAdamLPState keeps its rng key as RAW uint32 data precisely so
    orbax can serialize it; pin the save/restore cycle (the trainer
    checkpoints opt_state through StandardCheckpointer, pretrain/trainer.py)."""
    import orbax.checkpoint as ocp

    params = _tree(3)
    cfg = OptimConfig(mu_dtype="bfloat16", nu_dtype="bfloat16", state_sr=True)
    tx = make_optimizer(cfg, params_for_mask=params)
    st = tx.init(params)
    g = jax.tree_util.tree_map(jnp.ones_like, params)
    _, st = tx.update(g, st, params)

    path = str(tmp_path / "ckpt")
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(path, {"opt_state": st})
        restored = ckptr.restore(path, {"opt_state": st})["opt_state"]

    ref = jax.tree_util.tree_leaves(st)
    got = jax.tree_util.tree_leaves(restored)
    assert len(ref) == len(got)
    for a, b in zip(ref, got):
        assert a.dtype == b.dtype, (a.dtype, b.dtype)
        np.testing.assert_array_equal(
            np.asarray(a, np.float32), np.asarray(b, np.float32)
        )
    # the restored state must keep stepping (raw key data still re-wraps
    # into an rbg key inside update_fn)
    up2, st2 = tx.update(g, restored, params)
    assert all(np.isfinite(np.asarray(x, np.float32)).all()
               for x in jax.tree_util.tree_leaves(up2))


def test_fused_adamw_clip_matches_optax_chain():
    """fused_update=True (one tree pass: clip scale + Adam moments + bias
    correction + decoupled decay + lr, optim.py:fused_adamw_clip) must be
    math-identical to the shipped default (in-body clip + optax.adamw fused
    chain) through TrainState.apply_gradients — params, moments and the
    grad-norm metric, including bf16 mu storage and the no-decay mask."""
    import dataclasses

    from vln_bevbert_tpu.parallel.train_step import TrainState

    params = _tree(5)
    cfg = OptimConfig(
        learning_rate=0.01, warmup_steps=5, num_train_steps=100,
        weight_decay=0.01, grad_norm=1.0, mu_dtype="bfloat16",
    )
    tx_ref = make_optimizer(cfg, params_for_mask=params, include_clip=False)
    tx_fused = make_optimizer(
        dataclasses.replace(cfg, fused_update=True),
        params_for_mask=params, include_clip=False,
    )
    mk = lambda tx: TrainState(  # noqa: E731
        step=jnp.zeros((), jnp.int32), params=params,
        opt_state=tx.init(params), tx=tx, clip_norm=float(cfg.grad_norm),
    )
    s_ref, s_fused = mk(tx_ref), mk(tx_fused)
    for i in range(6):
        # alternate small/large grads so the clip both binds and doesn't
        scale = 3.0 if i % 2 else 0.1
        grads = jax.tree_util.tree_map(
            lambda p: scale * jnp.cos(p * (i + 1)), params
        )
        s_ref, gn_ref = s_ref.apply_gradients(grads)
        s_fused, gn_fused = s_fused.apply_gradients(grads)
        np.testing.assert_allclose(
            np.asarray(gn_fused), np.asarray(gn_ref), rtol=1e-6
        )
        for a, b in zip(jax.tree_util.tree_leaves(s_ref.params),
                        jax.tree_util.tree_leaves(s_fused.params)):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=2e-6, atol=1e-7
            )
    # moments too (mu compares in its bf16 storage dtype)
    mu_ref = [v for p, v in jax.tree_util.tree_flatten_with_path(s_ref.opt_state)[0]
              if any("mu" in str(k) for k in p)]
    mu_fused = [v for p, v in jax.tree_util.tree_flatten_with_path(s_fused.opt_state)[0]
                if any("mu" in str(k) for k in p)]
    assert mu_ref and len(mu_ref) == len(mu_fused)
    for a, b in zip(mu_ref, mu_fused):
        assert a.dtype == jnp.bfloat16 and b.dtype == jnp.bfloat16
        np.testing.assert_allclose(
            np.asarray(a, np.float32), np.asarray(b, np.float32), rtol=1e-6
        )


def test_fused_adamw_rejects_incompatible_configs():
    """The fused path must refuse configs whose semantics it cannot fold in
    (a silent fallback would invalidate any measurement made under the knob)."""
    params = _tree(6)
    base = dict(learning_rate=0.01, fused_update=True)
    with pytest.raises(ValueError):  # chain-clip path owns the clip
        make_optimizer(OptimConfig(**base), params_for_mask=params,
                       include_clip=True)
    for bad in (
        OptimConfig(**base, nu_dtype="bfloat16"),
        OptimConfig(**base, grad_dtype="bfloat16"),
        OptimConfig(**base, optim="adamw+lookahead"),
        OptimConfig(**base, gradient_accumulation_steps=2),
    ):
        with pytest.raises(ValueError):
            make_optimizer(bad, params_for_mask=params, include_clip=False)
