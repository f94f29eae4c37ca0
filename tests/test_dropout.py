"""Fused-dropout component tests (CPU: exercises the jax.random fallback and
the module contract; the pallas kernel itself is TPU-only and verified on
hardware — see ops/dropout.py docstring for the semantics both paths share).

Reference dropout sites: attention probs vilmodel.py:135, hidden/FFN
vilmodel.py:164-193 (/root/reference/pretrain_src/model/).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vln_bevbert_tpu.ops.dropout import Dropout, _grid_split, fused_dropout


def test_keep_fraction_and_scale():
    x = jnp.ones((64, 1024))
    y = np.asarray(fused_dropout(x, 0.3, jax.random.key(0)))
    kept = y != 0
    assert abs(kept.mean() - 0.7) < 0.02
    np.testing.assert_allclose(y[kept], 1.0 / 0.7, rtol=1e-6)


def test_rate_zero_identity_and_grad_mask():
    x = jnp.arange(12.0).reshape(3, 4)
    assert fused_dropout(x, 0.0, jax.random.key(1)) is x

    def f(x):
        return jnp.sum(fused_dropout(x, 0.5, jax.random.key(2)) ** 2)

    x = jnp.ones((16, 256))
    dx = np.asarray(jax.grad(f)(x))
    y = np.asarray(fused_dropout(x, 0.5, jax.random.key(2)))
    # gradient flows exactly through the kept elements
    np.testing.assert_array_equal(dx != 0, y != 0)


def test_mult_mask_matches_where_path(monkeypatch):
    """VLN_BEVBERT_MULT_MASK=1 reformulates the fallback as x * mask * scale;
    same bernoulli draw => same mask stream, values equal up to a 1-ulp
    div-vs-reciprocal difference."""
    x = jax.random.normal(jax.random.key(3), (32, 512))
    key = jax.random.key(4)
    ref = np.asarray(fused_dropout(x, 0.3, key))
    monkeypatch.setenv("VLN_BEVBERT_MULT_MASK", "1")
    got = np.asarray(fused_dropout(x, 0.3, key))
    np.testing.assert_array_equal(got != 0, ref != 0)
    np.testing.assert_allclose(got, ref, rtol=2e-7)

    def f(x):
        return jnp.sum(fused_dropout(x, 0.5, jax.random.key(5)) ** 2)

    dx = np.asarray(jax.grad(f)(x))
    y = np.asarray(fused_dropout(x, 0.5, jax.random.key(5)))
    np.testing.assert_array_equal(dx != 0, y != 0)


def test_bool_mask_bitwise_identical(monkeypatch):
    """VLN_BEVBERT_BOOL_MASK=1 only inserts an optimization_barrier on the
    keep predicate (an XLA layout/fusion constraint): outputs and grads must
    be BITWISE identical to the default path, jitted and eager."""
    x = jax.random.normal(jax.random.key(6), (32, 512))
    key = jax.random.key(7)

    def f(x):
        return jnp.sum(fused_dropout(x, 0.3, key) ** 2)

    # jit-vs-jit comparison (eager vs jit may differ in fusion/FMA); the env
    # var is read at trace time, so trace fresh lambdas under each setting
    ref = np.asarray(jax.jit(lambda x: fused_dropout(x, 0.3, key))(x))
    dref = np.asarray(jax.jit(jax.grad(lambda x: f(x)))(x))
    monkeypatch.setenv("VLN_BEVBERT_BOOL_MASK", "1")
    got = np.asarray(jax.jit(lambda x: fused_dropout(x, 0.3, key))(x))
    np.testing.assert_array_equal(got != 0, ref != 0)
    np.testing.assert_allclose(got, ref, rtol=2e-7)
    dgot = np.asarray(jax.jit(jax.grad(lambda x: f(x)))(x))
    np.testing.assert_allclose(dgot, dref, rtol=2e-7)


def test_module_contract():
    import flax.linen as nn

    class Net(nn.Module):
        @nn.compact
        def __call__(self, x, *, deterministic=True):
            return Dropout(0.4)(x, deterministic=deterministic)

    net = Net()
    x = jnp.ones((8, 128))
    # deterministic: identity, no rng needed
    y = net.apply({}, x, deterministic=True)
    np.testing.assert_array_equal(np.asarray(y), np.asarray(x))
    # stochastic: needs the "dropout" rng collection, reproducible per key
    y1 = net.apply({}, x, deterministic=False,
                   rngs={"dropout": jax.random.key(3)})
    y2 = net.apply({}, x, deterministic=False,
                   rngs={"dropout": jax.random.key(3)})
    np.testing.assert_array_equal(np.asarray(y1), np.asarray(y2))
    y3 = net.apply({}, x, deterministic=False,
                   rngs={"dropout": jax.random.key(4)})
    assert (np.asarray(y1) != np.asarray(y3)).any()
    with pytest.raises(Exception):
        net.apply({}, x, deterministic=False)  # missing rng fails loudly


def test_sdy_sharding_rule_parses():
    # Shardy (the default partitioner since jax 0.9) requires an explicit
    # sharding_rule on custom_partitioning ops — callbacks alone abort
    # compilation even single-chip (BENCH r3 failure mode). Pin that the
    # generated einsum rule parses for every rank the model emits and that
    # only the batch factor passes through.
    from jax._src.custom_partitioning_sharding_rule import (
        str_to_sdy_sharding_rule,
    )

    from vln_bevbert_tpu.ops.dropout import _sdy_rule_for_rank

    for nd in (2, 3, 4, 5):
        rule, kw = _sdy_rule_for_rank(nd)
        parsed = str_to_sdy_sharding_rule(rule, **kw)
        assert len(parsed.operand_mappings[0]) == nd
        assert parsed.operand_mappings[1] == ("b",)
        assert parsed.need_replication_factors == tuple(
            f"f{i}" for i in range(1, nd)
        )


def test_grid_split_fits_budget():
    # attention-probs shape at the flagship scale, bf16
    grid, block = _grid_split((16, 12, 441, 441), 2)
    n = 1
    for s in block:
        n *= s
    assert n * (2 * 2 + 4) <= 6 * 1024 * 1024
    assert grid and grid[0] == 16
    # small tensors stay whole-row
    grid, block = _grid_split((16, 768), 4)
    assert grid == (16,) and block == (768,)
