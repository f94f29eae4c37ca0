"""Verify fused pallas dropout + low-precision Adam on the real TPU."""
import time

import jax
import jax.numpy as jnp
import numpy as np

print("backend", jax.default_backend(), jax.devices(), flush=True)

from vln_bevbert_tpu.ops.dropout import fused_dropout

# --- 1. fused dropout semantics at a production-like shape (attn probs) ---
rate = 0.1
key = jax.random.key(42)
x = jax.device_put(jnp.ones((16, 12, 441, 441), jnp.bfloat16))

f = jax.jit(lambda x, k: fused_dropout(x, rate, k))
t0 = time.time()
y = f(x, key)
y_host = np.asarray(y, np.float32)
print(f"fwd compile+run {time.time()-t0:.1f}s", flush=True)

kept = y_host != 0.0
frac_kept = kept.mean()
assert abs(frac_kept - (1 - rate)) < 2e-3, frac_kept
vals = np.unique(y_host[kept])
print("keep frac", round(float(frac_kept), 5), "kept values", vals[:4])
expected = np.float32(jnp.asarray(1.0 / (1 - rate), jnp.bfloat16))
assert np.allclose(vals, expected), (vals, expected)

# per-row independence: rows must not share a mask
row_masks = kept.reshape(16, -1)
agree = (row_masks[0] == row_masks[1]).mean()
assert 0.7 < agree < 0.95, agree  # ~ (1-r)^2 + r^2 = 0.82
print("row mask agreement", round(float(agree), 4), "(expect ~0.82)")

# determinism: same key -> same mask
y2 = np.asarray(f(x, key))
assert (y2 == y_host).all()
# different key -> different mask
y3 = np.asarray(f(x, jax.random.key(7)))
assert not ((y3 != 0) == kept).all()
print("determinism ok", flush=True)

# --- 2. vjp regenerates the same mask ---
g = jax.jit(jax.grad(lambda x, k: jnp.sum(fused_dropout(x, rate, k) ** 2),
                     argnums=0))
dx = np.asarray(g(x.astype(jnp.float32), key), np.float32)
# d/dx of (s*x)^2 = 2*s^2*x on kept elements, 0 on dropped
mask_from_grad = dx != 0.0
assert (mask_from_grad == kept).all(), "bwd mask != fwd mask"
s = 1.0 / (1 - rate)
assert np.allclose(dx[mask_from_grad], 2 * s * s, rtol=2e-2)
print("vjp mask identity ok", flush=True)

# --- 3. odd shapes / dtypes / rates ---
for shape, dt, r in [((16, 441, 768), jnp.float32, 0.3),
                     ((4, 50, 37), jnp.bfloat16, 0.45),
                     ((16, 13), jnp.float32, 0.1)]:
    xx = jax.device_put(jnp.ones(shape, dt))
    yy = np.asarray(jax.jit(lambda a: fused_dropout(a, r, key))(xx),
                    np.float32)
    fk = (yy != 0).mean()
    assert abs(fk - (1 - r)) < 0.02, (shape, r, fk)
    print("shape", shape, str(dt.__name__ if hasattr(dt, '__name__') else dt),
          "rate", r, "keep", round(float(fk), 4), flush=True)

# --- 4. one flagship train step with lp optimizer + bf16 grads ---
from vln_bevbert_tpu.configs import OptimConfig, PretrainConfig
from vln_bevbert_tpu.data.synthetic import synthetic_pretrain_batch
from vln_bevbert_tpu.parallel import init_pretrain_state, make_pretrain_step
from vln_bevbert_tpu.utils.rng import train_key

for name, okw in [
    ("f32", {}),
    ("lp_rtn", dict(grad_dtype="bfloat16", nu_dtype="bfloat16",
                    mu_dtype="bfloat16", state_sr=False)),
    ("lp_sr", dict(grad_dtype="bfloat16", nu_dtype="bfloat16",
                   mu_dtype="bfloat16", state_sr=True)),
]:
    cfg = PretrainConfig(optim=OptimConfig(**okw))
    rng = np.random.default_rng(0)
    batch = synthetic_pretrain_batch(rng, 16, cfg.shapes, cfg.model,
                                     raw_bev=True)
    model, projector, state = init_pretrain_state(cfg, batch)
    step = make_pretrain_step(model, projector, None)
    batch = {k: jax.device_put(v) for k, v in batch.items()}
    t0 = time.time()
    losses = []
    for i in range(3):
        state, metrics = step(state, batch, train_key(0), "sap")
        losses.append(float(metrics["loss"]))
    assert all(np.isfinite(losses)), losses
    assert losses[-1] < losses[0], losses  # optimizer moves downhill
    print(f"{name}: losses {['%.4f' % l for l in losses]} "
          f"({time.time()-t0:.0f}s incl compile)", flush=True)

print("ALL OK", flush=True)
