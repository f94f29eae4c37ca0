"""Round-2 ablations with rbg keys: per-task, fwd share, optimizer cost."""
import time

import jax
import numpy as np
import optax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from vln_bevbert_tpu.configs import PretrainConfig
from vln_bevbert_tpu.data.synthetic import synthetic_pretrain_batch
from vln_bevbert_tpu.parallel import init_pretrain_state, make_pretrain_step
from vln_bevbert_tpu.parallel.train_step import make_loss_fn
from vln_bevbert_tpu.utils.rng import train_key

PEAK = 197e12
cfg = PretrainConfig()
B = cfg.train_batch_size
rng = np.random.default_rng(0)
batch = synthetic_pretrain_batch(rng, B, cfg.shapes, cfg.model, raw_bev=True)
model, projector, state = init_pretrain_state(cfg, batch)
batch = {k: jax.device_put(v) for k, v in batch.items()}
key = train_key(0)

step = make_pretrain_step(model, projector, None)
for task in cfg.tasks:
    compiled = step.lower(state, batch, key, task=task).compile()
    fl = float(compiled.cost_analysis().get("flops", 0))
    state, m = step(state, batch, key, task=task); float(m["loss"])
    t0 = time.time(); N = 10
    for _ in range(N):
        state, m = step(state, batch, key, task=task)
    float(m["loss"])
    dt = (time.time() - t0) / N
    print(f"{task}: {dt*1e3:.1f} ms  {fl/1e9:.0f} GFLOP  MFU={fl/dt/PEAK*100:.1f}%")

# fwd-only with rbg dropout
loss_fn = make_loss_fn(model, projector)
f = jax.jit(lambda p, b: loss_fn(p, b, "sap", key)[0])
fl = float(f.lower(state.params, batch).compile().cost_analysis().get("flops", 0))
float(f(state.params, batch))
t0 = time.time()
for _ in range(10):
    out = f(state.params, batch)
float(out)
dt = (time.time() - t0) / 10
print(f"sap fwd-only rbg: {dt*1e3:.1f} ms  {fl/1e9:.0f} GFLOP  MFU={fl/dt/PEAK*100:.1f}%")

# grad-only (no optimizer update)
g = jax.jit(lambda p, b: jax.grad(lambda pp, bb: loss_fn(pp, bb, "sap", key)[0])(p, b))
gl = float(g.lower(state.params, batch).compile().cost_analysis().get("flops", 0))
out = g(state.params, batch); float(jax.tree.leaves(out)[0].sum())
t0 = time.time()
for _ in range(10):
    out = g(state.params, batch)
float(jax.tree.leaves(out)[0].sum())
dt = (time.time() - t0) / 10
print(f"sap fwd+bwd only: {dt*1e3:.1f} ms  {gl/1e9:.0f} GFLOP  MFU={gl/dt/PEAK*100:.1f}%")
