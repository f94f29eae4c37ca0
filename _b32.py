import time, numpy as np, jax
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
from vln_bevbert_tpu.configs import PretrainConfig
from vln_bevbert_tpu.parallel import init_pretrain_state, make_pretrain_step
from vln_bevbert_tpu.data.synthetic import synthetic_pretrain_batch

for B in (32, 64):
    cfg = PretrainConfig(train_batch_size=B)
    batch = synthetic_pretrain_batch(np.random.default_rng(0), B, cfg.shapes, cfg.model, raw_bev=True)
    model, projector, state = init_pretrain_state(cfg, batch)
    step = make_pretrain_step(model, projector, None)
    batch = {k: jax.device_put(v) for k, v in batch.items()}
    key = jax.random.key(0)
    state, m = step(state, batch, key, task="sap")
    float(m["loss"])
    t0 = time.time(); n = 20
    for _ in range(n):
        state, m = step(state, batch, key, task="sap")
    float(m["loss"])
    dt = (time.time()-t0)/n
    print(f"B={B}: {dt*1e3:.1f} ms/step -> {B/dt:.0f} samples/s (sap)", flush=True)
