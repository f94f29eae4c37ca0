"""Bisect dropout cost by site: attention-probs vs hidden vs feat."""
import time

import jax
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from vln_bevbert_tpu.configs import ModelConfig, PretrainConfig
from vln_bevbert_tpu.data.synthetic import synthetic_pretrain_batch
from vln_bevbert_tpu.parallel import init_pretrain_state, make_pretrain_step
from vln_bevbert_tpu.utils.rng import train_key

PEAK = 197e12


def run(label, **mc):
    cfg = PretrainConfig(model=ModelConfig(**mc))
    B = cfg.train_batch_size
    rng = np.random.default_rng(0)
    batch = synthetic_pretrain_batch(rng, B, cfg.shapes, cfg.model, raw_bev=True)
    model, projector, state = init_pretrain_state(cfg, batch)
    step = make_pretrain_step(model, projector, None)
    batch = {k: jax.device_put(v) for k, v in batch.items()}
    key = train_key(0)
    state, m = step(state, batch, key, task="sap"); float(m["loss"])
    t0 = time.time(); N = 10
    for _ in range(N):
        state, m = step(state, batch, key, task="sap")
    float(m["loss"])
    dt = (time.time() - t0) / N
    print(f"{label}: {dt*1e3:.1f} ms/step")


run("sap all dropout")
run("sap attn_drop=0", attention_probs_dropout_prob=0.0)
run("sap hidden_drop=0", hidden_dropout_prob=0.0)
run("sap feat_drop=0", feat_dropout=0.0)
run("sap no dropout", attention_probs_dropout_prob=0.0,
    hidden_dropout_prob=0.0, feat_dropout=0.0)
