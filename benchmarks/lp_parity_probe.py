"""Loss-trajectory parity probe: f32 AdamW vs bf16-state/bf16-grad AdamW.

Runs the SAME 45 sap steps (same init, same data, same dropout keys) under
(a) the f32 baseline optimizer config and (b) the low-precision config
(grad_dtype=bfloat16, nu_dtype=bfloat16, stochastic rounding), and prints
both loss trajectories. The two must track each other to ~1e-2 relative by
step 45 — bf16 moment storage and bf16 grads are noise-level perturbations
when the update math stays f32 (parallel/optim.py:scale_by_adam_lp).

Run from the repo root: python benchmarks/lp_parity_probe.py
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np

from vln_bevbert_tpu.utils.cache import enable_persistent_cache

enable_persistent_cache("/tmp/jax_cache")

STEPS = 45


def run(optim_kwargs):
    from vln_bevbert_tpu.configs import OptimConfig, PretrainConfig
    from vln_bevbert_tpu.data.synthetic import synthetic_pretrain_batch
    from vln_bevbert_tpu.parallel import init_pretrain_state
    from vln_bevbert_tpu.parallel.train_step import make_pretrain_block_step
    from vln_bevbert_tpu.utils.rng import train_key

    cfg = PretrainConfig(optim=OptimConfig(**optim_kwargs))
    rng = np.random.default_rng(0)
    batch = synthetic_pretrain_batch(
        rng, cfg.train_batch_size, cfg.shapes, cfg.model, raw_bev=True
    )
    model, projector, state = init_pretrain_state(cfg, batch)
    block = make_pretrain_block_step(model, projector, None)
    batch = {k: jax.device_put(v) for k, v in batch.items()}
    key = train_key(0)
    losses = []
    for _ in range(STEPS // 15):
        state, metrics = block(state, batch, key, task="sap", length=15)
        losses.append(float(metrics["loss"]))
    return losses


def main():
    f32 = run(dict(mu_dtype="float32", nu_dtype="float32",
                   grad_dtype="float32"))
    print(f"# f32 losses {f32}", file=sys.stderr, flush=True)
    lp = run(dict(mu_dtype="bfloat16", nu_dtype="bfloat16",
                  grad_dtype="bfloat16", state_sr=True))
    print(f"# lp  losses {lp}", file=sys.stderr, flush=True)
    rel = [abs(a - b) / max(abs(a), 1e-6) for a, b in zip(f32, lp)]
    print(json.dumps({"f32": f32, "lp": lp, "max_rel": max(rel)}))


if __name__ == "__main__":
    main()
