"""Benchmark: pretrain samples/sec/chip on the flagship R2R configuration.

Measures the full compiled pretraining step (device-side BEV lift-splat +
glocal model forward/backward + AdamW update) at the reference's R2R scale:
bert-base core (9 lang + 2 pano + 2x4 cross-modal layers, hidden 768), batch
16/chip, 21x21 BEV from 12x14x14 CLIP grids, task mix mlm:5/sap:5/masksem:1
(/root/reference/configs/r2r_pretrain.json:8-25, scripts/pt_r2r.bash:4).

``vs_baseline`` is the north-star comparison from BASELINE.md: a v5e-8 slice
(8 x this chip's measured throughput; DP scaling validated on the virtual
8-device mesh in tests/test_train_step.py) against the reference's 4xA100 DDP
rig. The reference publishes no throughput numbers (BASELINE.json
published={}), so the A100 side is modelled: analytic FLOPs of the same
workload (taken from XLA's compiled cost analysis) at an assumed 20% MFU on
A100 bf16 peak (312 TFLOP/s) — generous for a torch-1.9 eager pipeline with
h5py worker loading and per-sample python splat loops (SURVEY.md section 3.1
hot spots). vs_baseline > 1 means the v5e-8 beats the modelled 4xA100.

Prints ONE json line: {"metric", "value", "unit", "vs_baseline"}.
"""

from __future__ import annotations

import json
import time

import jax
import numpy as np

A100_BF16_PEAK = 312e12
ASSUMED_REF_MFU = 0.20
V5E_BF16_PEAK = 197e12  # TPU v5e (v5 lite) bf16 peak per chip


def main():
    import os

    os.makedirs("/tmp/jax_cache", exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from vln_bevbert_tpu.configs import PretrainConfig
    from vln_bevbert_tpu.parallel import init_pretrain_state, make_pretrain_step

    cfg = PretrainConfig()  # reference R2R defaults
    B = cfg.train_batch_size
    rng = np.random.default_rng(0)
    from vln_bevbert_tpu.data.synthetic import synthetic_pretrain_batch

    batch = synthetic_pretrain_batch(rng, B, cfg.shapes, cfg.model, raw_bev=True)
    model, projector, state = init_pretrain_state(cfg, batch)
    step = make_pretrain_step(model, projector, None)

    batch = {k: jax.device_put(v) for k, v in batch.items()}
    from vln_bevbert_tpu.utils.rng import train_key

    key = train_key(0)  # rbg keys: hardware RNG for dropout masks

    # exactly the 5:5:1 task mix, grouped as the block-scheduled MetaLoader
    # runs it (task_block_size amortises executable switches)
    mix = ["mlm"] * 15 + ["sap"] * 15 + ["masksem"] * 3

    # compile all tasks + estimate FLOPs of one step from XLA cost analysis
    flops_per_task = {}
    for task in cfg.tasks:
        lowered = step.lower(state, batch, key, task=task)
        compiled = lowered.compile()
        cost = compiled.cost_analysis()
        flops_per_task[task] = float(cost.get("flops", 0.0)) if cost else 0.0
        state, metrics = step(state, batch, key, task=task)
    # NB: block_until_ready is unreliable through remote-tunnel backends; a
    # host readback of a value depending on the full chain is the only sync.
    float(metrics["loss"])

    t0 = time.time()
    for task in mix:
        state, metrics = step(state, batch, key, task=task)
    float(metrics["loss"])  # forces the whole state chain
    dt = time.time() - t0

    n_samples = len(mix) * B
    samples_per_sec = n_samples / dt

    dist = np.array(cfg.mix_ratio) / sum(cfg.mix_ratio)
    mean_flops = float(
        sum(d * flops_per_task[t] for d, t in zip(dist, cfg.tasks))
    )
    flops_per_sample = mean_flops / B
    ref_a100_samples_per_sec = (
        A100_BF16_PEAK * ASSUMED_REF_MFU / max(flops_per_sample, 1.0)
    )
    v5e8_total = samples_per_sec * 8
    ref_4xa100_total = ref_a100_samples_per_sec * 4

    # measured model-FLOPs utilisation of this chip: XLA cost-analysis FLOPs
    # of the compiled steps actually executed, over wall time
    mfu = samples_per_sec * flops_per_sample / V5E_BF16_PEAK

    print(
        json.dumps(
            {
                "metric": "pretrain_samples_per_sec_per_chip",
                "value": round(samples_per_sec, 2),
                "unit": "samples/s/chip",
                "vs_baseline": round(v5e8_total / ref_4xa100_total, 3),
                "mfu": round(mfu, 4),
                "flops_per_sample": round(flops_per_sample / 1e9, 2),
                "flops_unit": "GFLOP (XLA cost analysis, fwd+bwd+opt)",
            }
        )
    )


if __name__ == "__main__":
    main()
