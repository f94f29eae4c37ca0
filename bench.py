"""Benchmark: pretrain samples/sec/chip on the flagship R2R configuration.

Measures the full compiled pretraining step (device-side BEV lift-splat +
glocal model forward/backward + AdamW update) as compiled task-blocks
(lax.scan over the step body, one block per task of the 5:5:1 mix — see
parallel.make_pretrain_block_step; scan==per-step equality is pinned in
tests/test_train_step.py) at the reference's R2R scale:
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

    from vln_bevbert_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache("/tmp/jax_cache")

    from vln_bevbert_tpu.configs import PretrainConfig
    from vln_bevbert_tpu.parallel import init_pretrain_state, make_pretrain_step
    from vln_bevbert_tpu.parallel.train_step import make_pretrain_block_step

    cfg = PretrainConfig()  # reference R2R defaults
    B = cfg.train_batch_size
    rng = np.random.default_rng(0)
    from vln_bevbert_tpu.data.synthetic import synthetic_pretrain_batch

    batch = synthetic_pretrain_batch(rng, B, cfg.shapes, cfg.model, raw_bev=True)
    model, projector, state = init_pretrain_state(cfg, batch)
    unroll = int(os.environ.get("BENCH_UNROLL", "1"))
    # BENCH_UNROLL=5 measures the production config: +8.5% (447 vs 412
    # samples/s, fewer scan carry copies) — but its ~5x bigger executables
    # take minutes each to ship through the tunnelled dev backend even with
    # a warm compile cache, blowing the bench wall-time budget, so the
    # default stays 1 here. On a PCIe-local TPU VM, use 5.
    block = make_pretrain_block_step(model, projector, None, unroll=unroll)

    batch = {k: jax.device_put(v) for k, v in batch.items()}
    from vln_bevbert_tpu.utils.rng import train_key

    key = train_key(0)  # rbg keys: hardware RNG for dropout masks

    # exactly the 5:5:1 task mix, grouped as the block-scheduled MetaLoader
    # runs it (task_block_size amortises executable switches): one compiled
    # scan-block per task, 3 dispatches per 33-step mix cycle
    blocks = [(t, int(3 * r)) for t, r in zip(cfg.tasks, cfg.mix_ratio)]

    import sys

    # Warm up (trace+compile+execute) one block program per task through the
    # normal jit call path; the persistent compilation cache makes reruns
    # cheap. Residual warm-up cost here is shipping the ~80 MB executables
    # over the dev tunnel — PCIe-local (trivial) on a real TPU VM.
    for task, n in blocks:
        t0 = time.time()
        state, metrics = block(state, batch, key, task=task, length=n)
        loss = float(metrics["loss"])  # forces execution through the tunnel
        print(f"# {task} warmup {time.time()-t0:.0f}s loss {loss:.3f}",
              file=sys.stderr, flush=True)
    # NB: block_until_ready is unreliable through remote-tunnel backends; a
    # host readback of a value depending on the full chain is the only sync.

    # headline: compiled task-blocks (lax.scan over the step), 6 mix cycles
    cycles = 6
    t0 = time.time()
    for _ in range(cycles):
        for task, n in blocks:
            state, metrics = block(state, batch, key, task=task, length=n)
    float(metrics["loss"])  # forces the whole state chain
    dt = time.time() - t0
    print(f"# timed {cycles} cycles in {dt:.1f}s", file=sys.stderr, flush=True)

    # FLOPs per sample: XLA cost analysis of the PER-STEP programs (the
    # block programs under-report — cost analysis counts a lax.scan body
    # once regardless of trip count; scan==per-step math is pinned by test).
    # Measured once at the flagship config and pinned: AOT-compiling the
    # three step programs costs ~10 min on this 1-core host, which cannot
    # live in the bench path. BENCH_MEASURE_FLOPS=1 re-derives it.
    FLOPS_PER_SAMPLE_PINNED = 138.64e9  # 2026-08-16, mix-weighted
    # mlm:sap:masksem 5:5:1, B=16, fwd+bwd+AdamW, bf16 scores program
    flops_per_sample = FLOPS_PER_SAMPLE_PINNED
    if os.environ.get("BENCH_MEASURE_FLOPS") == "1":
        step = make_pretrain_step(model, projector, None)
        flops_per_task = {}
        for task, n in blocks:
            compiled = step.lower(state, batch, key, task=task).compile()
            cost = compiled.cost_analysis()
            flops_per_task[task] = float(cost.get("flops", 0.0)) if cost else 0.0
        dist_ = np.array(cfg.mix_ratio) / sum(cfg.mix_ratio)
        flops_per_sample = float(
            sum(d * flops_per_task[t] for d, t in zip(dist_, cfg.tasks))
        ) / B

    n_samples = cycles * sum(n for _, n in blocks) * B
    samples_per_sec = n_samples / dt

    # optional secondary: one host dispatch per optimizer step — through a
    # tunnelled dev backend this measures control-link RPC latency, not the
    # chip, so it is off by default (BENCH_PER_STEP=1 enables; +1 compile)
    per_step_dispatch = None
    import os as _os

    if _os.environ.get("BENCH_PER_STEP") == "1":
        step = make_pretrain_step(model, projector, None)
        state, metrics = step(state, batch, key, task="sap")
        float(metrics["loss"])
        t0 = time.time()
        for _ in range(15):
            state, metrics = step(state, batch, key, task="sap")
        float(metrics["loss"])
        per_step_dispatch = 15 * B / (time.time() - t0)

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
                **(
                    {"per_step_dispatch_samples_per_sec": round(per_step_dispatch, 2)}
                    if per_step_dispatch is not None else {}
                ),
            }
        )
    )


if __name__ == "__main__":
    main()
