"""Benchmark: pretrain samples/sec/chip on the flagship R2R configuration.

Measures the full compiled pretraining step (device-side BEV lift-splat +
glocal model forward/backward + AdamW update) as compiled task-blocks
(lax.scan over the step body, one block per task of the 5:5:1 mix — see
parallel.make_pretrain_block_step; scan==per-step equality is pinned in
tests/test_train_step.py) at the reference's R2R scale:
bert-base core (9 lang + 2 pano + 2x4 cross-modal layers, hidden 768), batch
16/chip, 21x21 BEV from 12x14x14 CLIP grids, task mix mlm:5/sap:5/masksem:1
(/root/reference/configs/r2r_pretrain.json:8-25, scripts/pt_r2r.bash:4).

Headline honesty: the primary quality signal is the MEASURED ``mfu`` (XLA
cost-analysis FLOPs of the executed programs over wall time against the v5e
bf16 peak). ``vs_baseline`` is a modelled north-star — the reference
publishes no throughput numbers (BASELINE.json published={}), so the A100
side is analytic FLOPs of the same workload at an ASSUMED 20% MFU on 4xA100
bf16 (see BASELINE.md); treat it as a sanity multiple, not a measurement.

Also reports ``finetune_steps_per_sec``: device-time throughput of the
fine-tune replay update (episode-BPTT loss + grad + AdamW at the reference's
ft envelope, batch 4/chip — scripts/ft_r2r.bash:22-62), measured as a
compiled lax.scan of N updates in one program so tunnel RPC latency cannot
contaminate it (nav/agent.py:make_replay_block).

Transient tunnel/backend errors (e.g. FAILED_PRECONDITION mid-readback, the
BENCH_r02 failure mode) are retried up to 3x with fresh state.

Timeout-proofing (the BENCH_r04 failure mode: a cold compile cache on a
fresh machine burned >20 min of warmups and the driver killed the process
before any JSON was printed): the headline JSON line is printed IMMEDIATELY
after the pretrain measurement succeeds, BEFORE the secondary ft/loader/e2e
phases. A wall-clock budget (BENCH_BUDGET_S, default 2400 s) gates each
secondary phase — phases that would start past the budget are skipped with
a logged reason. On full completion a second, enriched JSON line (same
headline fields plus the secondary metrics, including a B=64
production-batch MFU probe — see _measure_pretrain/BENCH_SKIP_B64) is
printed last. Either parse
discipline works: a driver taking the LAST valid JSON line gets the
enriched record (or, if killed mid-phase, the already-flushed headline); a
driver taking the FIRST gets the headline.
"""

from __future__ import annotations

import dataclasses
import hashlib
import json
import os
import sys
import time

import numpy as np

A100_BF16_PEAK = 312e12
ASSUMED_REF_MFU = 0.20
V5E_BF16_PEAK = 197e12  # TPU v5e (v5 lite) bf16 peak per chip

# FLOPs per sample: XLA cost analysis of the PER-STEP programs (the block
# programs under-report — cost analysis counts a lax.scan body once
# regardless of trip count; scan==per-step math is pinned by test). Measured
# once at the flagship config and pinned: AOT-compiling the three step
# programs costs ~10 min on this 1-core host, which cannot live in the bench
# path. BENCH_MEASURE_FLOPS=1 re-derives it. The fingerprint guards the pin:
# if PretrainConfig's defaults drift from the config the constant was
# measured for, the pin is stale and we force a re-measure (ADVICE r2).
FLOPS_PER_SAMPLE_PINNED = 138.65e9  # 2026-08-17, mix-weighted
# mlm:sap:masksem 5:5:1, B=16, fwd+bwd+AdamW, bf16 scores + bf16 adam-mu
# (fingerprint re-pinned for the new OptimConfig nu_dtype/state_sr/grad_dtype
# fields at their f32-equivalent defaults, then again for fused_update=False
# — identical program, same FLOPs)
FLOPS_PINNED_FINGERPRINT = "e27055728bb5"


def _config_fingerprint(cfg) -> str:
    blob = json.dumps(dataclasses.asdict(cfg), sort_keys=True, default=str)
    return hashlib.sha1(blob.encode()).hexdigest()[:12]


def _log(msg: str) -> None:
    print(f"# {msg}", file=sys.stderr, flush=True)


def _with_retry(label: str, fn, attempts: int = 3):
    """Re-run ``fn`` (which must rebuild its own device state) on transient
    backend errors. BENCH_r02 died on a single FAILED_PRECONDITION readback
    through the tunnel during warmup; the identical workload passed on rerun
    — so one flake must not torpedo the round's artifact."""
    import jax

    last = None
    for i in range(attempts):
        try:
            return fn()
        except (jax.errors.JaxRuntimeError, OSError, RuntimeError) as e:
            last = e
            _log(f"{label}: attempt {i + 1}/{attempts} failed: "
                 f"{type(e).__name__}: {str(e).splitlines()[0][:200]}")
            if i + 1 < attempts:
                delay = 20 * (i + 1)
                _log(f"{label}: retrying in {delay}s with fresh state")
                time.sleep(delay)
    raise last


def _measure_pretrain() -> dict:
    import jax

    from vln_bevbert_tpu.configs import PretrainConfig
    from vln_bevbert_tpu.data.synthetic import synthetic_pretrain_batch
    from vln_bevbert_tpu.parallel import init_pretrain_state, make_pretrain_step
    from vln_bevbert_tpu.parallel.train_step import make_pretrain_block_step
    from vln_bevbert_tpu.utils.rng import train_key

    cfg = PretrainConfig()  # reference R2R defaults
    # BENCH_BATCH probes per-chip batches beyond the reference's 16 (e.g. a
    # throughput config at 32). Per-sample FLOPs are batch-invariant for the
    # model body; only the B-independent optimizer term (~0.13 GFLOP/sample
    # at B=16) shifts, so the pinned constant stays honest to <0.1%.
    if os.environ.get("BENCH_BATCH"):
        cfg.train_batch_size = int(os.environ["BENCH_BATCH"])
    # Optimizer-memory/grad dtype probes (same contract as BENCH_BATCH: a
    # documented experiment knob, not a config drift — dtype changes leave
    # the pinned per-sample FLOPs honest; they shift bytes, not math).
    if os.environ.get("BENCH_NU_DTYPE"):
        cfg.optim.nu_dtype = os.environ["BENCH_NU_DTYPE"]
    if os.environ.get("BENCH_MU_DTYPE"):
        cfg.optim.mu_dtype = os.environ["BENCH_MU_DTYPE"]
    if os.environ.get("BENCH_GRAD_DTYPE"):
        cfg.optim.grad_dtype = os.environ["BENCH_GRAD_DTYPE"]
    if os.environ.get("BENCH_STATE_SR"):
        cfg.optim.state_sr = os.environ["BENCH_STATE_SR"] == "1"
    if os.environ.get("BENCH_FUSED_ADAMW"):
        cfg.optim.fused_update = os.environ["BENCH_FUSED_ADAMW"] == "1"
    B = cfg.train_batch_size
    rng = np.random.default_rng(0)
    batch = synthetic_pretrain_batch(rng, B, cfg.shapes, cfg.model, raw_bev=True)
    model, projector, state = init_pretrain_state(cfg, batch)
    # Production default is unroll=5 (+8.5%: 447 vs 412 samples/s, fewer
    # scan carry copies) — but its ~5x bigger executables take minutes each
    # to SHIP through a tunnelled dev backend (platform "axon") even with a
    # warm compile cache, blowing the bench wall-time budget there. Key the
    # default on the backend: PCIe-local TPU gets the production config.
    unroll_default = "5" if jax.default_backend() == "tpu" else "1"
    unroll = int(os.environ.get("BENCH_UNROLL", unroll_default))
    _log(f"backend {jax.default_backend()} -> unroll {unroll}")
    block = make_pretrain_block_step(model, projector, None, unroll=unroll)

    batch = {k: jax.device_put(v) for k, v in batch.items()}
    key = train_key(0)  # rbg keys: hardware RNG for dropout masks

    # exactly the 5:5:1 task mix, grouped as the block-scheduled MetaLoader
    # runs it (task_block_size amortises executable switches): one compiled
    # scan-block per task, 3 dispatches per 33-step mix cycle
    blocks = [(t, int(3 * r)) for t, r in zip(cfg.tasks, cfg.mix_ratio)]

    # Warm up (trace+compile+execute) one block program per task through the
    # normal jit call path; the persistent compilation cache makes reruns
    # cheap. Residual warm-up cost here is shipping the ~80 MB executables
    # over the dev tunnel — PCIe-local (trivial) on a real TPU VM.
    for task, n in blocks:
        t0 = time.time()
        state, metrics = block(state, batch, key, task=task, length=n)
        loss = float(metrics["loss"])  # forces execution through the tunnel
        _log(f"{task} warmup {time.time() - t0:.0f}s loss {loss:.3f}")
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
    _log(f"timed {cycles} cycles in {dt:.1f}s")

    flops_per_sample = FLOPS_PER_SAMPLE_PINNED
    # fingerprint the DEFAULT config: BENCH_BATCH is a documented probe, not
    # a config drift (per-sample FLOPs are batch-invariant, see above)
    fingerprint = _config_fingerprint(PretrainConfig())
    measure = os.environ.get("BENCH_MEASURE_FLOPS") == "1"
    if fingerprint != FLOPS_PINNED_FINGERPRINT:
        _log(f"PretrainConfig fingerprint {fingerprint} != pinned "
             f"{FLOPS_PINNED_FINGERPRINT}: pinned FLOPs stale, re-measuring")
        measure = True
    if measure:
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
    if os.environ.get("BENCH_PER_STEP") == "1":
        step = make_pretrain_step(model, projector, None)
        state, metrics = step(state, batch, key, task="sap")
        float(metrics["loss"])
        t0 = time.time()
        for _ in range(15):
            state, metrics = step(state, batch, key, task="sap")
        float(metrics["loss"])
        per_step_dispatch = 15 * B / (time.time() - t0)

    return {
        "samples_per_sec": samples_per_sec,
        "flops_per_sample": flops_per_sample,
        "per_step_dispatch": per_step_dispatch,
        "batch": B,
    }


def _measure_finetune() -> dict:
    """Device-time replay-update throughput at the reference ft envelope:
    batch 4/chip, 15-step episode BPTT, instruction len 80, 21x21 BEV
    (scripts/ft_r2r.bash:22-62). One compiled scan of FT_BLOCK updates per
    dispatch — the per-dispatch RPC cost amortises to noise.

    Also times the ROLLOUT forward chain (language once + panorama +
    navigation per step, make_rollout_block) — the device envelope of the
    DAgger collection phase, which the replay number does not cover."""
    import jax

    from vln_bevbert_tpu.configs import FinetuneConfig, ShapeConfig
    from vln_bevbert_tpu.data.synthetic import synthetic_replay_bundle
    from vln_bevbert_tpu.nav.agent import (
        make_replay_agent,
        make_replay_block,
        make_rollout_block,
    )
    from vln_bevbert_tpu.utils.rng import train_key

    B = 4
    cfg = FinetuneConfig(shapes=ShapeConfig(max_txt_len=80))
    agent = make_replay_agent(cfg, batch_size=B)
    rb = synthetic_replay_bundle(np.random.default_rng(0), cfg, B)
    rb = {k: jax.device_put(v) for k, v in rb.items()}
    length = int(os.environ.get("BENCH_FT_BLOCK", "4"))
    block = make_replay_block(agent, length)
    key = train_key(1)
    params, opt_state = agent.params, agent.opt_state

    t0 = time.time()
    params, opt_state, losses = block(params, opt_state, rb, key)
    loss = float(losses[-1])
    _log(f"ft warmup {time.time() - t0:.0f}s loss {loss:.3f}")

    reps = 3
    t0 = time.time()
    for _ in range(reps):
        params, opt_state, losses = block(params, opt_state, rb, key)
    float(losses[-1])
    dt = time.time() - t0
    _log(f"ft timed {reps}x{length} updates in {dt:.1f}s")
    steps_per_sec = reps * length / dt
    out = {"steps_per_sec": steps_per_sec, "samples_per_sec": steps_per_sec * B}

    # rollout forwards (episodes per dispatch chosen so one dispatch is ~1s)
    T = rb["targets"].shape[0]
    episodes = int(os.environ.get("BENCH_ROLLOUT_EPISODES", "4"))
    roll = make_rollout_block(agent, episodes)
    t0 = time.time()
    float(roll(params, rb))
    _log(f"rollout warmup {time.time() - t0:.0f}s")
    t0 = time.time()
    for _ in range(reps):
        acc = roll(params, rb)
    float(acc)
    dt = time.time() - t0
    _log(f"rollout timed {reps}x{episodes} episodes ({T} steps) in {dt:.1f}s")
    out["rollout_steps_per_sec"] = reps * episodes * T / dt
    return out


def _measure_e2e() -> dict:
    """End-to-end SYSTEM throughput: the production blocked train loop
    (pretrain/trainer.py:_train_blocked) with the real host loader (prefetch
    thread) building flagship batches, stacking task blocks, shipping them
    host->device, and running the compiled scan on the chip. This is the
    number VERDICT r3 said the headline cannot be read as: device samples/s
    times pre-staged batches; this times the whole pipe.

    Also measures host->device bandwidth with one big timed device_put: on
    the tunnelled dev backend the e2e loop is transfer-bound (a flagship
    block ships ~58 MB/batch over the control link), which the h2d number
    makes legible — on a PCIe-local TPU VM the same loop is loader/device
    bound instead."""
    import tempfile

    import jax

    sys.path.insert(0, os.path.join(os.path.dirname(
        os.path.abspath(__file__)), "benchmarks"))
    from loader_bench import build_world

    from vln_bevbert_tpu.data.loader import PretrainLoader
    from vln_bevbert_tpu.pretrain.trainer import PretrainTrainer

    # host->device bandwidth probe: one 64 MB transfer, timed by readback
    blob = np.zeros((32, 1024, 1024), np.float16)
    x = jax.device_put(blob)  # warm the path
    float(jnp_sum_readback(x))
    t0 = time.time()
    x = jax.device_put(blob)
    float(jnp_sum_readback(x))
    h2d_gbps = blob.nbytes / (time.time() - t0) / 1e9

    with tempfile.TemporaryDirectory() as tmp:
        cfg, nav_db = build_world(tmp)
        # shipped defaults: task_block_size=8, block_unroll=5 — the e2e
        # number measures the production loop as configured
        cfg.valid_steps = 0
        cfg.log_steps = 10_000
        cfg.output_dir = tmp
        loader = PretrainLoader(nav_db, cfg, seed=0, prefetch=4)
        trainer = PretrainTrainer(cfg, loader, output_dir=tmp)

        # warmup: smallest multiple of task_block_size whose deterministic
        # schedule covers every task (compiles each (task, k=15) program)
        k = cfg.task_block_size
        seen, blocks = set(), 0
        while len(seen) < len(cfg.tasks) and blocks < 64:
            seen.add(loader.meta.task_for_step(blocks * k))
            blocks += 1
        warm_steps = blocks * k
        t0 = time.time()
        trainer.train(num_steps=warm_steps)
        _log(f"e2e warmup {warm_steps} steps in {time.time() - t0:.0f}s")

        steps = warm_steps + 10 * k
        t0 = time.time()
        trainer.train(num_steps=steps)
        dt = time.time() - t0
    sps = (steps - warm_steps) * loader.global_batch_size / dt
    _log(f"e2e {sps:.1f} samples/s over {steps - warm_steps} steps "
         f"({dt:.1f}s), h2d {h2d_gbps:.2f} GB/s")
    return {"samples_per_sec": sps, "h2d_gbps": h2d_gbps}


def jnp_sum_readback(x):
    """Force a device round-trip (block_until_ready lies through the tunnel)."""
    import jax.numpy as jnp

    return jnp.sum(x.astype(jnp.float32))


def _measure_loader() -> dict:
    """Host pipeline: samples/s of PretrainLoader.build_batch producing
    flagship batches on a synthetic MP3D-scale world (benchmarks/
    loader_bench.py). Host-only numpy work — the number that must meet the
    device samples/s for the system to be chip-bound end-to-end."""
    import tempfile

    sys.path.insert(0, os.path.join(os.path.dirname(
        os.path.abspath(__file__)), "benchmarks"))
    from loader_bench import build_world

    from vln_bevbert_tpu.data.loader import PretrainLoader

    with tempfile.TemporaryDirectory() as tmp:
        cfg, nav_db = build_world(tmp)
        loader = PretrainLoader(nav_db, cfg, seed=0)
        # cold pass: feature ingest (h5 reads + LRU fills) included
        steps = 3
        t0 = time.time()
        for s in range(steps):
            loader.build_batch(s)
        cold = steps * loader.global_batch_size / (time.time() - t0)
        # steady state: caches warm (the reference holds features in memory
        # too — in_memory=True, dataset.py:87-118); ingest amortises over
        # the first epoch
        t0 = time.time()
        for s in range(steps):
            loader.build_batch(s)
        dt = time.time() - t0
    cores = os.cpu_count() or 1
    sps = steps * loader.global_batch_size / dt
    _log(f"loader {sps:.1f} warm / {cold:.1f} cold samples/s/core "
         f"on {cores} core(s)")
    return {"samples_per_sec_per_core": sps,
            "cold_samples_per_sec_per_core": cold, "cores": cores}


def _headline_record(pre: dict) -> dict:
    """The headline JSON record (driver contract) from the pretrain phase."""
    samples_per_sec = pre["samples_per_sec"]
    flops_per_sample = pre["flops_per_sample"]
    ref_a100_samples_per_sec = (
        A100_BF16_PEAK * ASSUMED_REF_MFU / max(flops_per_sample, 1.0)
    )
    v5e8_total = samples_per_sec * 8
    ref_4xa100_total = ref_a100_samples_per_sec * 4
    # measured model-FLOPs utilisation of this chip: XLA cost-analysis FLOPs
    # of the compiled steps actually executed, over wall time
    mfu = samples_per_sec * flops_per_sample / V5E_BF16_PEAK
    return {
        "metric": "pretrain_samples_per_sec_per_chip",
        "value": round(samples_per_sec, 2),
        "unit": "samples/s/chip",
        "mfu": round(mfu, 4),
        "vs_baseline": round(v5e8_total / ref_4xa100_total, 3),
        "vs_baseline_note": "modelled: v5e-8 (8x this chip) vs 4xA100 "
                            "at ASSUMED 20% MFU; measured signal is mfu",
        "flops_per_sample": round(flops_per_sample / 1e9, 2),
        "flops_unit": "GFLOP (XLA cost analysis, fwd+bwd+opt)",
    }


def main():
    from vln_bevbert_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache("/tmp/jax_cache")

    t_start = time.time()
    budget_s = float(os.environ.get("BENCH_BUDGET_S", "2400"))

    def over_budget(phase: str) -> bool:
        spent = time.time() - t_start
        if spent > budget_s:
            _log(f"{phase} skipped: wall-clock budget exhausted "
                 f"({spent:.0f}s > BENCH_BUDGET_S={budget_s:.0f}s); the "
                 f"headline JSON is already printed")
            return True
        return False

    pre = _with_retry("pretrain", _measure_pretrain)

    # flush the headline the moment it exists (BENCH_r04 lost the round's
    # artifact by printing only after every secondary phase; see module doc)
    headline = _headline_record(pre)
    print(json.dumps(headline), flush=True)

    ft = None
    if os.environ.get("BENCH_SKIP_FT") != "1" and not over_budget("finetune"):
        try:
            ft = _with_retry("finetune", _measure_finetune, attempts=2)
        except Exception as e:  # secondary metric: never sink the artifact
            _log(f"finetune bench skipped after errors: "
                 f"{type(e).__name__}: {str(e).splitlines()[0][:200]}")

    loader = None
    if os.environ.get("BENCH_SKIP_LOADER") != "1" and not over_budget("loader"):
        try:
            loader = _measure_loader()
        except Exception as e:  # secondary metric: never sink the artifact
            _log(f"loader bench skipped after errors: "
                 f"{type(e).__name__}: {str(e).splitlines()[0][:200]}")

    e2e = None
    # BENCH_SKIP_LOADER implies no e2e either: both are host-pipeline
    # measurements (the dtype-knob probes set it to isolate the device step)
    if (os.environ.get("BENCH_SKIP_E2E") != "1"
            and os.environ.get("BENCH_SKIP_LOADER") != "1"
            and not over_budget("e2e")):
        try:
            e2e = _measure_e2e()
        except Exception as e:  # secondary metric: never sink the artifact
            _log(f"e2e bench skipped after errors: "
                 f"{type(e).__name__}: {str(e).splitlines()[0][:200]}")

    # production-batch probe: the same step at B=64 (the measured throughput
    # config — ROADMAP knob table: batch is the lever that pays by fattening
    # the matmul row dimension; the headline stays at the reference's B=16
    # for training-dynamics parity). Runs LAST so it can never starve the
    # established ft/loader/e2e series; skipped past budget, with
    # BENCH_SKIP_B64=1, or when a knob probe already pins BENCH_BATCH.
    pre64 = None
    if (os.environ.get("BENCH_SKIP_B64") != "1"
            and not os.environ.get("BENCH_BATCH")
            and not over_budget("b64")):
        try:
            os.environ["BENCH_BATCH"] = "64"
            pre64 = _with_retry("pretrain_b64", _measure_pretrain, attempts=2)
        except Exception as e:  # secondary metric: never sink the artifact
            _log(f"b64 bench skipped after errors: "
                 f"{type(e).__name__}: {str(e).splitlines()[0][:200]}")
        finally:
            os.environ.pop("BENCH_BATCH", None)

    print(
        json.dumps(
            {
                **_headline_record(pre),
                **(
                    {
                        "finetune_steps_per_sec": round(ft["steps_per_sec"], 3),
                        "finetune_samples_per_sec_per_chip": round(
                            ft["samples_per_sec"], 2
                        ),
                        "finetune_method": "compiled lax.scan of replay "
                                           "updates (device time, B=4, T=15)",
                        **(
                            {
                                "rollout_steps_per_sec": round(
                                    ft["rollout_steps_per_sec"], 2
                                ),
                                "rollout_method": "compiled scan of the live "
                                                  "rollout's per-step forward "
                                                  "chain (language + panorama "
                                                  "+ navigation, device time, "
                                                  "B=4)",
                            }
                            if "rollout_steps_per_sec" in ft else {}
                        ),
                    }
                    if ft is not None else {}
                ),
                **(
                    {
                        "loader_samples_per_sec_per_core": round(
                            loader["samples_per_sec_per_core"], 2
                        ),
                        "loader_cold_samples_per_sec_per_core": round(
                            loader["cold_samples_per_sec_per_core"], 2
                        ),
                        "loader_cores": loader["cores"],
                        "loader_note": "host batch synthesis (warm feature "
                                       "LRU / cold ingest), measured on this "
                                       "host; the device number times "
                                       "pre-staged batches — end-to-end is "
                                       "host-bound unless per_core x host "
                                       "cores covers the device rate",
                    }
                    if loader is not None else {}
                ),
                **(
                    {
                        "e2e_samples_per_sec": round(e2e["samples_per_sec"], 2),
                        "h2d_gbps": round(e2e["h2d_gbps"], 3),
                        "e2e_note": "full system: host loader (prefetch "
                                    "thread) -> stacked task blocks -> "
                                    "host-to-device -> compiled scan on "
                                    "chip; transfer-bound when h2d_gbps x "
                                    "per-sample bytes < device rate (the "
                                    "tunnelled dev backend case)",
                    }
                    if e2e is not None else {}
                ),
                **(
                    {
                        "b64_samples_per_sec_per_chip": round(
                            pre64["samples_per_sec"], 2
                        ),
                        "b64_mfu": round(
                            pre64["samples_per_sec"]
                            * pre64["flops_per_sample"] / V5E_BF16_PEAK, 4
                        ),
                        "b64_note": "same step at per-chip batch 64 (the "
                                    "production throughput config; headline "
                                    "stays at the reference's B=16 for "
                                    "training-dynamics parity)",
                    }
                    if pre64 is not None else {}
                ),
                **(
                    {"per_step_dispatch_samples_per_sec": round(pre["per_step_dispatch"], 2)}
                    if pre["per_step_dispatch"] is not None else {}
                ),
            }
        ),
        flush=True,
    )


if __name__ == "__main__":
    main()
