"""Capture a jax.profiler trace of the flagship pretrain block step on the
live backend (ROADMAP verification backlog: profile a real train step).

Writes a perfetto/tensorboard-compatible trace under --out (default
/tmp/bevbert_trace); on the tunnelled dev backend device-side events may be
missing — host + compile lanes still localise where step time goes.

Run from the repo root: python benchmarks/profile_step.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np

from vln_bevbert_tpu.utils.cache import enable_persistent_cache

enable_persistent_cache("/tmp/jax_cache")


def main(out_dir: str = "/tmp/bevbert_trace"):
    from vln_bevbert_tpu.configs import PretrainConfig
    from vln_bevbert_tpu.data.synthetic import synthetic_pretrain_batch
    from vln_bevbert_tpu.parallel import init_pretrain_state
    from vln_bevbert_tpu.parallel.train_step import make_pretrain_block_step
    from vln_bevbert_tpu.utils.rng import train_key

    cfg = PretrainConfig()
    rng = np.random.default_rng(0)
    batch = synthetic_pretrain_batch(
        rng, cfg.train_batch_size, cfg.shapes, cfg.model, raw_bev=True
    )
    model, projector, state = init_pretrain_state(cfg, batch)
    # production unroll (bench.py keys it the same way): profile the program
    # that the headline number actually runs
    unroll = 5 if jax.default_backend() == "tpu" else 1
    unroll = int(os.environ.get("BENCH_UNROLL", unroll))
    block = make_pretrain_block_step(model, projector, None, unroll=unroll)
    batch = {k: jax.device_put(v) for k, v in batch.items()}
    key = train_key(0)

    # warm up (compile) outside the trace
    state, metrics = block(state, batch, key, task="sap", length=15)
    print("warm loss", float(metrics["loss"]), flush=True)

    jax.profiler.start_trace(out_dir)
    t0 = time.time()
    state, metrics = block(state, batch, key, task="sap", length=15)
    loss = float(metrics["loss"])
    jax.profiler.stop_trace()
    print(f"traced 15-step sap block: {time.time()-t0:.2f}s loss {loss:.3f}")
    print("trace:", out_dir)


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/tmp/bevbert_trace")
