"""Ablation timing of the flagship pretrain step on the live backend.

Times compiled 15-step scan blocks of VARIANTS of the sap train step and
diffs their wall clock to localise step-time sinks that a tunnel-side
profiler cannot see (device events are missing through the axon tunnel):

  full        : fwd + bwd + clip + AdamW update      (the shipped step)
  no_clip     : fwd + bwd + AdamW, no global-norm clip/metric
  no_opt      : fwd + bwd + grad-sum readout only (no optimizer state)
  no_dropout  : full step, deterministic=True (no dropout masks/RNG)
  fwd_only    : forward loss only (no grad)

Each variant is its own XLA program; diffs are noisy at the ~2% level —
run twice and compare. Prints a JSON dict of seconds per 15-step block.

Run from the repo root: python benchmarks/ablate_step.py
"""
import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from vln_bevbert_tpu.utils.cache import enable_persistent_cache

enable_persistent_cache("/tmp/jax_cache")

LENGTH = 15


def main():
    from vln_bevbert_tpu.configs import PretrainConfig
    from vln_bevbert_tpu.data.synthetic import synthetic_pretrain_batch
    from vln_bevbert_tpu.parallel import init_pretrain_state
    from vln_bevbert_tpu.parallel.train_step import make_loss_fn

    cfg = PretrainConfig()
    rng = np.random.default_rng(0)
    batch = synthetic_pretrain_batch(
        rng, cfg.train_batch_size, cfg.shapes, cfg.model, raw_bev=True
    )
    from vln_bevbert_tpu.utils.rng import train_key

    model, projector, state = init_pretrain_state(cfg, batch)
    loss_fn = make_loss_fn(model, projector)
    batch = {k: jax.device_put(v) for k, v in batch.items()}
    key = train_key(0)  # rbg, like the shipped trainers — threefry dropout
    #                     costs ~30 ms/step extra at this scale (utils/rng.py)
    n_params = sum(x.size for x in jax.tree_util.tree_leaves(state.params))
    print(f"# params {n_params/1e6:.1f}M", file=sys.stderr, flush=True)

    def full_body(state, _):
        r = jax.random.fold_in(key, state.step)
        (loss, _), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.cast_for_grad(), batch, "sap", r
        )
        new_state, _ = state.apply_gradients(grads)
        return new_state, loss

    def no_clip_body(state, _):
        r = jax.random.fold_in(key, state.step)
        (loss, _), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, batch, "sap", r
        )
        updates, new_opt = state.tx.update(grads, state.opt_state, state.params)
        import optax

        return state.replace(
            step=state.step + 1,
            params=optax.apply_updates(state.params, updates),
            opt_state=new_opt,
        ), loss

    def no_opt_body(carry, _):
        params, step = carry
        r = jax.random.fold_in(key, step)
        (loss, _), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, batch, "sap", r
        )
        # keep the grads live via a cheap consumer; params don't change so
        # the scan still has a real carry dependency through step
        gsum = sum(jnp.sum(g) for g in jax.tree_util.tree_leaves(grads))
        return (params, step + 1), loss + 0.0 * gsum

    def no_dropout_body(state, _):
        def det_loss(params):
            b = dict(batch)
            if "mlm_ids" in b:
                pass
            from vln_bevbert_tpu.parallel.train_step import prepare_bev

            bb = prepare_bev(projector, dict(b))
            loss, metrics = model.apply({"params": params}, bb, "sap",
                                        deterministic=True)
            return loss, metrics

        (loss, _), grads = jax.value_and_grad(det_loss, has_aux=True)(
            state.params
        )
        new_state, _ = state.apply_gradients(grads)
        return new_state, loss

    def fwd_only_body(carry, _):
        params, step = carry
        r = jax.random.fold_in(key, step)
        loss, _ = loss_fn(params, batch, "sap", r)
        return (params, step + 1), loss

    # shipping candidate: bf16 grads + bf16 nu with stochastic rounding
    # (OptimConfig.grad_dtype/nu_dtype) on the SAME params
    from vln_bevbert_tpu.configs import OptimConfig
    from vln_bevbert_tpu.parallel.optim import make_optimizer

    def lp_state(**kw):
        c = OptimConfig(**kw)
        tx = make_optimizer(c, params_for_mask=state.params,
                            include_clip=False)
        return state.replace(
            tx=tx, opt_state=tx.init(state.params),
            grad_dtype=None if c.grad_dtype == "float32" else c.grad_dtype,
        )

    state_lp = lp_state(grad_dtype="bfloat16", nu_dtype="bfloat16",
                        state_sr=True)
    # RTN variants: SR bit-generation for 478M moment elements costs more
    # than the bf16 stores save (measured lp_full 48.3 vs full 47.3 ms);
    # with b2=0.98 the nu increment is ~5x above bf16 resolution, so plain
    # round-to-nearest is numerically safe (tests/test_optim.py)
    state_nu16 = lp_state(nu_dtype="bfloat16", state_sr=False)
    state_lp_rtn = lp_state(grad_dtype="bfloat16", nu_dtype="bfloat16",
                            state_sr=False)

    variants = {
        "full": (full_body, state),
        "lp_full": (full_body, state_lp),  # grad_dtype rides on the state
        "nu16_rtn": (full_body, state_nu16),
        "lp_rtn": (full_body, state_lp_rtn),
        "no_clip": (no_clip_body, state),
        "no_dropout": (no_dropout_body, state),
        "no_opt": (no_opt_body, (state.params, state.step)),
        "fwd_only": (fwd_only_body, (state.params, state.step)),
    }
    only = os.environ.get("ABLATE_ONLY")
    if only:
        names = [s.strip() for s in only.split(",")]
        variants = {k: variants[k] for k in names}

    results = {}
    for name, (body, init) in variants.items():
        # fresh buffers per variant: donation below consumes them, and the
        # variants share `state`/`params` leaves
        init = jax.tree_util.tree_map(
            lambda x: jnp.copy(x) if isinstance(x, jax.Array) else x, init
        )
        # donate + rebind the carry exactly like the shipped block step —
        # without donation XLA copies the full 239M-param state per call
        # (measured +27 ms/step), swamping every diff of interest
        @functools.partial(jax.jit, donate_argnums=(0,))
        def block(init):
            carry, losses = jax.lax.scan(body, init, None, length=LENGTH)
            return carry, losses[-1]

        t0 = time.time()
        carry, loss = block(init)
        float(loss)  # compile + run
        print(f"# {name} warmup {time.time()-t0:.0f}s", file=sys.stderr,
              flush=True)
        reps = 3
        t0 = time.time()
        for _ in range(reps):
            carry, loss = block(carry)
        float(loss)
        dt = (time.time() - t0) / reps
        results[name] = round(dt, 4)
        print(f"# {name}: {dt:.3f}s / {LENGTH} steps "
              f"({dt/LENGTH*1e3:.2f} ms/step)", file=sys.stderr, flush=True)
        del carry

    print(json.dumps(results))


if __name__ == "__main__":
    main()
