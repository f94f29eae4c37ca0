"""Optimiser / LR-schedule factory (optax).

Parity with the reference's vendored optimisers and schedules
(/root/reference/pretrain_src/optim/): AdamW with bias/LayerNorm excluded
from weight decay (build_optimizer, optim/misc.py:12-37), linear
warmup-then-decay (get_lr_sched, optim/sched.py:10-29), noam alternative,
global-norm clipping applied before the update (train_r2r.py:296-303).
Variant coverage (optim/misc.py:25-31 + the vendored files): adam, adamax,
adamw, radam (optax.radam), lamb, ralamb (custom transform, ralamb.py
parity incl. the candidate-norm trust ratio), rangerlars =
Lookahead(Ralamb) (rangerlars.py:12-14), and a "+lookahead" wrapper
(lookahead.py, alpha=0.5/k=6) applicable to any base.
"""

from __future__ import annotations

from typing import Any, NamedTuple, Optional

import optax

from ..configs import OptimConfig


def lr_schedule(cfg: OptimConfig):
    if cfg.lr_schedule == "linear":
        return optax.schedules.join_schedules(
            [
                optax.schedules.linear_schedule(0.0, cfg.learning_rate, cfg.warmup_steps),
                optax.schedules.linear_schedule(
                    cfg.learning_rate, 0.0, max(cfg.num_train_steps - cfg.warmup_steps, 1)
                ),
            ],
            [cfg.warmup_steps],
        )
    if cfg.lr_schedule == "noam":
        # lr * warmup^.5 * min(step^-.5, step * warmup^-1.5) (optim/sched.py:10-13)
        import jax.numpy as jnp

        def sched(step):
            s = jnp.maximum(step, 1).astype(jnp.float32)
            return cfg.learning_rate * (cfg.warmup_steps ** 0.5) * jnp.minimum(
                s ** -0.5, s * cfg.warmup_steps ** -1.5
            )

        return sched
    raise ValueError(cfg.lr_schedule)


def _decay_mask(params):
    """True where weight decay applies: everything except biases, layer-norm
    scales and the sprel 1x1 (reference no_decay list, optim/misc.py:21-23)."""
    import jax

    def keep(path, _):
        names = [p.key for p in path if hasattr(p, "key")]
        leaf = names[-1] if names else ""
        if leaf in ("bias",):
            return False
        if any("ln" == n or n.endswith("_ln") or n == "LayerNorm" for n in names):
            return False
        return True

    return jax.tree_util.tree_map_with_path(keep, params)


class ScaleByAdamLPState(NamedTuple):
    count: "jax.Array"  # noqa: F821 — annotation only
    key: "jax.Array"    # RAW rbg key data (uint32) for stochastic-rounding
    #                     bits — raw so the opt state stays a plain-dtype
    #                     pytree (orbax checkpoints and NamedSharding
    #                     replication both choke on extended key dtypes)
    mu: optax.Updates
    nu: optax.Updates


def _stochastic_round(x, bits, dtype):
    """Round f32 ``x`` to bf16 stochastically using uint32 ``bits``.

    Adds uniform random bits below the bf16 mantissa cut and truncates —
    carry propagation into the exponent is exactly round-up, so the result
    is unbiased: E[sr(x)] == x. Non-finite values pass through untouched.
    """
    import jax
    import jax.numpy as jnp

    assert dtype == jnp.bfloat16, "stochastic rounding implemented for bf16"
    xi = jax.lax.bitcast_convert_type(x, jnp.uint32)
    xi = (xi + (bits & jnp.uint32(0xFFFF))) & jnp.uint32(0xFFFF0000)
    rounded = jax.lax.bitcast_convert_type(xi, jnp.float32)
    return jnp.where(jnp.isfinite(x), rounded, x).astype(dtype)


def scale_by_adam_lp(
    b1: float, b2: float, eps: float,
    mu_dtype=None, nu_dtype=None, stochastic_round: bool = True,
) -> optax.GradientTransformation:
    """Adam moment tracking with independently low-precision moment STORAGE.

    The AdamW update at the flagship scale (239M params, batch 16/chip) is
    HBM-bandwidth-bound: each step streams grads + params + both moments in
    and params + both moments out. optax.adamw only narrows mu; this
    transform narrows nu as well (update math stays f32 — moments are
    upcast, updated, then rounded on store). With the reference betas
    (b2=0.98) the per-step nu increment is ~2% of its magnitude, a factor
    ~5 above bf16 resolution (2^-8), so round-to-nearest already tracks;
    ``stochastic_round`` removes the residual small-update bias outright
    using near-free RngBitGenerator bits (see utils/rng.py). Parity with
    optax.scale_by_adam at (mu|nu)_dtype=float32 is pinned in
    tests/test_train_step.py.
    """
    import jax
    import jax.numpy as jnp

    def _cast(x, dtype, key, idx):
        if dtype is None or x.dtype == dtype:
            return x
        if stochastic_round and dtype == jnp.bfloat16:
            bits = jax.random.bits(
                jax.random.fold_in(key, idx), x.shape, jnp.uint32
            )
            return _stochastic_round(x, bits, dtype)
        return x.astype(dtype)

    def _cast_tree(tree, dtype, key):
        leaves, treedef = jax.tree_util.tree_flatten(tree)
        out = [_cast(x, dtype, key, i) for i, x in enumerate(leaves)]
        return jax.tree_util.tree_unflatten(treedef, out)

    def init_fn(params):
        from ..utils.rng import train_key

        mu = jax.tree_util.tree_map(
            lambda p: jnp.zeros_like(p, dtype=mu_dtype or p.dtype), params
        )
        nu = jax.tree_util.tree_map(
            lambda p: jnp.zeros_like(p, dtype=nu_dtype or p.dtype), params
        )
        return ScaleByAdamLPState(
            count=jnp.zeros([], jnp.int32),
            key=jax.random.key_data(train_key(0x5EED)),
            mu=mu, nu=nu,
        )

    def update_fn(updates, state, params=None):
        del params
        count = optax.safe_int32_increment(state.count)
        # moment math ALWAYS in f32: grads may arrive bf16 (grad_dtype) and
        # moments may be stored bf16; the upcasts fuse into the update loop,
        # costing registers, not HBM traffic
        mu_f = jax.tree_util.tree_map(
            lambda g, m: b1 * m.astype(jnp.float32)
            + (1.0 - b1) * g.astype(jnp.float32),
            updates, state.mu,
        )
        nu_f = jax.tree_util.tree_map(
            lambda g, v: b2 * v.astype(jnp.float32)
            + (1.0 - b2) * jnp.square(g.astype(jnp.float32)),
            updates, state.nu,
        )
        bc1 = 1.0 - b1 ** count.astype(jnp.float32)
        bc2 = 1.0 - b2 ** count.astype(jnp.float32)
        new_updates = jax.tree_util.tree_map(
            lambda m, v: (m / bc1) / (jnp.sqrt(v / bc2) + eps), mu_f, nu_f
        )
        key = jax.random.fold_in(
            jax.random.wrap_key_data(state.key, impl="rbg"), count
        )
        # decorrelate mu/nu rounding noise with disjoint leaf indices
        n = len(jax.tree_util.tree_leaves(updates))
        mu = _cast_tree(mu_f, mu_dtype, key)
        nu = _cast_tree(nu_f, nu_dtype, jax.random.fold_in(key, n))
        return new_updates, ScaleByAdamLPState(
            count=count, key=state.key, mu=mu, nu=nu
        )

    return optax.GradientTransformation(init_fn, update_fn)


class FusedAdamWState(NamedTuple):
    count: "jax.Array"  # noqa: F821 — annotation only
    mu: optax.Updates
    nu: optax.Updates


class FusedGradientTransformation(NamedTuple):
    """An optax-shaped transformation whose ``update`` additionally accepts a
    precomputed clip ``scale`` scalar (see ``fused_adamw_clip``). Callers that
    hold the global-norm clip in the step body (TrainState.apply_gradients)
    detect this type and pass the scale instead of materialising a scaled
    gradient tree."""

    init: Any
    update: Any


def fused_adamw_clip(
    sched, b1: float, b2: float, eps: float, weight_decay: float,
    mask=None, mu_dtype=None,
) -> FusedGradientTransformation:
    """AdamW with the global-norm clip, moment update, bias correction,
    decoupled weight decay and learning rate all folded into ONE tree pass.

    Mathematically identical to ``optax.chain(clip_by_global_norm, adamw)``
    (pinned in tests/test_optim.py): optax's chain authors the update as four
    sequential tree transforms (scale grads -> scale_by_adam -> add decayed
    weights -> scale by lr), each a separate family of elementwise kernels
    XLA must re-fuse across materialised intermediate trees. The profiled
    optimizer/elementwise tail at flagship scale is ~19% of the step
    (benchmarks/TRACE_SUMMARY.md); this variant hands XLA one leaf function
    computing (update, mu', nu') per parameter so the whole per-leaf update
    is a single fusion region over one read of (g, p, mu, nu).

    The clip arrives as ``scale`` — a scalar the caller derives from the one
    global-norm reduce that also serves the grad_norm metric (the reference
    logs clip_grad_norm_'s return the same way, train_r2r.py:296-303).
    Moment math runs f32; ``mu`` stores in ``mu_dtype`` exactly like
    optax.adamw (round-to-nearest on store), ``nu`` stays f32.
    """
    import jax
    import jax.numpy as jnp

    def init_fn(params):
        return FusedAdamWState(
            count=jnp.zeros([], jnp.int32),
            mu=jax.tree_util.tree_map(
                lambda p: jnp.zeros_like(p, dtype=mu_dtype or p.dtype), params
            ),
            nu=jax.tree_util.tree_map(lambda p: jnp.zeros_like(p), params),
        )

    def update_fn(updates, state, params=None, scale=None):
        if params is None:
            raise ValueError("fused_adamw_clip requires params")
        count = optax.safe_int32_increment(state.count)
        # optax.scale_by_learning_rate evaluates the schedule at the
        # pre-increment count: first update uses sched(0)
        lr = sched(count - 1) if callable(sched) else sched
        cf = count.astype(jnp.float32)
        bc1 = 1.0 - b1 ** cf
        bc2 = 1.0 - b2 ** cf

        def leaf(g, p, m, v, decayed):
            g32 = g.astype(jnp.float32)
            if scale is not None:
                g32 = g32 * scale
            # exactly optax.tree.update_moment's promotion: ``b1 * m`` runs in
            # the mu STORAGE dtype (one bf16 rounding when mu_dtype=bfloat16)
            # before the f32 add — parity with optax.adamw is bit-for-bit
            m32 = (1.0 - b1) * g32 + b1 * m
            v32 = b2 * v.astype(jnp.float32) + (1.0 - b2) * jnp.square(g32)
            u = (m32 / bc1) / (jnp.sqrt(v32 / bc2) + eps)
            if decayed and weight_decay:
                u = u + weight_decay * p.astype(jnp.float32)
            return (
                (-lr * u).astype(p.dtype),
                m32.astype(m.dtype),
                v32.astype(v.dtype),
            )

        gl, treedef = jax.tree_util.tree_flatten(updates)
        pl = jax.tree_util.tree_leaves(params)
        ml = jax.tree_util.tree_leaves(state.mu)
        vl = jax.tree_util.tree_leaves(state.nu)
        dl = (
            jax.tree_util.tree_leaves(mask)
            if mask is not None
            else [True] * len(gl)
        )
        out = [leaf(*args) for args in zip(gl, pl, ml, vl, dl)]
        unflat = jax.tree_util.tree_unflatten
        new_updates = unflat(treedef, [o[0] for o in out])
        mu = unflat(treedef, [o[1] for o in out])
        nu = unflat(treedef, [o[2] for o in out])
        return new_updates, FusedAdamWState(count=count, mu=mu, nu=nu)

    return FusedGradientTransformation(init_fn, update_fn)


class LookaheadState(NamedTuple):
    count: "jax.Array"  # noqa: F821 — annotation only
    slow: optax.Params


def lookahead(k: int = 6, alpha: float = 0.5) -> optax.GradientTransformation:
    """Lookahead slow-weights wrapper as a plain gradient transformation.

    Parity target: the reference's vendored Lookahead
    (/root/reference/pretrain_src/optim/lookahead.py:12-54, defaults
    alpha=0.5, k=6): every k fast steps the fast weights are pulled back to
    ``slow + alpha * (fast - slow)`` and the slow buffer takes that value.
    Where the reference's param-mutating wrapper lazily seeds the slow
    buffer at the first sync, this transform seeds it at init (the paper's
    formulation, arXiv:1907.08610) so the whole thing stays a pure
    (updates, state, params) -> (updates, state) function: no param-tree
    restructuring (unlike optax.lookahead's fast/slow param pair), so
    TrainState, orbax checkpoints and the DP mesh shardings are untouched.
    """
    import jax
    import jax.numpy as jnp

    def init_fn(params):
        # Materialise a COPY of each leaf: jnp.asarray would alias the live
        # param buffers, and a train step that donates its state would then
        # donate the same buffer twice (params leaf + slow leaf) — a runtime
        # InvalidArgument on TPU.
        return LookaheadState(
            count=jnp.zeros([], jnp.int32),
            slow=jax.tree_util.tree_map(
                lambda p: jnp.array(p, copy=True), params
            ),
        )

    def update_fn(updates, state, params=None):
        if params is None:
            raise ValueError("lookahead requires params")
        count = optax.safe_int32_increment(state.count)
        sync = (count % k == 0)
        # candidate fast weights after this inner update; on sync steps the
        # emitted update lands the params exactly on the new slow weights
        slow_new = jax.tree_util.tree_map(
            lambda u, p, s: s + alpha * ((p + u) - s),
            updates, params, state.slow,
        )
        new_updates = jax.tree_util.tree_map(
            lambda sn, p, u: jnp.where(sync, sn - p, u),
            slow_new, params, updates,
        )
        slow = jax.tree_util.tree_map(
            lambda sn, s: jnp.where(sync, sn, s), slow_new, state.slow
        )
        return new_updates, LookaheadState(count=count, slow=slow)

    return optax.GradientTransformation(init_fn, update_fn)


class RalambState(NamedTuple):
    count: "jax.Array"  # noqa: F821 — annotation only
    mu: optax.Updates
    nu: optax.Updates


def ralamb(sched, b1: float, b2: float, eps: float, weight_decay: float,
           mask=None) -> optax.GradientTransformation:
    """RAdam + per-leaf LARS trust ratio ("Ralamb"), as a full optimizer
    (learning rate folded in, like the reference's param-mutating class).

    Parity target: /root/reference/pretrain_src/optim/ralamb.py:15-103 —
    RAdam variance rectification (N_sma >= 5 gates the sqrt(nu) denominator,
    :58-68), decoupled-but-lr-scaled weight decay applied to the params
    before the step (:71-72), and a trust ratio
    ``clamp(||p||, 0, 10) / ||p_decayed + radam_step||`` (1 where either
    norm is zero) that scales the RAdam term but NOT the decay term
    (:74-99, quirks kept — the denominator is the CANDIDATE param norm,
    not the update norm as in standard LAMB). All math f32, one pass.
    """
    import jax
    import jax.numpy as jnp

    def init_fn(params):
        zeros = lambda p: jnp.zeros_like(p, dtype=jnp.float32)  # noqa: E731
        return RalambState(
            count=jnp.zeros([], jnp.int32),
            mu=jax.tree_util.tree_map(zeros, params),
            nu=jax.tree_util.tree_map(zeros, params),
        )

    def update_fn(updates, state, params=None):
        if params is None:
            raise ValueError("ralamb requires params")
        count = optax.safe_int32_increment(state.count)
        step = count.astype(jnp.float32)
        lr = sched(count - 1) if callable(sched) else sched
        mu = jax.tree_util.tree_map(
            lambda g, m: b1 * m + (1.0 - b1) * g.astype(jnp.float32),
            updates, state.mu,
        )
        nu = jax.tree_util.tree_map(
            lambda g, v: b2 * v + (1.0 - b2) * jnp.square(g.astype(jnp.float32)),
            updates, state.nu,
        )
        beta2_t = b2 ** step
        n_sma_max = 2.0 / (1.0 - b2) - 1.0
        n_sma = n_sma_max - 2.0 * step * beta2_t / (1.0 - beta2_t)
        rect = jnp.sqrt(
            (1.0 - beta2_t) * (n_sma - 4.0) / (n_sma_max - 4.0)
            * (n_sma - 2.0) / n_sma * n_sma_max / (n_sma_max - 2.0)
        )
        bias1 = 1.0 - b1 ** step
        use_rect = n_sma >= 5.0
        step_size = jnp.where(use_rect, rect, 1.0) / bias1
        decay_mask = mask if mask is not None else jax.tree_util.tree_map(
            lambda _: True, updates
        )

        def leaf(g, p, m, v, decayed):
            del g
            pf = p.astype(jnp.float32)
            wd = weight_decay if decayed else 0.0
            p1 = pf - wd * lr * pf
            direction = jnp.where(use_rect, m / (jnp.sqrt(v) + eps), m)
            cand = p1 - step_size * lr * direction
            wn = jnp.clip(jnp.sqrt(jnp.sum(pf * pf)), 0.0, 10.0)
            rn = jnp.sqrt(jnp.sum(cand * cand))
            tr = jnp.where((wn == 0) | (rn == 0), 1.0, wn / rn)
            return ((p1 - pf) - step_size * lr * tr * direction).astype(p.dtype)

        new_updates = jax.tree_util.tree_map(
            leaf, updates, params, mu, nu, decay_mask
        )
        return new_updates, RalambState(count=count, mu=mu, nu=nu)

    return optax.GradientTransformation(init_fn, update_fn)


def make_optimizer(cfg: OptimConfig, params_for_mask=None,
                   include_clip: bool = True) -> optax.GradientTransformation:
    """``include_clip=False`` omits the global-norm clip from the chain for
    callers that clip in the step body (one norm pass serves both the clip
    and the grad_norm metric — see TrainState.apply_gradients)."""
    sched = lr_schedule(cfg)
    mask = None
    if params_for_mask is not None:
        mask = _decay_mask(params_for_mask)
    base_name, _, wrapper = cfg.optim.partition("+")
    if base_name == "adamw":
        import jax.numpy as jnp

        mu_dtype = jnp.dtype(getattr(cfg, "mu_dtype", "float32"))
        nu_dtype = jnp.dtype(getattr(cfg, "nu_dtype", "float32"))
        bf16_grads = jnp.dtype(getattr(cfg, "grad_dtype", "float32")) != jnp.float32
        state_sr = getattr(cfg, "state_sr", False)
        # optax.adamw covers: f32 nu, f32 grads, and round-to-nearest mu
        # stores. Anything else (low-precision nu, bf16 grads, or SR
        # requested on a low-precision moment) routes through
        # scale_by_adam_lp so state_sr means the same thing on every path.
        lp_needed = (
            nu_dtype != jnp.float32
            or bf16_grads
            or (state_sr and mu_dtype != jnp.float32)
        )
        if getattr(cfg, "fused_update", False):
            # single-tree-pass AdamW with clip folded in (fused_adamw_clip).
            # Only the TrainState path (include_clip=False: the step body owns
            # the norm pass and passes the clip scale) can drive it, and the
            # fusion premise breaks under dtype knobs, wrappers or MultiSteps
            # — reject loudly rather than silently measuring the wrong thing.
            if include_clip or lp_needed or wrapper \
                    or cfg.gradient_accumulation_steps > 1:
                raise ValueError(
                    "fused_update requires the in-step-clip adamw path "
                    "(include_clip=False, f32 nu/grads, no SR, no wrapper, "
                    "no gradient accumulation)"
                )
            return fused_adamw_clip(
                sched, b1=cfg.betas[0], b2=cfg.betas[1], eps=1e-8,
                weight_decay=cfg.weight_decay, mask=mask, mu_dtype=mu_dtype,
            )
        if not lp_needed:
            inner = optax.adamw(
                learning_rate=sched, b1=cfg.betas[0], b2=cfg.betas[1],
                eps=1e-8, weight_decay=cfg.weight_decay, mask=mask,
                mu_dtype=mu_dtype,
            )
        else:
            # low-precision nu: optax.adamw cannot narrow the second moment;
            # assemble the same chain around scale_by_adam_lp
            inner = optax.chain(
                scale_by_adam_lp(
                    b1=cfg.betas[0], b2=cfg.betas[1], eps=1e-8,
                    mu_dtype=mu_dtype, nu_dtype=nu_dtype,
                    stochastic_round=state_sr,
                ),
                optax.add_decayed_weights(cfg.weight_decay, mask=mask),
                optax.scale_by_learning_rate(sched),
            )
    elif base_name == "radam":
        # vendored RAdam in the reference (optim/radam.py); decoupled decay
        inner = optax.chain(
            optax.add_decayed_weights(cfg.weight_decay, mask=mask),
            optax.radam(learning_rate=sched, b1=cfg.betas[0], b2=cfg.betas[1]),
        )
    elif base_name == "lamb":
        inner = optax.lamb(
            learning_rate=sched, b1=cfg.betas[0], b2=cfg.betas[1],
            weight_decay=cfg.weight_decay, mask=mask,
        )
    elif base_name == "ralamb":
        inner = ralamb(
            sched, b1=cfg.betas[0], b2=cfg.betas[1], eps=1e-8,
            weight_decay=cfg.weight_decay, mask=mask,
        )
    elif base_name == "rangerlars":
        # RangerLars = Lookahead(Ralamb) at the reference's fixed alpha/k
        # (optim/rangerlars.py:12-14; selectable via build_optimizer,
        # optim/misc.py:31)
        inner = optax.chain(
            ralamb(sched, b1=cfg.betas[0], b2=cfg.betas[1], eps=1e-8,
                   weight_decay=cfg.weight_decay, mask=mask),
            lookahead(k=6, alpha=0.5),
        )
    elif base_name == "adam":
        # torch Adam with grouped weight_decay = L2 into the gradient
        # (optim/misc.py:15-26): decay joins the moment path
        inner = optax.chain(
            optax.add_decayed_weights(cfg.weight_decay, mask=mask),
            optax.adam(learning_rate=sched, b1=cfg.betas[0], b2=cfg.betas[1]),
        )
    elif base_name == "adamax":
        inner = optax.chain(
            optax.add_decayed_weights(cfg.weight_decay, mask=mask),
            optax.adamax(learning_rate=sched, b1=cfg.betas[0], b2=cfg.betas[1]),
        )
    else:
        raise ValueError(f"unknown optimizer: {cfg.optim}")
    tx = optax.chain(optax.clip_by_global_norm(cfg.grad_norm), inner) \
        if include_clip else inner
    if wrapper == "ema":  # slow-weights variant in the spirit of Lookahead
        tx = optax.chain(tx, optax.ema(decay=0.5, debias=False))
    elif wrapper == "lookahead":
        tx = optax.chain(tx, lookahead(k=6, alpha=0.5))
    elif wrapper:
        raise ValueError(f"unknown optimizer wrapper: {wrapper}")
    if cfg.gradient_accumulation_steps > 1:
        tx = optax.MultiSteps(tx, cfg.gradient_accumulation_steps)
    return tx
