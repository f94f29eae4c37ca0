"""Optimiser / LR-schedule factory (optax).

Parity with the reference's vendored optimisers and schedules
(/root/reference/pretrain_src/optim/): AdamW with bias/LayerNorm excluded
from weight decay (build_optimizer, optim/misc.py:12-37), linear
warmup-then-decay (get_lr_sched, optim/sched.py:10-29), noam alternative,
global-norm clipping applied before the update (train_r2r.py:296-303).
RAdam / Lookahead variants map onto optax.radam / optax.lookahead.
"""

from __future__ import annotations

from typing import Optional

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

        inner = optax.adamw(
            learning_rate=sched, b1=cfg.betas[0], b2=cfg.betas[1],
            eps=1e-8, weight_decay=cfg.weight_decay, mask=mask,
            mu_dtype=getattr(jnp, getattr(cfg, "mu_dtype", "float32")),
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
    else:
        raise ValueError(f"unknown optimizer: {cfg.optim}")
    tx = optax.chain(optax.clip_by_global_norm(cfg.grad_norm), inner) \
        if include_clip else inner
    if wrapper == "ema":  # slow-weights variant in the spirit of Lookahead
        tx = optax.chain(tx, optax.ema(decay=0.5, debias=False))
    elif wrapper:
        raise ValueError(f"unknown optimizer wrapper: {wrapper}")
    if cfg.gradient_accumulation_steps > 1:
        tx = optax.MultiSteps(tx, cfg.gradient_accumulation_steps)
    return tx
