"""The pjit-compiled pretraining step.

One XLA program per proxy task (task is a static argument): device-side BEV
lift-splat -> model forward -> loss -> grad -> clipped AdamW update. Under a
``dp`` mesh the batch is sharded on its leading axis and XLA inserts the
gradient all-reduce over ICI — the TPU-native equivalent of the reference's
DDP wrapper + GradScaler loop (/root/reference/pretrain_src/train_r2r.py:247-313).
"""

from __future__ import annotations

import functools
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..configs import ModelConfig, OptimConfig, PretrainConfig
from ..models import GlocalTextPathCMTPreTraining
from ..ops.bev import BevProjector
from .optim import make_optimizer

Batch = Dict[str, Any]


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    opt_state: Any
    tx: optax.GradientTransformation = struct.field(pytree_node=False)
    clip_norm: Optional[float] = struct.field(pytree_node=False, default=None)
    # differentiate wrt a params tree cast to this dtype (None = params as
    # stored): "bfloat16" halves the grad write + norm read + optimizer read
    # traffic of the bandwidth-bound update, and would halve the DP psum
    # bytes over ICI; update math stays f32 (optim.py:scale_by_adam_lp)
    grad_dtype: Optional[str] = struct.field(pytree_node=False, default=None)

    def cast_for_grad(self, params=None):
        """Params tree to differentiate against (see ``grad_dtype``)."""
        params = self.params if params is None else params
        if self.grad_dtype is None:
            return params
        dt = jnp.dtype(self.grad_dtype)
        return jax.tree_util.tree_map(
            lambda p: p.astype(dt) if p.dtype == jnp.float32 else p, params
        )

    def apply_gradients(self, grads):
        """Optimiser update; with ``clip_norm`` set, clips by global norm in
        the step body so ONE norm pass over the grads serves both the clip
        and the grad_norm metric (returned second) — the reference computes
        clip_grad_norm_'s return for logging the same way
        (train_r2r.py:296-303). The norm accumulates in f32 regardless of
        grad dtype (a bf16 sum over 239M squares would lose the tail)."""
        gnorm = jnp.sqrt(
            sum(
                jnp.sum(jnp.square(g.astype(jnp.float32)))
                for g in jax.tree_util.tree_leaves(grads)
            )
        )
        from .optim import FusedGradientTransformation

        if isinstance(self.tx, FusedGradientTransformation):
            # single-tree-pass AdamW (optim.py:fused_adamw_clip): the clip
            # scale rides into the fused update; no scaled-grads tree is
            # materialised
            scale = None
            if self.clip_norm is not None:
                scale = self.clip_norm / jnp.maximum(gnorm, self.clip_norm)
            updates, new_opt_state = self.tx.update(
                grads, self.opt_state, self.params, scale=scale
            )
            return self.replace(
                step=self.step + 1,
                params=optax.apply_updates(self.params, updates),
                opt_state=new_opt_state,
            ), gnorm
        if self.clip_norm is not None:
            # optax.clip_by_global_norm semantics: g * clip / max(norm, clip)
            scale = self.clip_norm / jnp.maximum(gnorm, self.clip_norm)
            grads = jax.tree_util.tree_map(
                lambda g: g * scale.astype(g.dtype), grads
            )
        updates, new_opt_state = self.tx.update(grads, self.opt_state, self.params)
        return self.replace(
            step=self.step + 1,
            params=optax.apply_updates(self.params, updates),
            opt_state=new_opt_state,
        ), gnorm


def build_projector(cfg: ModelConfig, shapes=None) -> BevProjector:
    import math

    return BevProjector(
        vfov=math.radians(90.0),
        grid_hw=shapes.grid_hw if shapes else 14,
        num_views=shapes.num_views if shapes else 12,
        map_dim=cfg.bev_dim,
        map_res=cfg.bev_res,
        z_clip=0.5,
        num_sem=cfg.num_sem_classes,
    )


def prepare_bev(projector: BevProjector, batch: Batch) -> Batch:
    """Run the device-side lift-splat if the batch carries raw grids
    (ref GlocalTextPathCMTPreTraining.lift_splat, pretrain_cmt.py:114-167)."""
    if "depths" not in batch:
        return batch
    out = dict(batch)
    depths = out.pop("depths")
    bev, occupancy, sem, sem_mask = projector.lift_splat(
        depths,
        out.pop("T_c2w"),
        out.pop("T_w2c"),
        out.pop("S_w2c"),
        out.pop("grid_fts"),
        out.pop("sem_labels"),
    )
    out["bev_fts"] = bev
    out["bev_sems"] = sem
    out["bev_sem_masks"] = sem_mask
    # pretrain attends over the full grid (bev_masks = ones,
    # ref pretrain_cmt.py:152); occupancy is available for visualisation
    return out


def make_loss_fn(model: GlocalTextPathCMTPreTraining, projector: BevProjector):
    def loss_fn(params, batch: Batch, task: str, rng) -> Tuple[jnp.ndarray, Dict]:
        batch = dict(batch)
        if task == "mlm" and "mlm_ids" in batch:
            batch["txt_ids"] = batch["mlm_ids"]
        batch = prepare_bev(projector, batch)
        loss, metrics = model.apply(
            {"params": params}, batch, task,
            deterministic=False, rngs={"dropout": rng},
        )
        return loss, metrics

    return loss_fn


def make_pretrain_step(
    model: GlocalTextPathCMTPreTraining,
    projector: BevProjector,
    mesh: Optional[Mesh] = None,
) -> Callable:
    """Returns step(state, batch, rng, task) -> (state, metrics); ``task`` is
    static so each proxy task compiles once."""
    loss_fn = make_loss_fn(model, projector)

    def step(state: TrainState, batch: Batch, rng, task: str):
        rng = jax.random.fold_in(rng, state.step)
        (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.cast_for_grad(), batch, task, rng
        )
        new_state, gnorm = state.apply_gradients(grads)
        metrics = dict(metrics)
        metrics["loss"] = loss
        metrics["grad_norm"] = gnorm
        return new_state, metrics

    if mesh is None:
        return jax.jit(step, static_argnames=("task",), donate_argnums=(0,))

    repl = NamedSharding(mesh, P())
    data = NamedSharding(mesh, P("dp"))
    return jax.jit(
        step,
        static_argnames=("task",),
        donate_argnums=(0,),
        in_shardings=(repl, data, repl),
        out_shardings=(repl, repl),
    )


def make_pretrain_block_step(
    model: GlocalTextPathCMTPreTraining,
    projector: BevProjector,
    mesh: Optional[Mesh] = None,
    unroll: int = 1,
) -> Callable:
    """K optimizer steps per dispatch: ``lax.scan`` over the step body.

    Returns block(state, batch, rng, task, length, stacked) ->
    (state, last_metrics) with ``task``/``length``/``stacked`` static. With
    ``stacked=False`` the batch has the normal per-step shape and is re-fed
    every scan iteration (the bench pattern); with ``stacked=True`` it
    carries a leading K==length axis of distinct micro-batches consumed one
    per step (under a mesh the batch axis 1 is sharded over dp, axis 0 — the
    step axis — stays unsharded). This mirrors the MetaLoader's task-block
    scheduling (data/loader.py) and amortises per-step host dispatch — the
    production pattern for driving a TPU over a slow control link, where
    per-step Python dispatch would bound throughput below what the chip
    sustains."""
    loss_fn = make_loss_fn(model, projector)

    def block(state: TrainState, batch: Batch, rng, task: str, length: int,
              stacked: bool = False):
        length = int(length)

        def body(state, xs):
            b = xs if stacked else batch
            r = jax.random.fold_in(rng, state.step)
            (loss, metrics), grads = jax.value_and_grad(
                loss_fn, has_aux=True
            )(state.cast_for_grad(), b, task, r)
            new_state, gnorm = state.apply_gradients(grads)
            metrics = dict(metrics)
            metrics["loss"] = loss
            metrics["grad_norm"] = gnorm
            return new_state, metrics

        xs = batch if stacked else None
        # unroll>1 divides the while-loop's per-iteration carry copies (XLA
        # copies the full param+opt state between iterations — measured
        # ~7 ms/step at flagship scale, 15% of the step) at the price of a
        # proportionally larger body to compile
        state, ms = jax.lax.scan(body, state, xs, length=length,
                                 unroll=min(unroll, length))
        return state, jax.tree_util.tree_map(lambda x: x[-1], ms)

    if mesh is None:
        return jax.jit(
            block, static_argnames=("task", "length", "stacked"),
            donate_argnums=(0,),
        )
    repl = NamedSharding(mesh, P())
    data = NamedSharding(mesh, P("dp"))          # per-step batch: axis 0 = dp
    data_stacked = NamedSharding(mesh, P(None, "dp"))  # (K, B, ...): axis 1
    # pjit with in_shardings rejects kwargs -> static args go positionally
    flat = jax.jit(
        block,
        static_argnums=(3, 4, 5),
        donate_argnums=(0,),
        in_shardings=(repl, data, repl),
        out_shardings=(repl, repl),
    )
    stacked_jit = jax.jit(
        block,
        static_argnums=(3, 4, 5),
        donate_argnums=(0,),
        in_shardings=(repl, data_stacked, repl),
        out_shardings=(repl, repl),
    )

    def dispatch(state, batch, rng, task: str, length: int,
                 stacked: bool = False):
        fn = stacked_jit if stacked else flat
        return fn(state, batch, rng, task, length, stacked)

    return dispatch


def _ensure_task_keys(batch: Batch, cfg: PretrainConfig) -> Batch:
    """Fill zero placeholders for task-specific label keys missing from the
    init batch — init_all touches every task head, but a single task's batch
    only carries its own labels."""
    import numpy as np

    b = dict(batch)
    bs = b["txt_ids"].shape[0]
    sh, m = cfg.shapes, cfg.model
    defaults = {
        "mlm_ids": b["txt_ids"],
        "mlm_pos": np.zeros((bs, sh.max_masked_tokens), np.int32),
        "mlm_tgt": np.zeros((bs, sh.max_masked_tokens), np.int32),
        "mlm_valid": np.zeros((bs, sh.max_masked_tokens), bool),
        "global_act_labels": np.zeros(bs, np.int64),
        "local_act_labels": np.zeros(bs, np.int64),
        "bev_mrc_masks": np.zeros((bs, m.num_bev_tokens), bool),
    }
    if "traj_obj_fts" in b:
        defaults.update(
            obj_labels=np.zeros(bs, np.int64),
            obj_probs=np.zeros((bs, sh.max_objects, m.obj_prob_size), np.float32),
            obj_mrc_masks=np.zeros((bs, sh.max_objects), bool),
        )
    if "depths" not in b:
        defaults.update(
            bev_sems=np.zeros((bs, m.num_bev_tokens, m.num_sem_classes), np.float32),
            bev_sem_masks=np.zeros((bs, m.num_bev_tokens), bool),
        )
    for k, v in defaults.items():
        b.setdefault(k, v)
    return b


def init_pretrain_state(
    cfg: PretrainConfig,
    batch: Batch,
    seed: int = 0,
) -> Tuple[GlocalTextPathCMTPreTraining, BevProjector, TrainState]:
    """Build model + projector and initialise params/optimiser."""
    model = GlocalTextPathCMTPreTraining(
        cfg.model, tasks=tuple(cfg.tasks), sem_pred_token=cfg.sem_pred_token
    )
    projector = build_projector(cfg.model, cfg.shapes)
    # Initialise on a batch-size-1 slice (shapes don't affect param shapes)
    # under jit: eager flax init would issue thousands of tiny device ops.
    small = {k: v[:1] for k, v in batch.items()}
    small = _ensure_task_keys(small, cfg)
    init_batch = prepare_bev(projector, small)
    init_fn = jax.jit(lambda rng, b: model.init(rng, b, method=model.init_all))
    variables = init_fn(jax.random.key(seed), init_batch)
    params = variables["params"]
    tx = make_optimizer(cfg.optim, params_for_mask=params, include_clip=False)
    gdt = getattr(cfg.optim, "grad_dtype", "float32")
    state = TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        opt_state=tx.init(params),
        tx=tx,
        clip_norm=float(cfg.optim.grad_norm),
        grad_dtype=None if gdt == "float32" else gdt,
    )
    return model, projector, state
