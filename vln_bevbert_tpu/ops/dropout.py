"""Fused TPU dropout: in-kernel PRNG, seed-only residuals.

XLA lowers ``nn.Dropout`` to RngBitGenerator -> convert -> compare -> select.
The bits tensor (4 bytes/element) round-trips HBM between the RBG op and the
select, and the keep-mask is saved for the backward pass — together ~60% of
dropout's cost. At the flagship pretrain scale dropout touches ~3e8 elements
per step across ~40 sites (attention probs on the 441-token BEV branch
dominate) and costs 7.96 ms of a 47.3 ms step (measured, v5e,
benchmarks/ablate_step.py full vs no_dropout).

This kernel regenerates mask bits *inside* VMEM with the TPU's native PRNG
(pltpu.prng_random_bits), so the only HBM traffic is read-x/write-y — and
the backward pass re-seeds the same PRNG instead of loading a saved mask, so
the residual is one uint32 seed per example.

MEASURED OUTCOME (v5e, flagship pretrain, unroll=5 blocks, 2026-08-18): the
kernel is a 6.4% END-TO-END REGRESSION — 424.4 samples/s (MFU 0.299) fused
vs 453.6 samples/s (MFU 0.319) with the plain XLA path. The premise double
counts XLA: RBG/convert/compare/select fuse into the epilogues of adjacent
ops, so the bits tensor never round-trips HBM in the first place — while
``pallas_call`` is a fusion BARRIER that forces every dropout site's x and y
to materialize in HBM. The kernel therefore defaults OFF
(VLN_BEVBERT_FUSED_DROPOUT=1 opts in; the kernel + its tests remain as the
measurement record and for shapes where a fusion barrier is already present).

Semantics: keep element iff bits >= round(rate * 2^32)  (P(keep) = 1 - rate,
exact to 2^-32); kept elements scale by 1/(1-rate) — identical in
distribution to nn.Dropout, different mask stream (the reference's torch
dropout stream is different again; mask streams are not part of parity).

Sharding: the kernel is row-independent with per-example seeds, exposed
through jax.experimental.custom_partitioning so a batch-sharded input under
a dp mesh runs shard-local (GSPMD would otherwise all-gather the operand of
an opaque custom call).

Non-TPU backends (CPU tests, virtual-device dry runs) fall back to the plain
jax.random path with identical *distributional* semantics.

Reference dropout sites: attention probs vilmodel.py:135, hidden/FFN
vilmodel.py:164-193, embeddings vilmodel.py:58-76 (all
/root/reference/pretrain_src/model/).
"""

from __future__ import annotations

import functools
import os
from typing import Sequence

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# per-block VMEM budget for (x, y, bits) — conservative vs the ~16MB/core
_BLOCK_BUDGET_BYTES = 6 * 1024 * 1024


def _use_kernel(site: str) -> bool:
    """Route ``site`` through the Pallas kernel?

    All-sites routing measured a 6.4% end-to-end REGRESSION (module
    docstring) and stays opt-in via VLN_BEVBERT_FUSED_DROPOUT=1. The
    ``attn_probs`` site is different: its (B, H, 441, 441) masks are where
    the XLA path's costs concentrate — the timeline
    (benchmarks/TRACE_SUMMARY.md) shows the RBG bits tensors relayout-copied
    (data formatting, ~11% of step) because the saved-mask residual wants the
    backward matmul's transposed layout. The seed-only-residual kernel
    deletes both the copy and the residual; VLN_BEVBERT_FUSED_ATTN_DROPOUT=1
    opts in.

    MEASURED (v5e, flagship pretrain, 2026-08-19): attn-probs-only routing
    is ALSO a regression — 429.7 samples/s (MFU 0.302) vs 453.4 baseline
    (−5.2%). The pallas_call fusion barrier between softmax and the PV
    matmul costs more than the relayout copies it deletes. Default stays
    off; both knobs remain as the measurement record."""
    if os.environ.get("VLN_BEVBERT_FUSED_DROPOUT", "0") == "1":
        return jax.default_backend() == "tpu"
    if (site == "attn_probs"
            and os.environ.get("VLN_BEVBERT_FUSED_ATTN_DROPOUT", "0") == "1"):
        return jax.default_backend() == "tpu"
    return False


def _grid_split(shape: Sequence[int], itemsize: int):
    """Split ``shape`` into (grid_dims, block_shape): fold leading axes into
    the grid until one block's x + y + uint32-bits footprint fits VMEM."""
    ndim = len(shape)
    grid = 1  # always grid over the leading (batch) axis for per-row seeds
    while grid < ndim - 1:
        rest = 1
        for s in shape[grid:]:
            rest *= s
        if rest * (2 * itemsize + 4) <= _BLOCK_BUDGET_BYTES:
            break
        grid += 1
    return shape[:grid], shape[grid:]


def _make_kernel(n_grid: int, thresh: int, scale: float):
    def kernel(seed_ref, x_ref, o_ref):
        # one seed per leading-axis row (seeds live whole in SMEM — the TPU
        # lowering rejects rank-1 blocks narrower than the array unless
        # 128-aligned); fold the remaining grid coordinates so every block
        # draws an independent, reproducible stream
        extra = [pl.program_id(d) for d in range(1, n_grid)]
        pltpu.prng_seed(seed_ref[pl.program_id(0)], *extra)
        # prng_random_bits returns int32 (mosaic/primitives.py); comparing it
        # signed against the threshold would always drop the sign-bit half of
        # the stream (P(keep) = 0.5 - rate) — bitcast to uint32 first
        bits = jax.lax.bitcast_convert_type(
            pltpu.prng_random_bits(x_ref.shape), jnp.uint32
        )
        keep = bits >= jnp.uint32(thresh)
        x = x_ref[...]
        o_ref[...] = jnp.where(keep, x * jnp.asarray(scale, x.dtype),
                               jnp.zeros_like(x))

    return kernel


def _pallas_apply(x: jax.Array, seeds: jax.Array, rate: float) -> jax.Array:
    thresh = min(int(round(rate * 2 ** 32)), 2 ** 32 - 1)
    scale = 1.0 / (1.0 - rate)
    grid_dims, block_shape = _grid_split(x.shape, x.dtype.itemsize)
    if len(block_shape) == 1:
        # Mosaic requires a block's last TWO dims be (8,128)-tile-divisible or
        # equal to the array's — a (1, D) block over a gridded row axis is
        # neither. Insert a singleton axis so the block's trailing dims
        # (1, D) equal the array's; grid/seed semantics are unchanged.
        x = x.reshape(*x.shape[:-1], 1, x.shape[-1])
        out = _pallas_apply(x, seeds, rate)
        return out.reshape(*out.shape[:-2], out.shape[-1])
    n_grid = len(grid_dims)
    block = (1,) * n_grid + tuple(block_shape)

    def idx(*ids):
        return ids[:n_grid] + (0,) * len(block_shape)

    kernel = _make_kernel(n_grid, thresh, scale)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        grid=tuple(grid_dims),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # whole seeds vector
            pl.BlockSpec(block, idx, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(block, idx, memory_space=pltpu.VMEM),
        cost_estimate=pl.CostEstimate(
            flops=x.size, bytes_accessed=2 * x.size * x.dtype.itemsize,
            transcendentals=0,
        ),
    )(seeds, x)


def _sdy_rule_for_rank(ndim: int):
    """Shardy sharding rule for apply(x[ndim], seeds[1]) -> y[ndim].

    Batch factor ``b`` (dim 0, shared with the seeds vector) passes through —
    a dp-sharded input runs shard-local. Trailing factors need replication:
    the kernel regenerates bits from (row seed, block program_id), so two
    shards of the same row would draw identical streams and correlate the
    mask across trailing-dim shards.
    """
    xs = " ".join(["b"] + [f"f{i}" for i in range(1, ndim)])
    rule = f"{xs}, b -> {xs}"
    reps = tuple(f"f{i}" for i in range(1, ndim))
    return rule, ({"need_replication_factors": reps} if reps else {})


@functools.lru_cache(maxsize=None)
def _partitioned_apply(rate: float):
    """Batch-dim-partitionable wrapper: the kernel is row-independent (one
    seed per example), so a dp-sharded input runs shard-local. Both GSPMD
    (callbacks) and Shardy (sharding_rule) partitioners are served."""
    from jax.experimental.custom_partitioning import custom_partitioning

    @custom_partitioning
    def apply(x, seeds):
        return _pallas_apply(x, seeds, rate)

    def _shardings(mesh, arg_infos):
        x_sharding = arg_infos[0].sharding
        from jax.sharding import NamedSharding, PartitionSpec as P

        spec = getattr(x_sharding, "spec", None)
        batch = spec[0] if spec is not None and len(spec) else None
        return x_sharding, NamedSharding(mesh, P(batch))

    def infer(mesh, arg_infos, result_infos):
        return arg_infos[0].sharding

    def partition(mesh, arg_infos, result_infos):
        x_sharding, seeds_sharding = _shardings(mesh, arg_infos)

        def impl(x, seeds):
            return _pallas_apply(x, seeds, rate)

        return mesh, impl, x_sharding, (x_sharding, seeds_sharding)

    def sharding_rule(mesh, value_types, result_types):
        del mesh, result_types
        return _sdy_rule_for_rank(len(value_types[0].shape))

    apply.def_partition(
        infer_sharding_from_operands=infer, partition=partition,
        sharding_rule=sharding_rule,
    )
    return apply


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def _dropout_sr(x, seeds, rate: float):
    return _partitioned_apply(rate)(x, seeds)


def _dropout_sr_fwd(x, seeds, rate: float):
    return _partitioned_apply(rate)(x, seeds), seeds


def _dropout_sr_bwd(rate: float, seeds, dy):
    # same seeds -> identical regenerated mask; dx = mask * dy / keep
    return _partitioned_apply(rate)(dy, seeds), None


_dropout_sr.defvjp(_dropout_sr_fwd, _dropout_sr_bwd)


def fused_dropout(x: jax.Array, rate: float, rng: jax.Array,
                  site: str = "generic") -> jax.Array:
    """Dropout; the plain jax.random path is the default on ALL backends.

    The fused Pallas kernel is opt-in per site (see ``_use_kernel``):
    VLN_BEVBERT_FUSED_DROPOUT=1 routes every site (measured 6.4% slower
    end-to-end — module docstring); VLN_BEVBERT_FUSED_ATTN_DROPOUT=1 routes
    only ``site="attn_probs"`` (the big (B,H,Q,K) masks whose relayout +
    residual traffic the timeline blames — TRACE_SUMMARY.md).

    ``rng`` is a standard JAX PRNG key (unique per site/step, as handed out
    by flax's make_rng); per-example seeds derive from it with the normal
    partitionable RNG, so results are sharding-invariant given the key.
    """
    if rate <= 0.0:
        return x
    if not _use_kernel(site) or x.ndim < 2:
        keep = jax.random.bernoulli(rng, 1.0 - rate, x.shape)
        if os.environ.get("VLN_BEVBERT_BOOL_MASK", "0") == "1":
            # Pin the 1-byte keep predicate as the tensor XLA materializes:
            # without the barrier, layout assignment keeps the 4-byte RBG
            # bits live (fusing the compare into each consumer) and pays the
            # u32[B,H,441,441] relayout copies TRACE_SUMMARY.md blames for
            # ~11% of the step; behind the barrier both the fwd select and
            # the AD residual read the bool, so any relayout moves 1/4 the
            # bytes. Output is bitwise identical to the default path (same
            # bernoulli draw, same select) — the barrier only constrains XLA.
            keep = jax.lax.optimization_barrier(keep)
        if os.environ.get("VLN_BEVBERT_MULT_MASK", "0") == "1":
            # Multiply-by-cast-mask formulation: AD's residual is the x-dtype
            # mask (bf16: 2 B/elem, already in the consumer's layout) instead
            # of the where-path's saved predicate/bits, targeting the
            # u32[B,H,441,441] relayout-copy family in TRACE_SUMMARY.md from
            # a third angle (pallas kernel and remat both measured no-win).
            # Identical distribution; same mask stream (same bernoulli draw).
            scale = jnp.asarray(1.0 / (1.0 - rate), x.dtype)
            return x * (keep.astype(x.dtype) * scale)
        return jnp.where(keep, x / (1.0 - rate), jnp.zeros_like(x))
    seeds = jax.random.bits(rng, (x.shape[0],), jnp.uint32)
    return _dropout_sr(x, seeds, float(rate))


import flax.linen as nn  # noqa: E402  (kept after the kernel machinery)


class Dropout(nn.Module):
    """Drop-in replacement for nn.Dropout routed through fused_dropout
    (jax.random by default; the Pallas kernel only when
    VLN_BEVBERT_FUSED_DROPOUT=1 opts it in — see module docstring).

    Same constructor/call surface as the nn.Dropout subset this codebase
    uses (positional rate, ``deterministic`` kwarg, "dropout" rng
    collection); parameter-free, so checkpoints are unaffected.
    """

    rate: float
    rng_collection: str = "dropout"
    site: str = "generic"

    @nn.compact
    def __call__(self, x, *, deterministic: bool = True):
        if deterministic or self.rate == 0.0:
            return x
        return fused_dropout(
            x, self.rate, self.make_rng(self.rng_collection), site=self.site
        )
