"""Pallas TPU kernel for the BEV splat contraction.

Computes, per batch element, ``out[c, d] = sum_n [cell[n] == c] * payload[n, d]``
— the scatter-sum at the heart of the reference's torch_scatter scatter_mean
(/root/reference/pretrain_src/model/bev_utils.py:407-421) — as an MXU matmul
whose one-hot assignment matrix is generated *inside* VMEM with an iota
comparison, so the (points x cells) matrix never exists in HBM.

Per-sample working set at the default shapes (2352 points, 441 cells, ~809
payload channels): one-hot 2352x441 bf16 ~= 2.1 MB, payload 2352x832 bf16
~= 3.9 MB, accumulator 441x832 f32 ~= 1.5 MB — comfortably inside the
~16 MB/core VMEM budget, so the grid is simply the batch dimension.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


# Mosaic kernels only compile for real TPUs; everywhere else (CPU tests,
# multi-host dry runs) fall back to the Pallas interpreter.
def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _splat_kernel(cell_ref, payload_ref, out_ref):
    # cell_ref: (1, N, 1); payload_ref: (1, N, D); out_ref: (1, C, D)
    n = cell_ref.shape[1]
    num_cells = out_ref.shape[1]
    cell = cell_ref[0, :, :]  # (N, 1)
    cell_ids = jax.lax.broadcasted_iota(jnp.int32, (n, num_cells), 1)
    one_hot = (cell == cell_ids).astype(jnp.bfloat16)  # (N, C)
    out_ref[0, :, :] = jax.lax.dot_general(
        one_hot,
        payload_ref[0, :, :],
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


@functools.partial(jax.jit, static_argnums=2)
def splat_sums(cell: jnp.ndarray, payload: jnp.ndarray, num_cells: int) -> jnp.ndarray:
    """cell: (B, N) int32 (invalid rows = -1); payload: (B, N, D) bf16.
    Returns (B, num_cells, D) float32 per-cell sums."""
    b, n = cell.shape
    d = payload.shape[-1]
    return pl.pallas_call(
        _splat_kernel,
        out_shape=jax.ShapeDtypeStruct((b, num_cells, d), jnp.float32),
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, n, 1), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, num_cells, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * n * num_cells * d,
            bytes_accessed=b * (n * 4 + n * d * 2 + num_cells * d * 4),
            transcendentals=0,
        ),
        interpret=_interpret(),
    )(cell.astype(jnp.int32)[:, :, None], payload.astype(jnp.bfloat16))
