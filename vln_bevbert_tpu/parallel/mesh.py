"""Device mesh + sharding helpers.

The reference's only training parallelism is DDP data-parallel over NCCL
(/root/reference/pretrain_src/utils/misc.py:64-77, SURVEY.md section 2).
TPU-native equivalent: a 1-D ``dp`` mesh over ICI; the batch is sharded on its
leading axis, parameters and optimiser state are replicated, and XLA inserts
the gradient psum when it partitions the jitted train step. bert-base scale
(~210M params) needs no tensor/pipeline sharding — at 4 bytes/param + 2x adam
moments it is ~2.5 GB replicated, well inside a v5e chip's HBM.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(devices: Optional[Sequence[jax.Device]] = None, axis: str = "dp") -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    return Mesh(devices, (axis,))


def batch_sharding(mesh: Mesh, axis: str = "dp") -> NamedSharding:
    """Leading-axis (batch) sharding."""
    return NamedSharding(mesh, P(axis))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch: dict, axis: str = "dp") -> dict:
    """Device-put a host batch with its leading axis split across the mesh."""
    s = batch_sharding(mesh, axis)
    return {
        k: jax.device_put(v, s) for k, v in batch.items()
    }
