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


def device_prefetch(iterator, mesh: Optional[Mesh] = None, depth: int = 2):
    """Overlap host->device transfer with device compute: keep `depth`
    batches already device_put ahead of consumption (the reference's
    PrefetchLoader H2D role, pretrain_src/data/loader.py:62-124).
    Items are (tag, batch) tuples; only the batch is transferred."""
    import collections

    queue = collections.deque()
    put = (lambda b: shard_batch(mesh, b)) if mesh is not None else (
        lambda b: {k: jax.device_put(v) for k, v in b.items()}
    )
    for item in iterator:
        tag, batch = item
        queue.append((tag, put(batch)))
        if len(queue) >= depth:
            yield queue.popleft()
    while queue:
        yield queue.popleft()
