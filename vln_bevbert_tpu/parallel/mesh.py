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


#: replay-bundle keys that are per-step schedule/rng state, not batched data
_BUNDLE_REPLICATED = ("step_idx", "rng", "rng_lang", "rng_pano")
#: replay-bundle keys with a leading batch axis (everything else is (T, B, …))
_BUNDLE_BATCH_LEADING = ("txt_ids", "txt_masks")


def shard_replay_bundle(mesh: Mesh, rb: dict, axis: str = "dp") -> dict:
    """Device-put a fine-tune replay bundle over the dp mesh.

    Step-leading tensors (T, B, ...) shard on their batch axis (axis 1); text
    tensors (B, L) on axis 0; step-index/rng arrays replicate. With params
    replicated, jitting the replay update over these inputs makes XLA insert
    the gradient all-reduce — the TPU equivalent of the reference's fine-tune
    DDP wrapper (/root/reference/map_nav_src/r2r/agent_base.py:121-123).
    """
    out = {}
    for k, v in rb.items():
        if k in _BUNDLE_REPLICATED:
            spec = P()
        elif k in _BUNDLE_BATCH_LEADING:
            spec = P(axis)
        else:
            spec = P(None, axis)
        out[k] = jax.device_put(v, NamedSharding(mesh, spec))
    return out


def replicate_tree(mesh: Mesh, tree):
    """Device-put an arbitrary pytree fully replicated over the mesh."""
    s = NamedSharding(mesh, P())
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, s), tree)


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
