"""Multi-host distributed helpers.

TPU-native equivalents of the reference's NCCL layer
(/root/reference/pretrain_src/utils/distributed.py): gradient all-reduce is
already inside the compiled step (psum over the dp mesh); what remains is
host-level coordination — initialisation, and gathering arbitrary Python
objects (metrics, predictions) across hosts, which the reference implements
as pickle->ByteTensor->padded all_gather (distributed.py:91-131). Here that
rides jax.experimental.multihost_utils.
"""

from __future__ import annotations

import os
from typing import Any, List, Optional

import jax
import numpy as np


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None):
    """jax.distributed.initialize with env-var fallbacks (JAX_COORDINATOR,
    JAX_NUM_PROCESSES, JAX_PROCESS_ID); no-op on a single host."""
    num = num_processes or int(os.environ.get("JAX_NUM_PROCESSES", "1"))
    if num <= 1:
        return
    jax.distributed.initialize(
        coordinator_address=coordinator_address
        or os.environ.get("JAX_COORDINATOR"),
        num_processes=num,
        process_id=process_id
        if process_id is not None
        else int(os.environ.get("JAX_PROCESS_ID", "0")),
    )


def is_primary() -> bool:
    return jax.process_index() == 0


def all_gather_objects(obj: Any) -> List[Any]:
    """Gather an arbitrary picklable object from every host (reference
    all_gather, pretrain_src/utils/distributed.py:91-131). Single host: [obj].
    """
    if jax.process_count() == 1:
        return [obj]
    import pickle

    from jax.experimental import multihost_utils

    payload = np.frombuffer(pickle.dumps(obj), dtype=np.uint8)
    # pad to a common length
    local_len = np.array([len(payload)], np.int32)
    lens = multihost_utils.process_allgather(local_len).reshape(-1)
    max_len = int(lens.max())
    padded = np.zeros(max_len, np.uint8)
    padded[: len(payload)] = payload
    gathered = multihost_utils.process_allgather(padded)
    return [
        pickle.loads(gathered[i, : int(lens[i])].tobytes())
        for i in range(jax.process_count())
    ]


def merge_results(list_of_lists: List[List[Any]], key: str = "instr_id") -> List[Any]:
    """Concatenate per-host prediction lists, de-duplicating on `key`
    (reference merge_dist_results, map_nav_src/utils/distributed.py:160-164)."""
    seen, out = set(), []
    for lst in list_of_lists:
        for item in lst:
            k = item.get(key) if isinstance(item, dict) else item
            if k not in seen:
                seen.add(k)
                out.append(item)
    return out
