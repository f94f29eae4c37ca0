"""Teacher-recollection training (off-policy imitation).

Role of the reference's "dagger" trainer + TeacherRecollectionDataset
(/root/reference/bevbert_ce/vlnce_baselines/dagger_trainer.py:98-188,
common/recollection_dataset.py:22-): collect teacher-forced trajectories
once, persist the per-step training inputs (the reference uses LMDB), then
run multiple supervised epochs from the store without touching the simulator.

Here an episode's training inputs are exactly one replay bundle (the same
stacked StepRecord tensors the online agent trains from), so the store is a
list of ready-to-train bundles — npz-persistable — and each training step is
one compiled replay-loss update.
"""

from __future__ import annotations

import os
from typing import Dict, List, Optional

import numpy as np


class TeacherRecollectionStore:
    def __init__(self, agent, capacity: int = 1024):
        self.agent = agent
        self.capacity = capacity
        self.bundles: List[Dict[str, np.ndarray]] = []

    # ------------------------------------------------------------- collection
    def collect(self, n_rollouts: int):
        """Teacher-forced rollouts; each contributes one replay bundle."""
        agent = self.agent
        orig_learn = agent._learn
        captured: List[Dict[str, np.ndarray]] = []

        def capture(lang, records):
            bundle = agent_build_bundle(agent, lang, records)
            captured.append(bundle)
            return None

        agent._learn = capture
        try:
            for _ in range(n_rollouts):
                agent.rollout(feedback="teacher", train=True)
        finally:
            agent._learn = orig_learn
        self.bundles.extend(captured)
        self.bundles = self.bundles[-self.capacity :]
        return len(captured)

    # --------------------------------------------------------------- training
    def train_epochs(self, epochs: int, rng: Optional[np.random.Generator] = None):
        """Supervised updates from the store (ref dagger_trainer's epoch loop
        over the LMDB dataset)."""
        rng = rng or np.random.default_rng(0)
        losses = []
        for _ in range(epochs):
            order = rng.permutation(len(self.bundles))
            for i in order:
                losses.append(self.agent.learn_from_bundle(self.bundles[i]))
        return losses

    # ------------------------------------------------------------ persistence
    def save(self, directory: str):
        os.makedirs(directory, exist_ok=True)
        for i, b in enumerate(self.bundles):
            np.savez_compressed(os.path.join(directory, f"ep_{i:06d}.npz"), **b)

    def load(self, directory: str):
        for name in sorted(os.listdir(directory)):
            if name.endswith(".npz"):
                with np.load(os.path.join(directory, name)) as z:
                    self.bundles.append({k: z[k] for k in z.files})
        self.bundles = self.bundles[-self.capacity :]
        return len(self.bundles)


def agent_build_bundle(agent, lang, records) -> Dict[str, np.ndarray]:
    """Materialise the replay bundle an agent would train from (host copy of
    agent._learn's packing, without the update)."""
    T = agent.cfg.max_action_len

    def stack(attr, fill=0):
        arrs = [np.asarray(getattr(r, attr)) for r in records]
        pad = T - len(arrs)
        if pad:
            pad_arr = (
                np.full_like(arrs[0], fill) if fill else np.zeros_like(arrs[0])
            )
            arrs = arrs + [pad_arr] * pad
        return np.stack(arrs)

    keys = [
        "view_fts", "loc_fts", "nav_types", "view_lens", "gmap_agg",
        "gmap_step_ids", "gmap_pos_fts", "gmap_masks", "gmap_pair_dists",
        "gmap_visited_masks",
    ]
    if agent.cfg.model.use_bev:
        keys += ["bev_nav_masks", "bev_cand_idxs", "local_masks",
                 "fuse_map", "bev_pos_fts"]
    bundle = {k: stack(k) for k in keys}
    if agent.cfg.model.use_bev:
        bundle["bev_fts"] = stack("bev_fts")
    bundle["targets"] = stack("targets", fill=-100)
    bundle["step_idx"] = np.arange(T, dtype=np.int32)
    bundle["txt_ids"] = np.asarray(lang["txt_ids"])
    bundle["txt_masks"] = np.asarray(lang["txt_masks"])
    if agent.with_objects and records[0].obj_fts is not None:
        bundle["obj_fts"] = stack("obj_fts")
        bundle["obj_lens"] = stack("obj_lens")
        bundle["obj_targets"] = stack("obj_targets", fill=-100)
    return bundle
