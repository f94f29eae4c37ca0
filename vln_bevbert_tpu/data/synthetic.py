"""Synthetic, structurally-valid pretrain batches.

The reference ships no test fixtures (SURVEY.md section 4); real training data
(MP3D HDF5 feature stores + annotation jsonls) is also absent from this
environment. This module fabricates batches that obey the full static-shape
key contract of models/glocal.py — correct masks, aggregation matrices whose
rows are true means, consistent fuse maps — so model tests, the pjit train
step, and bench.py all exercise exactly the production compute graph.
"""

from __future__ import annotations

import math
from typing import Dict, Optional

import numpy as np

from ..configs import ModelConfig, ShapeConfig
from ..geometry import bev_camera_poses, bev_polar_pos, se3_from_xyzhe


def synthetic_raw_bev_inputs(rng: np.random.Generator, batch: int, shapes: ShapeConfig,
                             model: ModelConfig) -> Dict[str, np.ndarray]:
    """Raw (pre-lift-splat) BEV inputs: depth grids, grid features, semantic
    labels, camera extrinsics — the tensors the reference loads from HDF5
    (ref pretrain_src/data/dataset.py:397-440)."""
    v, hw = shapes.num_views, shapes.grid_hw
    n_pts = shapes.num_points
    depths = rng.uniform(0.3, 9.0, (batch, v, hw, hw)).astype(np.float32)
    depths[rng.uniform(size=depths.shape) < 0.05] = 0.0
    T_c2w, T_w2c, S_w2c = [], [], []
    for _ in range(batch):
        pos = rng.uniform(-5, 5, size=3)
        heading = rng.uniform(-math.pi, math.pi)
        cam_xyzhe = bev_camera_poses(pos, num_views=v)
        T_c2w.append(se3_from_xyzhe(cam_xyzhe))
        T_w2c.append(
            se3_from_xyzhe(np.array([[0, 0, 0, heading, 0]], np.float32))[0]
        )
        S_w2c.append(cam_xyzhe[0, :3])
    return {
        "depths": depths,
        "T_c2w": np.stack(T_c2w),
        "T_w2c": np.stack(T_w2c),
        "S_w2c": np.stack(S_w2c).astype(np.float32),
        "grid_fts": rng.normal(size=(batch, n_pts, model.bev_grid_feat_size)).astype(np.float32),
        "sem_labels": rng.integers(0, model.num_sem_classes, (batch, n_pts)).astype(np.int32),
    }


def synthetic_pretrain_batch(
    rng: np.random.Generator,
    batch: int,
    shapes: ShapeConfig,
    model: ModelConfig,
    with_objects: Optional[bool] = None,
    raw_bev: bool = True,
) -> Dict[str, np.ndarray]:
    """One batch covering every proxy task's label set.

    With ``raw_bev`` the batch carries the pre-splat tensors (the train step
    runs the BevProjector device-side, as the reference does in
    pretrain_cmt.py:114-167); otherwise ``bev_fts``/``bev_sems`` are random.
    """
    if with_objects is None:
        with_objects = model.obj_feat_size > 0
    L = shapes.max_txt_len
    # realistic R2R instruction lengths + the production collate's buckets
    txt_hi = min(64, L)
    L = next((b for b in (64, 128) if txt_hi <= b < shapes.max_txt_len),
             shapes.max_txt_len) if L > 64 else L
    T = shapes.max_steps
    V = shapes.max_pano_len
    O = shapes.max_objects if with_objects else 0
    P = V + O
    # gmap bucket mirrors the collate: typical maps fit the half cap
    N = shapes.max_gmap_len // 2 if shapes.max_gmap_len >= 8 else shapes.max_gmap_len
    K = shapes.max_local_len
    M = shapes.max_masked_tokens
    C = model.num_bev_tokens
    A = model.angle_feat_size

    out: Dict[str, np.ndarray] = {}

    # ------------------------------------------------------------------ text
    txt_lens = rng.integers(8, min(txt_hi, L) + 1, batch)
    vocab_hi = min(29611, model.vocab_size)
    vocab_lo = min(1996, max(vocab_hi - 1, 1))
    txt_ids = rng.integers(vocab_lo, vocab_hi, (batch, L)).astype(np.int32)
    txt_ids[:, 0] = min(101, model.vocab_size - 1)
    txt_masks = np.arange(L)[None, :] < txt_lens[:, None]
    txt_ids[~txt_masks] = 0
    out.update(txt_ids=txt_ids, txt_masks=txt_masks)

    # MLM: mask ~15% of valid tokens, gather into fixed M slots
    mlm_pos = np.zeros((batch, M), np.int32)
    mlm_tgt = np.zeros((batch, M), np.int32)
    mlm_valid = np.zeros((batch, M), bool)
    mlm_ids = txt_ids.copy()
    for b in range(batch):
        n_mask = min(M, max(1, int(0.15 * txt_lens[b])))
        pos = rng.choice(txt_lens[b], size=n_mask, replace=False)
        mlm_pos[b, :n_mask] = pos
        mlm_tgt[b, :n_mask] = txt_ids[b, pos]
        mlm_valid[b, :n_mask] = True
        mlm_ids[b, pos] = 103  # [MASK]
    out.update(mlm_pos=mlm_pos, mlm_tgt=mlm_tgt, mlm_valid=mlm_valid, mlm_ids=mlm_ids)

    # ------------------------------------------------------------ trajectory
    # realistic R2R path lengths: 4-7 viewpoints (the 20-step cap is a
    # truncation bound, not the typical case)
    steps = np.minimum(rng.integers(4, 8, batch), T)
    # match the production collate's trajectory-axis bucketing
    T = min(((int(steps.max()) + 3) // 4) * 4, T)
    min_views = min(36, max(1, int(0.8 * V)))  # real data: >=36 of max 44 slots
    view_lens = rng.integers(min_views, V + 1, (batch, T)).astype(np.int32)
    # candidates must also fit the K local slots (slot 0 is [stop])
    max_cand = min(7, min_views + 1, K)
    cand_counts = rng.integers(1, max_cand, (batch, T))
    obj_lens = (
        rng.integers(0, O + 1, (batch, T)).astype(np.int32)
        if with_objects
        else np.zeros((batch, T), np.int32)
    )
    step_valid = np.arange(T)[None, :] < steps[:, None]
    view_lens = np.where(step_valid, view_lens, 0).astype(np.int32)
    obj_lens = np.where(step_valid, obj_lens, 0).astype(np.int32)
    cand_counts = np.minimum(cand_counts, np.maximum(view_lens, 1))

    nav_types = np.zeros((batch, T, P), np.int32)
    for b in range(batch):
        for t in range(steps[b]):
            nav_types[b, t, : cand_counts[b, t]] = 1
            if obj_lens[b, t] > 0:
                nav_types[b, t, V : V + obj_lens[b, t]] = 2

    out["traj_view_fts"] = rng.normal(
        size=(batch, T, V, model.image_feat_size)
    ).astype(np.float32)
    out["traj_loc_fts"] = rng.normal(size=(batch, T, P, A + 3)).astype(np.float32)
    out["traj_nav_types"] = nav_types
    out["traj_view_lens"] = view_lens
    out["traj_last_step"] = (steps - 1).astype(np.int32)
    if with_objects:
        out["traj_obj_fts"] = rng.normal(
            size=(batch, T, O, model.obj_feat_size)
        ).astype(np.float32)
        out["traj_obj_lens"] = obj_lens

    # ------------------------------------------------------------ global map
    gmap_lens = np.minimum(1 + steps + rng.integers(1, 10, batch), N).astype(np.int32)
    gmap_masks = np.arange(N)[None, :] < gmap_lens[:, None]
    gmap_step_ids = np.zeros((batch, N), np.int32)
    gmap_visited = np.zeros((batch, N), bool)
    gmap_agg = np.zeros((batch, N, T * P), np.float32)
    for b in range(batch):
        # nodes 1..steps are visited (step ids 1..steps); rest are frontier
        for t in range(steps[b]):
            node = 1 + t
            if node >= gmap_lens[b]:
                break
            gmap_step_ids[b, node] = t + 1
            gmap_visited[b, node] = True
            ln = view_lens[b, t] + obj_lens[b, t]
            w = np.zeros(P)
            w[: view_lens[b, t]] = 1.0 / ln
            w[V : V + obj_lens[b, t]] = 1.0 / ln
            gmap_agg[b, node, t * P : (t + 1) * P] = w
        for node in range(1 + steps[b], gmap_lens[b]):
            # frontier node: mean of 1-2 candidate-view sightings
            n_sight = rng.integers(1, 3)
            for _ in range(n_sight):
                t = rng.integers(0, steps[b])
                j = rng.integers(0, cand_counts[b, t])
                gmap_agg[b, node, t * P + j] += 1.0 / n_sight
    out.update(
        gmap_step_ids=gmap_step_ids,
        gmap_masks=gmap_masks,
        gmap_visited_masks=gmap_visited,
        gmap_agg=gmap_agg,
        gmap_pos_fts=rng.normal(size=(batch, N, A + 3)).astype(np.float32),
    )
    dists = rng.uniform(0, 1, (batch, N, N)).astype(np.float32)
    dists = (dists + dists.transpose(0, 2, 1)) / 2
    dists[:, np.arange(N), np.arange(N)] = 0
    out["gmap_pair_dists"] = dists * gmap_masks[:, :, None] * gmap_masks[:, None, :]

    # -------------------------------------------------------------- local BEV
    centre = model.bev_center
    bev_nav_masks = np.zeros((batch, C), bool)
    bev_cand_idxs = np.zeros((batch, K), np.int32)
    local_masks = np.zeros((batch, K), bool)
    fuse_map = np.zeros((batch, N, K), np.float32)
    for b in range(batch):
        t_last = steps[b] - 1
        n_cand = int(cand_counts[b, t_last])
        cells = rng.choice(C, size=n_cand, replace=False)
        bev_cand_idxs[b, 0] = centre  # [stop]
        bev_cand_idxs[b, 1 : 1 + n_cand] = cells
        local_masks[b, : 1 + n_cand] = True
        bev_nav_masks[b, cells] = True
        bev_nav_masks[b, centre] = True
        # fuse map (ref pretrain_cmt.py:339-356): stop->stop; each unvisited
        # gmap node takes either its candidate's local logit or the summed
        # "backtrack" logits of visited candidates
        fuse_map[b, 0, 0] = 1.0
        visited_cols = []
        unvisited_cols = list(range(1, 1 + n_cand))
        rng.shuffle(unvisited_cols)
        n_back = rng.integers(0, len(unvisited_cols) + 1)
        visited_cols = unvisited_cols[:n_back]
        fresh_cols = unvisited_cols[n_back:]
        unvisited_nodes = [
            j for j in range(1, gmap_lens[b]) if not gmap_visited[b, j]
        ]
        for j in unvisited_nodes:
            if fresh_cols:
                fuse_map[b, j, fresh_cols.pop()] = 1.0
            else:
                for k in visited_cols:
                    fuse_map[b, j, k] = 1.0
    out.update(
        bev_nav_masks=bev_nav_masks,
        bev_cand_idxs=bev_cand_idxs,
        local_masks=local_masks,
        fuse_map=fuse_map,
        bev_masks=np.ones((batch, C), bool),  # pretrain uses all-ones masks
    )

    # bev positional features: [gpos (A+3) broadcast | polar (3)]
    polar = bev_polar_pos(model.bev_dim).reshape(1, C, 3)
    gpos = rng.normal(size=(batch, 1, A + 3)).astype(np.float32)
    out["bev_pos_fts"] = np.concatenate(
        [np.broadcast_to(gpos, (batch, C, A + 3)), np.broadcast_to(polar, (batch, C, 3))],
        axis=-1,
    ).astype(np.float32)

    if raw_bev:
        out.update(synthetic_raw_bev_inputs(rng, batch, shapes, model))
    else:
        out["bev_fts"] = rng.normal(
            size=(batch, C, model.bev_grid_feat_size)
        ).astype(np.float32)
        out["bev_sems"] = (rng.uniform(size=(batch, C, model.num_sem_classes)) < 0.1).astype(np.float32)
        out["bev_sem_masks"] = rng.uniform(size=(batch, C)) < 0.7

    out["bev_mrc_masks"] = rng.uniform(size=(batch, C)) < 0.15

    # ------------------------------------------------------------- act labels
    glabels = np.zeros(batch, np.int64)
    llabels = np.zeros(batch, np.int64)
    for b in range(batch):
        if rng.uniform() < 0.3:
            glabels[b] = llabels[b] = 0  # stop
        else:
            unvisited = [
                j for j in range(1, gmap_lens[b]) if not gmap_visited[b, j]
            ]
            glabels[b] = unvisited[0] if unvisited else -100
            llabels[b] = rng.integers(1, int(local_masks[b].sum()))
    out["global_act_labels"] = glabels
    out["local_act_labels"] = llabels

    # --------------------------------------------------------------- obj task
    if with_objects:
        o_last = np.array(
            [obj_lens[b, steps[b] - 1] for b in range(batch)], np.int64
        )
        out["obj_labels"] = np.where(
            o_last > 0, rng.integers(0, np.maximum(o_last, 1)), -100
        )
        probs = rng.uniform(size=(batch, O, model.obj_prob_size)).astype(np.float32)
        out["obj_probs"] = probs / probs.sum(-1, keepdims=True)
        out["obj_mrc_masks"] = rng.uniform(size=(batch, O)) < 0.3

    return out


def synthetic_replay_bundle(
    rng: np.random.Generator, cfg, batch: int
) -> Dict[str, np.ndarray]:
    """A structurally valid fine-tune replay bundle (the tensor dict
    GMapNavAgent._learn stacks from rollout StepRecords, nav/agent.py) —
    step-leading (T, B, ...) tensors with consistent masks/targets, for
    sharding/equality tests and the multichip dryrun without an env.
    """
    sh, m = cfg.shapes, cfg.model
    T = cfg.max_action_len
    V = sh.max_pano_len
    with_objects = m.obj_feat_size > 0
    O = sh.max_objects if with_objects else 0
    P = V + O
    N, K, C, A = sh.max_gmap_len, sh.max_local_len, m.num_bev_tokens, m.angle_feat_size
    IGNORE = -100

    L = min(32, sh.max_txt_len)
    txt_lens = rng.integers(4, L + 1, batch)
    txt_ids = rng.integers(1, min(4000, m.vocab_size), (batch, L)).astype(np.int32)
    txt_masks = np.arange(L)[None, :] < txt_lens[:, None]
    txt_ids[~txt_masks] = 0

    steps = rng.integers(max(1, T - 2), T + 1, batch)  # active steps per sample
    view_lens = rng.integers(2, V + 1, (T, batch)).astype(np.int32)
    cand_counts = np.minimum(
        rng.integers(1, min(K, V), (T, batch)), view_lens
    )
    nav_types = np.zeros((T, batch, P), np.int32)
    gmap_lens = np.minimum(2 + rng.integers(0, N - 1, (T, batch)), N)
    rb: Dict[str, np.ndarray] = {
        "view_fts": rng.normal(size=(T, batch, V, m.image_feat_size)).astype(np.float32),
        "loc_fts": rng.normal(size=(T, batch, P, A + 3)).astype(np.float32),
        "nav_types": nav_types,
        "view_lens": view_lens,
        "gmap_agg": np.zeros((T, batch, N, T * P), np.float32),
        "gmap_step_ids": rng.integers(
            0, m.max_action_steps, (T, batch, N)
        ).astype(np.int32),
        "gmap_pos_fts": rng.normal(size=(T, batch, N, A + 3)).astype(np.float32),
        "gmap_masks": np.zeros((T, batch, N), bool),
        "gmap_visited_masks": np.zeros((T, batch, N), bool),
        "gmap_pair_dists": np.zeros((T, batch, N, N), np.float32),
        "bev_fts": rng.normal(size=(T, batch, C, m.bev_grid_feat_size)).astype(np.float32),
        "bev_pos_fts": rng.normal(size=(T, batch, C, A + 6)).astype(np.float32),
        "bev_nav_masks": np.zeros((T, batch, C), bool),
        "bev_cand_idxs": np.zeros((T, batch, K), np.int32),
        "local_masks": np.zeros((T, batch, K), bool),
        "fuse_map": np.zeros((T, batch, N, K), np.float32),
        "targets": np.full((T, batch), IGNORE, np.int64),
        "txt_ids": txt_ids,
        "txt_masks": txt_masks,
        "step_idx": np.arange(T, dtype=np.int32),
    }
    if with_objects:
        rb["obj_fts"] = rng.normal(size=(T, batch, O, m.obj_feat_size)).astype(np.float32)
        rb["obj_lens"] = rng.integers(0, O + 1, (T, batch)).astype(np.int32)
        rb["obj_targets"] = np.full((T, batch), IGNORE, np.int64)
    for t in range(T):
        for b in range(batch):
            if t >= steps[b]:
                # padded step: fully masked, targets ignored — mirror
                # _learn's zero padding
                view_lens[t, b] = 0
                rb["gmap_step_ids"][t, b] = 0
                continue
            nc = int(cand_counts[t, b])
            nav_types[t, b, :nc] = 1
            n = int(gmap_lens[t, b])
            rb["gmap_masks"][t, b, :n] = True
            n_vis = max(1, n // 2)
            rb["gmap_visited_masks"][t, b, 1 : 1 + n_vis] = True
            d = rng.uniform(0, 1, (N, N)).astype(np.float32)
            d = (d + d.T) / 2
            np.fill_diagonal(d, 0)
            rb["gmap_pair_dists"][t, b] = d
            # aggregation rows: true means over earlier steps' pano slots
            for node in range(1, n):
                src_t = rng.integers(0, t + 1)
                vl = max(int(view_lens[src_t, b]), 1)
                rb["gmap_agg"][t, b, node, src_t * P : src_t * P + vl] = 1.0 / vl
            rb["gmap_agg"][t, b, 0, t * P] = 1.0  # [stop] token
            cells = rng.choice(C, size=nc, replace=False)
            rb["bev_cand_idxs"][t, b, 0] = m.bev_center
            rb["bev_cand_idxs"][t, b, 1 : 1 + nc] = cells
            rb["local_masks"][t, b, : 1 + nc] = True
            rb["bev_nav_masks"][t, b, cells] = True
            rb["bev_nav_masks"][t, b, m.bev_center] = True
            rb["fuse_map"][t, b, 0, 0] = 1.0
            for j in range(1 + n_vis, n):
                rb["fuse_map"][t, b, j, 1 + rng.integers(0, nc)] = 1.0
            rb["targets"][t, b] = (
                0 if rng.uniform() < 0.2 else int(1 + n_vis + rng.integers(0, max(n - 1 - n_vis, 1))) % n
            )
            if with_objects:
                ol = int(rb["obj_lens"][t, b])
                if ol:
                    nav_types[t, b, V : V + ol] = 2
                    rb["obj_targets"][t, b] = rng.integers(0, ol)
    return rb
