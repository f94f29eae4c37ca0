"""Golden tests for the BEV lift-splat against a slow, obviously-correct
pure-python reference implementation written from the projective geometry
itself (not from either codebase)."""

import math

import numpy as np
import pytest

from vln_bevbert_tpu.geometry import pixel_ray_scales, se3_from_xyzhe
from vln_bevbert_tpu.ops.bev import BevProjector


def loop_lift_splat(depths, T_c2w, T_w2c, S_w2c, feats, sem_labels,
                    vfov, map_dim, map_res, z_clip, num_sem):
    """Per-point loop reference: unproject, transform, bin, mean."""
    B, V, H, W = depths.shape
    C = feats.shape[-1]
    xs, ys = pixel_ray_scales(W, H, vfov)
    bev = np.zeros((B, map_dim * map_dim, C))
    cnt = np.zeros((B, map_dim * map_dim))
    sem = np.zeros((B, map_dim * map_dim, num_sem))
    for b in range(B):
        for v in range(V):
            for i in range(H):
                for j in range(W):
                    d = depths[b, v, i, j]
                    if d == 0:
                        continue
                    cam = np.array([d * xs[i, j], d * ys[i, j], d, 1.0])
                    world = T_c2w[b, v] @ cam
                    p = world[:3] - S_w2c[b]
                    ego = T_w2c[b, :3, :3] @ p
                    gx = round(ego[0] / map_res) + (map_dim - 1) // 2
                    gz = round(ego[2] / map_res) + (map_dim - 1) // 2
                    if not (0 <= gx < map_dim and 0 <= gz < map_dim):
                        continue
                    if ego[1] > z_clip:
                        continue
                    cell = gz * map_dim + gx
                    n = v * H * W + i * W + j
                    bev[b, cell] += feats[b, n]
                    sem[b, cell, sem_labels[b, n]] += 1
                    cnt[b, cell] += 1
    occ = cnt > 0
    bev = bev / np.maximum(cnt, 1)[:, :, None]
    sem_presence = (sem > 0).astype(np.float32)
    sem_mask = sem.sum(-1) > 0
    return bev, occ, sem_presence, sem_mask


def make_inputs(rng, B=2, V=3, HW=4, num_sem=7, C=16):
    depths = rng.uniform(0.0, 4.0, size=(B, V, HW, HW)).astype(np.float32)
    depths[rng.uniform(size=depths.shape) < 0.15] = 0.0  # missing depth
    cam_xyzhe = rng.normal(size=(B * V, 5)).astype(np.float32)
    T_c2w = se3_from_xyzhe(cam_xyzhe).reshape(B, V, 4, 4)
    ego_h = rng.uniform(-math.pi, math.pi, size=(B,))
    T_w2c = se3_from_xyzhe(
        np.stack([np.zeros(B), np.zeros(B), np.zeros(B), ego_h, np.zeros(B)], -1)
    )
    S_w2c = rng.normal(scale=0.5, size=(B, 3)).astype(np.float32)
    feats = rng.normal(size=(B, V * HW * HW, C)).astype(np.float32)
    sem_labels = rng.integers(0, num_sem, size=(B, V * HW * HW))
    return depths, T_c2w, T_w2c, S_w2c, feats, sem_labels


@pytest.mark.parametrize("use_pallas", [False, True])
def test_lift_splat_matches_loop_reference(rng, use_pallas):
    vfov = math.radians(90.0)
    B, V, HW, num_sem, C = 2, 3, 4, 7, 16
    map_dim, map_res, z_clip = 5, 1.0, 0.5
    depths, T_c2w, T_w2c, S_w2c, feats, sem_labels = make_inputs(
        rng, B, V, HW, num_sem, C
    )

    proj = BevProjector(
        vfov=vfov, grid_hw=HW, num_views=V, map_dim=map_dim,
        map_res=map_res, z_clip=z_clip, num_sem=num_sem, use_pallas=use_pallas,
    )
    bev, occ, sem, sem_mask = proj.lift_splat(
        depths, T_c2w, T_w2c, S_w2c, feats, sem_labels
    )
    exp_bev, exp_occ, exp_sem, exp_sem_mask = loop_lift_splat(
        depths, T_c2w, T_w2c, S_w2c, feats, sem_labels,
        vfov, map_dim, map_res, z_clip, num_sem,
    )
    # bf16 payload accumulation: tolerate ~1e-2 absolute
    np.testing.assert_allclose(np.asarray(bev), exp_bev, atol=2e-2)
    np.testing.assert_array_equal(np.asarray(occ), exp_occ)
    np.testing.assert_array_equal(np.asarray(sem), exp_sem)
    np.testing.assert_array_equal(np.asarray(sem_mask), exp_sem_mask)


def test_lift_known_geometry():
    """A camera at origin looking with identity pose: points land at z=depth."""
    proj = BevProjector(grid_hw=2, num_views=1, map_dim=5, map_res=1.0)
    depths = np.full((1, 1, 2, 2), 3.0, np.float32)
    T = np.eye(4, dtype=np.float32)[None, None]
    pts, no_depth = proj.lift(depths, T)
    pts = np.asarray(pts)
    assert pts.shape == (1, 4, 3)
    np.testing.assert_allclose(pts[0, :, 2], 3.0, atol=1e-6)
    assert not np.asarray(no_depth).any()
    # ray symmetry: the 2x2 grid is symmetric about the optical axis
    np.testing.assert_allclose(pts[0, 0, :2], -pts[0, 3, :2], atol=1e-6)


def test_splat_empty_and_full_cells():
    proj = BevProjector(grid_hw=2, num_views=1, map_dim=3, map_res=1.0)
    # all four points into cell 4 (centre)
    cell = np.full((1, 4), 4, np.int32)
    valid = np.ones((1, 4), bool)
    feats = np.arange(4, dtype=np.float32)[None, :, None] * np.ones((1, 4, 8), np.float32)
    bev, occ, _, _ = proj.splat(cell, valid, feats)
    np.testing.assert_allclose(np.asarray(bev)[0, 4], 1.5, atol=1e-2)
    assert np.asarray(occ).sum() == 1
    # masked-out points contribute nothing
    valid = np.array([[True, False, False, False]])
    bev, occ, _, _ = proj.splat(cell, valid, feats)
    np.testing.assert_allclose(np.asarray(bev)[0, 4], 0.0, atol=1e-6)
