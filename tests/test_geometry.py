import math

import numpy as np
import pytest
from scipy.spatial.transform import Rotation

from vln_bevbert_tpu import geometry as geo


def test_se3_rotation_matches_scipy(rng):
    xyzhe = rng.normal(size=(16, 5)).astype(np.float32)
    T = geo.se3_from_xyzhe(xyzhe)
    assert T.shape == (16, 4, 4)
    for i in range(16):
        # intrinsic Y-then-X euler = R_y(h) @ R_x(e)
        R = Rotation.from_euler("YX", [xyzhe[i, 3], xyzhe[i, 4]]).as_matrix()
        np.testing.assert_allclose(T[i, :3, :3], R, atol=1e-5)
        np.testing.assert_allclose(T[i, :3, 3], xyzhe[i, :3], atol=1e-6)
        np.testing.assert_allclose(T[i, 3], [0, 0, 0, 1], atol=0)


def test_se3_identity():
    T = geo.se3_from_xyzhe(np.zeros((1, 5), np.float32))[0]
    np.testing.assert_allclose(T, np.eye(4), atol=1e-7)


def test_bev_polar_pos_properties():
    for dim in (5, 11, 21):
        pos = geo.bev_polar_pos(dim)
        assert pos.shape == (dim, dim, 3)
        c = dim // 2
        # centre cell: zero encoding (divide-by-zero guard)
        np.testing.assert_allclose(pos[c, c], [0, 0, 0], atol=1e-6)
        # cell straight "up" from centre: cos=0, sin=1
        np.testing.assert_allclose(pos[0, c, :2], [0, 1], atol=1e-6)
        # cell to the right: cos=1, sin=0
        np.testing.assert_allclose(pos[c, dim - 1, :2], [1, 0], atol=1e-6)
        # distances normalised by dim/2; farthest corner > 1 (sqrt 2 corner)
        assert pos[c, dim - 1, 2] == pytest.approx((dim / 2 - 0.5) / (dim / 2))
        # unit circle property wherever distance > 0
        r = np.sqrt(pos[..., 0] ** 2 + pos[..., 1] ** 2)
        mask = pos[..., 2] > 0
        np.testing.assert_allclose(r[mask], 1.0, atol=1e-5)


def test_bev_polar_pos_bruteforce():
    dim = 7
    pos = geo.bev_polar_pos(dim)
    for i in range(dim):
        for j in range(dim):
            y = -((i + 0.5) - dim / 2)
            x = (j + 0.5) - dim / 2
            d = math.hypot(x, y)
            np.testing.assert_allclose(pos[i, j, 2], d / (dim / 2), rtol=1e-5)
            if d > 0:
                np.testing.assert_allclose(pos[i, j, 0], x / d, atol=1e-5)
                np.testing.assert_allclose(pos[i, j, 1], y / d, atol=1e-5)


def test_angle_features():
    h = np.array([0.0, math.pi / 2])
    e = np.array([0.0, -math.pi / 2])
    f = geo.angle_features(h, e, angle_feat_size=4)
    np.testing.assert_allclose(f[0], [0, 1, 0, 1], atol=1e-6)
    np.testing.assert_allclose(f[1], [1, 0, -1, 0], atol=1e-6)
    f8 = geo.angle_features(h, e, angle_feat_size=8)
    assert f8.shape == (2, 8)
    np.testing.assert_allclose(f8[:, :4], f8[:, 4:])


def test_view_rel_angles():
    rel = geo.view_rel_angles(base_view_id=12)  # base: middle ring, heading 0
    assert rel.shape == (36, 2)
    np.testing.assert_allclose(rel[12], [0, 0], atol=1e-6)       # itself
    np.testing.assert_allclose(rel[13], [math.radians(30), 0], atol=1e-6)
    np.testing.assert_allclose(rel[0], [0, -math.radians(30)], atol=1e-6)
    np.testing.assert_allclose(rel[24], [0, math.radians(30)], atol=1e-6)


def test_rel_pos_features():
    a = np.zeros(3)
    # MP3D convention: heading measured from +y toward +x
    h, e, d = geo.rel_pos_features(a, np.array([0.0, 2.0, 0.0]))
    assert h == pytest.approx(0.0) and d == pytest.approx(2.0)
    h, _, _ = geo.rel_pos_features(a, np.array([1.0, 0.0, 0.0]))
    assert h == pytest.approx(math.pi / 2)
    h, _, _ = geo.rel_pos_features(a, np.array([0.0, -3.0, 0.0]))
    assert h == pytest.approx(math.pi)
    _, e, d = geo.rel_pos_features(a, np.array([0.0, 1.0, 1.0]))
    assert e == pytest.approx(math.pi / 4) and d == pytest.approx(math.sqrt(2))
    # base heading subtraction
    h, _, _ = geo.rel_pos_features(a, np.array([1.0, 0.0, 0.0]), base_heading=0.5)
    assert h == pytest.approx(math.pi / 2 - 0.5)


def test_normalize_angle():
    x = np.array([0.0, math.pi, -math.pi, 3 * math.pi, -0.5])
    out = geo.normalize_angle(x)
    np.testing.assert_allclose(out, [0, math.pi, math.pi, math.pi, -0.5], atol=1e-9)
    assert np.all(out <= math.pi + 1e-12) and np.all(out > -math.pi - 1e-12)


def test_nearest_anchor():
    assert geo.nearest_anchor(0.0) == 0
    assert geo.nearest_anchor(math.radians(29)) == 1
    assert geo.nearest_anchor(math.radians(-10)) == 0
    assert geo.nearest_anchor(math.radians(355)) == 0


def test_camera_intrinsics_and_rays():
    K = geo.camera_intrinsics(14, 14, math.radians(90))
    # vfov 90 deg, square image: fx = fy = W/2
    assert K[0, 0] == pytest.approx(7.0)
    assert K[1, 1] == pytest.approx(7.0)
    xs, ys = geo.pixel_ray_scales(14, 14, math.radians(90))
    assert xs.shape == ys.shape == (14, 14)
    # leftmost pixel centre: (0.5 - 7) / 7
    assert xs[0, 0] == pytest.approx((0.5 - 7.0) / 7.0)
    assert ys[0, 0] == pytest.approx((0.5 - 7.0) / 7.0)
    # symmetric about the optical axis
    np.testing.assert_allclose(xs[:, 0], -xs[:, -1], atol=1e-6)
    np.testing.assert_allclose(ys[0, :], -ys[-1, :], atol=1e-6)


def test_world_to_ego_cand_cells():
    dim, res = 21, 0.5
    centre = np.array([3.0, -2.0, 1.0])
    c = dim // 2
    # candidate at the agent's own position -> centre cell
    cells = geo.world_to_ego_cand_cells(centre[None, :], centre, 0.3, dim, res)
    assert cells[0] == c * dim + c
    # 1m "ahead" at heading 0 (MP3D +y) -> two rows toward the top
    ahead = centre + np.array([0.0, 1.0, 0.0])
    cells = geo.world_to_ego_cand_cells(ahead[None, :], centre, 0.0, dim, res)
    assert cells[0] == (c - 2) * dim + c
    # same offset viewed at heading pi/2 == offset rotated to the left side
    cells_rot = geo.world_to_ego_cand_cells(
        ahead[None, :], centre, math.pi / 2, dim, res
    )
    right = centre + np.array([1.0, 0.0, 0.0])
    cells_right = geo.world_to_ego_cand_cells(right[None, :], centre, 0.0, dim, res)
    # rotating the agent +90deg turns "ahead" into "left": mirror of "right"
    assert cells_rot[0] == c * dim + (c - 2)
    assert cells_right[0] == c * dim + (c + 2)
    # out-of-grid candidates are clamped, not dropped
    far = centre + np.array([100.0, 0.0, 0.0])
    cells = geo.world_to_ego_cand_cells(far[None, :], centre, 0.0, dim, res)
    assert cells[0] == c * dim + (dim - 1)
