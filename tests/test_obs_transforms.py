"""Obs-transform parity tests: area resize vs torch, cubemap stitching.

The reference registers three per-sensor observation transformers
(/root/reference/bevbert_ce/habitat_extensions/obs_transformers.py:19-264):
CenterCropperPerSensor, ResizerPerSensor (torch interpolate mode="area") and
CubeMap2Equirect (habitat_baselines ProjectionConverter grid_sample). The
resize is pinned bit-for-bit against torch on CPU; the projector is pinned
against an analytic panorama rendered onto the six faces with the same
camera model (habitat itself is not importable here).
"""

import numpy as np
import pytest

from vln_bevbert_tpu.ce.obs_transforms import (
    CUBE_FACE_ORDER,
    CubeMap2Equirect,
    cube_face_directions,
    resize,
)


@pytest.mark.parametrize(
    "in_hw,out_hw",
    [((256, 256), (224, 224)),   # CLIP crop-scale downsize
     ((480, 640), (256, 256)),   # depth sensor resize, non-square
     ((120, 160), (224, 224)),   # upsample
     ((224, 224), (97, 131))],   # awkward non-divisible ratio
)
def test_area_resize_matches_torch(in_hw, out_hw):
    import torch
    import torch.nn.functional as F

    rng = np.random.default_rng(0)
    img = rng.integers(0, 256, size=(2, *in_hw, 3), dtype=np.uint8)
    ours = resize(img, out_hw)
    ref = (
        F.interpolate(
            torch.from_numpy(img).permute(0, 3, 1, 2).float(),
            size=out_hw, mode="area",
        )
        .to(dtype=torch.uint8)
        .permute(0, 2, 3, 1)
        .numpy()
    )
    assert ours.shape == ref.shape == (2, *out_hw, 3)
    assert ours.dtype == np.uint8
    # one f64 division over exact integer block sums reproduces torch's
    # truncation bit-for-bit (see obs_transforms._area_sum_axis)
    np.testing.assert_array_equal(ours, ref)


def test_area_resize_float_depth_matches_torch():
    import torch
    import torch.nn.functional as F

    rng = np.random.default_rng(1)
    depth = rng.random((1, 256, 256, 1), dtype=np.float32) * 10.0
    ours = resize(depth, (128, 128))
    ref = (
        F.interpolate(
            torch.from_numpy(depth).permute(0, 3, 1, 2), size=(128, 128),
            mode="area",
        )
        .permute(0, 2, 3, 1)
        .numpy()
    )
    np.testing.assert_allclose(ours, ref, rtol=1e-6, atol=1e-6)


def _analytic_pano(d: np.ndarray) -> np.ndarray:
    """Smooth RGB function of a unit direction (world frame)."""
    return np.stack(
        [0.5 + 0.5 * d[..., 0], 0.5 + 0.5 * d[..., 1], 0.5 + 0.5 * d[..., 2]],
        axis=-1,
    ).astype(np.float32)


def _render_faces(fhw=64):
    return {
        f"rgb_{face}": _analytic_pano(cube_face_directions(face, fhw))
        for face in CUBE_FACE_ORDER
    }


def test_cubemap2equirect_reconstructs_analytic_pano():
    """Render a smooth direction-keyed panorama onto the 6 faces with the
    SAME camera model, stitch, and compare against evaluating the function
    directly on the equirect directions: every output pixel must agree to
    bilinear-interpolation error."""
    eh, ew = 64, 128
    obs = _render_faces(64)
    uuids = [f"rgb_{f}" for f in CUBE_FACE_ORDER]
    tf = CubeMap2Equirect(uuids, (eh, ew))
    out = tf(dict(obs))
    assert set(out) == {uuids[0]}
    pano = out[uuids[0]]
    assert pano.shape == (eh, ew, 3)

    lon = ((np.arange(ew) + 0.5) / ew * 2.0 - 1.0) * np.pi
    lat = (0.5 - (np.arange(eh) + 0.5) / eh) * np.pi
    d = np.stack(
        [np.cos(lat)[:, None] * np.sin(lon)[None, :],
         np.broadcast_to(np.sin(lat)[:, None], (eh, ew)),
         -np.cos(lat)[:, None] * np.cos(lon)[None, :]], axis=-1,
    )
    expected = _analytic_pano(d)
    err = np.abs(pano - expected)
    assert err.max() < 0.06, err.max()  # face-seam bilinear error bound
    assert err.mean() < 0.01


def test_cubemap2equirect_face_placement():
    """Constant-colour faces land in the right equirect regions: centre pixel
    = front, column at longitude pi = back, top row = up, bottom row = down,
    and the quarter/three-quarter columns = left/right."""
    eh, ew = 64, 128
    colors = {f: np.full((32, 32, 3), 40.0 * i + 10.0, np.float32)
              for i, f in enumerate(CUBE_FACE_ORDER)}
    uuids = [f"rgb_{f}" for f in CUBE_FACE_ORDER]
    tf = CubeMap2Equirect(uuids, (eh, ew), target_uuids=["pano"])
    out = tf({f"rgb_{f}": colors[f] for f in CUBE_FACE_ORDER})
    pano = out["pano"]
    mid = eh // 2

    def face_of(px):
        return CUBE_FACE_ORDER[int(round((px[0] - 10.0) / 40.0))]

    assert face_of(pano[mid, ew // 2]) == "front"
    assert face_of(pano[mid, 0]) == "back"
    assert face_of(pano[mid, ew // 4]) == "left"
    assert face_of(pano[mid, 3 * ew // 4]) == "right"
    assert face_of(pano[0, ew // 2]) == "up"
    assert face_of(pano[eh - 1, ew // 2]) == "down"


def test_cubemap2equirect_depth_nearest():
    """Depth sensors must stitch with nearest sampling (no cross-face value
    blending) and keep a channel-less (H, W) layout if given one."""
    uuids = [f"depth_{f}" for f in CUBE_FACE_ORDER]
    obs = {u: np.full((16, 16), float(i), np.float32)
           for i, u in enumerate(uuids)}
    tf = CubeMap2Equirect(uuids, (32, 64), depth_key="depth")
    out = tf(obs)
    pano = out[uuids[0]]
    assert pano.shape == (32, 64)
    # nearest sampling from {0..5}-valued faces can only emit those values
    assert set(np.unique(pano)).issubset(set(float(i) for i in range(6)))
