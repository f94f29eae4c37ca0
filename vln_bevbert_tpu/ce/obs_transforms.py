"""Per-sensor observation transforms for continuous-env frames.

Role of the reference's habitat ObservationTransformers
(/root/reference/bevbert_ce/habitat_extensions/obs_transformers.py:20-264:
CenterCropperPerSensor / ResizerPerSensor, configured per sensor key like
``rgb_0..rgb_11`` -> 224 crops for CLIP, depth -> 256). Here observations
are plain dicts of numpy arrays, so the transforms are pure functions; a
transform list applies in order like apply_obs_transforms_batch.
"""

from __future__ import annotations

from typing import Dict, List, Sequence, Tuple, Union

import numpy as np

Size = Union[int, Tuple[int, int]]


def _hw(size: Size) -> Tuple[int, int]:
    if isinstance(size, (int, np.integer)):
        return int(size), int(size)
    assert len(size) == 2
    return int(size[0]), int(size[1])


def center_crop(img: np.ndarray, size: Size) -> np.ndarray:
    """(..., H, W, C) center crop; pads symmetrically with zeros when the
    target exceeds the frame (matching torchvision's behaviour the reference
    relies on)."""
    th, tw = _hw(size)
    h, w = img.shape[-3], img.shape[-2]
    if th > h or tw > w:
        ph, pw = max(th - h, 0), max(tw - w, 0)
        pad = [(0, 0)] * (img.ndim - 3) + [
            (ph // 2, ph - ph // 2), (pw // 2, pw - pw // 2), (0, 0)]
        img = np.pad(img, pad)
        h, w = img.shape[-3], img.shape[-2]
    y0, x0 = (h - th) // 2, (w - tw) // 2
    return img[..., y0:y0 + th, x0:x0 + tw, :]


def resize(img: np.ndarray, size: Size) -> np.ndarray:
    """(..., H, W, C) area-ish resize via nearest sampling on a regular grid
    (sensor frames; no antialiasing requirements downstream — features are
    re-encoded by the frozen towers)."""
    th, tw = _hw(size)
    h, w = img.shape[-3], img.shape[-2]
    if (h, w) == (th, tw):
        return img
    ys = np.clip((np.arange(th) + 0.5) * h / th, 0, h - 1).astype(int)
    xs = np.clip((np.arange(tw) + 0.5) * w / tw, 0, w - 1).astype(int)
    return img[..., ys[:, None], xs[None, :], :]


class CenterCropperPerSensor:
    """sensor key -> crop size; keys absent from an observation are skipped
    (ref obs_transformers.py:20-98)."""

    def __init__(self, sensor_crops: Sequence[Tuple[str, Size]]):
        self.sensor_crops = {k: _hw(v) for k, v in sensor_crops}

    def __call__(self, obs: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
        for k, size in self.sensor_crops.items():
            if k in obs and obs[k].shape[-3:-1] != size:
                obs[k] = center_crop(obs[k], size)
        return obs


class ResizerPerSensor:
    """sensor key -> target size (ref obs_transformers.py:100-175)."""

    def __init__(self, sensor_resizes: Sequence[Tuple[str, Size]]):
        self.sensor_resizes = {k: _hw(v) for k, v in sensor_resizes}

    def __call__(self, obs: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
        for k, size in self.sensor_resizes.items():
            if k in obs and obs[k].shape[-3:-1] != size:
                obs[k] = resize(obs[k], size)
        return obs


def apply_obs_transforms(transforms: List, obs_batch: List[Dict]) -> List[Dict]:
    """Apply a transform pipeline to every observation in a batch
    (ref habitat_baselines apply_obs_transforms_batch)."""
    for transform in transforms:
        obs_batch = [transform(ob) for ob in obs_batch]
    return obs_batch
