"""Frozen-weight loading for the real CE stack.

The reference trainer loads three frozen towers at init: the transformer
waypoint predictor checkpoint (torch.load(...)['predictor']['state_dict'],
/root/reference/bevbert_ce/vlnce_baselines/ss_trainer_BEV.py:236-243), the
DDPPO point-nav depth ResNet50 (resnet_encoders.py:39-50) and CLIP-B/16
(Policy_ViewSelection_BEV.py:36-341). This module turns checkpoint *files*
(torch-layout .pt/.pth, .npz flat trees, or orbax directories) into the
framework's flax param trees via the parity-pinned remappers
(ce.waypoint_predictor.load_waypoint_ckpt, models.depth_encoder.
load_ddppo_ckpt, models.clip.hf_clip_to_tree), so cli/ce_train.py can wire
the published weights without the user writing Python.

Torch-layout dicts are detected by their key namespaces; already-remapped
flax trees (e.g. an orbax save of a previous remap) pass through unchanged.
"""

from __future__ import annotations

import os
from typing import Any, Dict

import numpy as np


def _unflatten(flat: Dict[str, Any]) -> Dict[str, Any]:
    """'a.b.c' -> nested, for .npz flat trees. Torch-layout keys also use
    dots, but those are detected and remapped BEFORE unflattening."""
    tree: Dict[str, Any] = {}
    for k, v in flat.items():
        node = tree
        parts = k.split("/") if "/" in k else k.split(".")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = np.asarray(v)
    return tree


def load_ckpt_file(path: str) -> Dict[str, Any]:
    """Read a checkpoint file into a flat-or-nested dict of numpy arrays.

    - directory        -> orbax StandardCheckpointer restore
    - ``.npz``         -> dict of arrays (keys may be '/'- or '.'-separated)
    - anything else    -> torch.load(map_location='cpu') (the reference's
                          format for all three frozen ckpts)
    """
    if os.path.isdir(path):
        import orbax.checkpoint as ocp

        with ocp.StandardCheckpointer() as ckptr:
            return ckptr.restore(os.path.abspath(path))
    if path.endswith(".npz"):
        with np.load(path, allow_pickle=False) as z:
            return {k: z[k] for k in z.files}
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=False)

    def to_np(x):
        if isinstance(x, dict):
            return {k: to_np(v) for k, v in x.items()}
        if hasattr(x, "detach"):
            return x.detach().cpu().numpy()
        return x

    return to_np(obj)


def _keys(d: Dict[str, Any]):
    return list(d.keys())


def load_waypoint_params(path: str) -> Dict[str, Any]:
    """Waypoint-predictor checkpoint file -> WaypointPredictor param tree.

    Accepts the reference's published format (torch.load(...)['predictor']
    ['state_dict'], ss_trainer_BEV.py:239), a bare torch state dict, or an
    already-remapped flax tree (orbax dir / npz).
    """
    obj = load_ckpt_file(path)
    if isinstance(obj, dict) and "predictor" in obj:
        obj = obj["predictor"]
    if isinstance(obj, dict) and "state_dict" in obj:
        obj = obj["state_dict"]
    ks = _keys(obj)
    if any("visual_fc_depth" in k or "waypoint_TRM" in k for k in ks):
        from .waypoint_predictor import load_waypoint_ckpt

        return load_waypoint_ckpt(obj)
    # flax layout (possibly flat from npz)
    if any("." in k or "/" in k for k in ks):
        obj = _unflatten(obj)
    assert "depth_fc" in obj, (
        f"unrecognised waypoint checkpoint layout: keys {ks[:8]}"
    )
    return obj


def load_depth_params(path: str) -> Dict[str, Any]:
    """DDPPO point-nav checkpoint file -> DdppoDepthEncoder param tree."""
    obj = load_ckpt_file(path)
    flatkeys = _keys(obj.get("state_dict", obj)) if isinstance(obj, dict) else []
    if any("visual_encoder" in k or k.startswith("backbone.") for k in flatkeys):
        from ..models.depth_encoder import load_ddppo_ckpt

        return load_ddppo_ckpt(obj)
    if any("." in k or "/" in k for k in _keys(obj)):
        obj = _unflatten(obj)
    assert "conv1" in obj, (
        f"unrecognised DDPPO checkpoint layout: keys {_keys(obj)[:8]}"
    )
    return obj


def load_clip_params(path: str) -> Dict[str, Any]:
    """CLIP vision checkpoint -> ClipVisionTower param tree.

    ``path`` may be a torch state-dict file (HF CLIPVisionModel layout), an
    orbax/npz flax tree, or a HuggingFace model directory/name (loaded via
    transformers, like JaxClipEncoder.from_hf).
    """
    if os.path.isfile(path) or (
        os.path.isdir(path)
        and not os.path.exists(os.path.join(path, "config.json"))
    ):
        obj = load_ckpt_file(path)
        ks = _keys(obj)
        if any("vision_model" in k or "embeddings.patch_embedding" in k
               for k in ks):
            from ..models.clip import hf_clip_to_tree

            return hf_clip_to_tree(obj)
        if any("." in k or "/" in k for k in ks):
            obj = _unflatten(obj)
        assert "patch_embedding" in obj, (
            f"unrecognised CLIP checkpoint layout: keys {ks[:8]}"
        )
        return obj
    # HF model directory or hub name
    from transformers import CLIPVisionModel

    from ..models.clip import hf_clip_to_tree

    hf = CLIPVisionModel.from_pretrained(path)
    return hf_clip_to_tree(
        {k: v.detach().numpy() for k, v in hf.state_dict().items()}
    )


class JaxDepthEncoder:
    """Frozen DDPPO depth tower as a callable for the habitat binding:
    raw depth frames ``(V, H, W[, 1])`` -> spatially mean-pooled features
    ``(V, C)`` (the reference pools the (V, 4, 4, 128) encoder output,
    resnet_encoders.py:107)."""

    def __init__(self, params, **enc_kwargs):
        import jax
        import jax.numpy as jnp

        from ..models.depth_encoder import DdppoDepthEncoder

        enc = DdppoDepthEncoder(**enc_kwargs)
        self.params = params
        self._fwd = jax.jit(
            lambda p, d: jnp.mean(enc.apply({"params": p}, d), axis=(1, 2))
        )

    def __call__(self, depth: np.ndarray) -> np.ndarray:
        d = np.asarray(depth, np.float32)
        if d.ndim == 3:
            d = d[..., None]
        return np.asarray(self._fwd(self.params, d))
