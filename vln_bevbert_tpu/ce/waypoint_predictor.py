"""Waypoint predictor for continuous environments (flax).

Re-design of the reference's frozen BinaryDistPredictor_TRM
(/root/reference/bevbert_ce/vlnce_baselines/waypoint_pred/TRM_net.py:9-90):
12 per-view depth encodings (128x4x4 DDPPO features) -> 768-d tokens ->
2 self-attention layers restricted to each view's +-1 ring neighbours ->
per-view logits reshaped to a 120-angle x 12-distance heatmap, rolled by the
HEATMAP_OFFSET so angle 0 is the agent's heading.

The NMS peak extraction (waypoint_pred/utils.py:37-64) is vectorised in
numpy: iterative max + circular-x rectangular suppression.
"""

from __future__ import annotations

import math
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..configs import ModelConfig
from ..models.bert import BertLayer, dense, layer_norm

NUM_ANGLES = 120
NUM_IMGS = 12
NUM_CLASSES = 12   # distance bins
HEATMAP_OFFSET = 5
TRM_NEIGHBOR = 1


def ring_neighbor_bias(num_imgs: int = NUM_IMGS,
                       neighbor: int = TRM_NEIGHBOR) -> np.ndarray:
    """(1, 1, V, V) additive bias: 0 within +-neighbor on the circular ring,
    -10000 elsewhere (ref utils.get_attention_mask)."""
    ok = np.zeros((num_imgs, num_imgs), bool)
    for i in range(num_imgs):
        for d in range(-neighbor, neighbor + 1):
            ok[i, (i + d) % num_imgs] = True
    return np.where(ok, 0.0, -10000.0)[None, None].astype(np.float32)


class WaypointPredictor(nn.Module):
    """depth_fts: (B*V, 128, 4, 4) -> heatmap logits (B, NUM_ANGLES, NUM_CLASSES)."""

    cfg: ModelConfig
    depth_feat_size: int = 128 * 4 * 4

    @nn.compact
    def __call__(self, depth_fts: jnp.ndarray, *, deterministic: bool = True):
        cfg = self.cfg
        bv = depth_fts.shape[0]
        b = bv // NUM_IMGS
        x = depth_fts.reshape(bv, -1)
        x = nn.relu(dense(cfg, cfg.hidden_size, name="depth_fc")(x))
        x = x.reshape(b, NUM_IMGS, cfg.hidden_size)
        x = layer_norm(cfg, name="merge_ln")(x).astype(x.dtype)

        bias = jnp.asarray(ring_neighbor_bias())
        for i in range(2):
            x = BertLayer(cfg, name=f"trm_layer_{i}")(
                x, bias, deterministic=deterministic
            )

        per_view = NUM_CLASSES * (NUM_ANGLES // NUM_IMGS)
        y = dense(cfg, cfg.hidden_size, name="cls_fc1")(x)
        y = nn.relu(y)
        y = dense(cfg, per_view, name="cls_fc2")(y)
        y = y.reshape(b, NUM_ANGLES, NUM_CLASSES).astype(jnp.float32)
        # each camera points at the centre of its angular sector
        return jnp.roll(y, -HEATMAP_OFFSET, axis=1)


def nms_peaks(heatmap: np.ndarray, max_predictions: int = 10,
              sigma: Tuple[float, float] = (4.0, 2.0)) -> np.ndarray:
    """Iterative non-max suppression over (B, A, D) heatmaps with circular
    angle axis; returns the suppressed map with only peak values kept
    (ref utils.nms, waypoint_pred/utils.py:37-64; their layout is
    (B, 1, D, A) — ours keeps (B, A, D))."""
    b, A, D = heatmap.shape
    out = np.zeros_like(heatmap)
    supp = heatmap.copy()
    ang_idx = np.arange(A)
    for _ in range(max_predictions):
        flat = supp.reshape(b, -1)
        ix = flat.argmax(axis=1)
        ai, di = ix // D, ix % D
        out[np.arange(b), ai, di] = heatmap[np.arange(b), ai, di]
        # rectangular suppression, circular in angle
        for k in range(b):
            da = np.abs(ang_idx - ai[k])
            da = np.minimum(da, A - da)
            amask = da <= sigma[0]
            dmask = np.abs(np.arange(D) - di[k]) <= sigma[1]
            supp[k][np.ix_(amask, dmask)] = -np.inf
    out[out < 0] = 0
    return out


def extract_waypoints(heatmap_logits: np.ndarray, max_predictions: int = 10,
                      max_candidates: int = 5):
    """Heatmap -> per-sample candidate (angles, distances, scores).

    Angles are clockwise offsets from the agent heading (bin a -> a*3deg);
    distance bin d -> 0.25 + d*0.25 metres (habitat waypoint convention).
    Returns lists of arrays per batch element.
    """
    b = heatmap_logits.shape[0]
    prob = np.exp(heatmap_logits - heatmap_logits.max(axis=(1, 2), keepdims=True))
    prob /= prob.sum(axis=(1, 2), keepdims=True)
    peaks = nms_peaks(prob, max_predictions=max_predictions)
    angles, dists, scores = [], [], []
    for k in range(b):
        ai, di = np.nonzero(peaks[k])
        sc = peaks[k][ai, di]
        order = np.argsort(-sc)[:max_candidates]
        ai, di, sc = ai[order], di[order], sc[order]
        angles.append(ai * (2.0 * math.pi / NUM_ANGLES))
        dists.append(0.25 + di * 0.25)
        scores.append(sc)
    return angles, dists, scores
