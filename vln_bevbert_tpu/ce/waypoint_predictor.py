"""Waypoint predictor for continuous environments (flax).

Re-design of the reference's frozen BinaryDistPredictor_TRM
(/root/reference/bevbert_ce/vlnce_baselines/waypoint_pred/TRM_net.py:9-90):
12 per-view depth encodings (128x4x4 DDPPO features) -> 768-d tokens ->
2 self-attention layers restricted to each view's +-1 ring neighbours ->
per-view logits reshaped to a 120-angle x 12-distance heatmap, rolled by the
HEATMAP_OFFSET so angle 0 is the agent's heading. Note the reference's
``mergefeats_LayerNorm`` is constructed but never applied in forward
(TRM_net.py:63-90) — we mirror that (no LayerNorm between the depth fc and
the transformer).

The NMS peak extraction mirrors waypoint_pred/utils.py:36-64 exactly
(including its asymmetric circular suppression over the *distance* axis and
the +-1 angle wrap padding applied by the caller,
Policy_ViewSelection_BEV.py:216-228), and ``sample_waypoints`` is the
reference's train-time regional-heatmap sampling augmentation
(Policy_ViewSelection_BEV.py:233-263).

``load_waypoint_ckpt`` remaps the published torch checkpoint
(``torch.load(p)['predictor']['state_dict']``, ss_trainer_BEV.py:238) onto
this module's param tree; parity vs a torch replica is pinned in
tests/test_frozen_remap.py.
"""

from __future__ import annotations

import math
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..configs import ModelConfig
from ..models.bert import BertLayer, dense

NUM_ANGLES = 120
NUM_IMGS = 12
NUM_CLASSES = 12   # distance bins
HEATMAP_OFFSET = 5
TRM_NEIGHBOR = 1


def ring_neighbor_bias(num_imgs: int = NUM_IMGS,
                       neighbor: int = TRM_NEIGHBOR) -> np.ndarray:
    """(1, 1, V, V) additive bias: 0 within +-neighbor on the circular ring,
    -10000 elsewhere (ref utils.get_attention_mask, applied as
    (1-mask)*-10000 in waypoint_bert.py BertImgModel.forward)."""
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


def load_waypoint_ckpt(state_dict: Dict[str, Any]) -> Dict[str, Any]:
    """Torch BinaryDistPredictor_TRM state dict -> WaypointPredictor params.

    Checkpoint layout (TRM_net.py:27-60): visual_fc_depth.1 (Linear after
    Flatten), waypoint_TRM.bert.encoder.layer.{0,1} (pytorch_transformers
    post-norm BERT layers), vis_classifier.{0,2}; unused rgb-branch params
    (visual_fc_rgb, visual_merge, mergefeats_LayerNorm) are dropped.
    """
    sd = {}
    for k, v in state_dict.items():
        if k.startswith("module."):
            k = k[len("module."):]
        sd[k] = np.asarray(v)

    def lin(prefix):
        return {"kernel": sd[f"{prefix}.weight"].T, "bias": sd[f"{prefix}.bias"]}

    def ln(prefix):
        return {"scale": sd[f"{prefix}.weight"], "bias": sd[f"{prefix}.bias"]}

    tree: Dict[str, Any] = {
        "depth_fc": lin("visual_fc_depth.1"),
        "cls_fc1": lin("vis_classifier.0"),
        "cls_fc2": lin("vis_classifier.2"),
    }
    for i in range(2):
        p = f"waypoint_TRM.bert.encoder.layer.{i}"
        q, k, v = (lin(f"{p}.attention.self.{n}") for n in ("query", "key", "value"))
        tree[f"trm_layer_{i}"] = {
            "attn": {
                "att": {"qkv": {
                    "kernel": np.concatenate(
                        [q["kernel"], k["kernel"], v["kernel"]], axis=1),
                    "bias": np.concatenate([q["bias"], k["bias"], v["bias"]]),
                }},
                "out_dense": lin(f"{p}.attention.output.dense"),
                "out_ln": ln(f"{p}.attention.output.LayerNorm"),
            },
            "ffn": {
                "inter": lin(f"{p}.intermediate.dense"),
                "out_dense": lin(f"{p}.output.dense"),
                "out_ln": ln(f"{p}.output.LayerNorm"),
            },
        }
    return tree


def _suppression_mask(ai: np.ndarray, di: np.ndarray, n_ang: int, n_dist: int,
                      sigma: Tuple[float, float]) -> np.ndarray:
    """(B, n_ang, n_dist) rectangle masks around each (ai, di) peak —
    the ref's ``neighborhoods`` with circular_x on the distance axis
    (utils.py:7-33; their x = ix % width = distance bin). The circularity is
    asymmetric there: min(|dx|, |dx + range|), mirrored verbatim. The angle
    center is FRACTIONAL: the ref computes y = ix / shape[-1] with torch
    true division (utils.py:54), i.e. ai + di/n_dist, so for distance bin
    d > 0 the suppressed angle rows are [ai - sigma + d/n_dist ... ai +
    sigma + d/n_dist] rounded inward — mirrored exactly."""
    dx = np.arange(n_dist)[None, None, :] - di[:, None, None].astype(np.float64)
    dx = np.minimum(np.abs(dx), np.abs(dx + n_dist))
    y_mu = ai[:, None, None] + di[:, None, None] / float(n_dist)
    dy = np.abs(np.arange(n_ang)[None, :, None] - y_mu)
    return ((dx <= sigma[0]) & (dy <= sigma[1])).astype(np.float64)


def nms_peaks(pred: np.ndarray, max_predictions: int = 5,
              sigma: Tuple[float, float] = (7.0, 5.0)) -> np.ndarray:
    """Iterative NMS over (B, A, D) maps, the ref's utils.nms (utils.py:36-64):
    keep the global max, multiply the working map by (1 - rectangle), repeat;
    sigma = (distance halfwidth, angle halfwidth). Returns the map with only
    peak values kept."""
    b, A, D = pred.shape
    out = np.zeros_like(pred)
    supp = pred.astype(np.float64).copy()
    rows = np.arange(b)
    for _ in range(max_predictions):
        flat = supp.reshape(b, -1)
        ix = flat.argmax(axis=1)
        ai, di = ix // D, ix % D
        out[rows, ai, di] = pred[rows, ai, di]
        supp *= 1.0 - _suppression_mask(ai, di, A, D, sigma)
    out[out < 0] = 0
    return out


def heatmap_to_peaks(heatmap_logits: np.ndarray,
                     max_predictions: int = 5) -> np.ndarray:
    """Softmax over the whole map, wrap-pad the angle axis by one row each
    side, NMS, un-pad (ref Policy_ViewSelection_BEV.py:213-231). Returns the
    (B, A, D) peak map."""
    b, A, D = heatmap_logits.shape
    flat = heatmap_logits.reshape(b, -1)
    prob = np.exp(flat - flat.max(axis=1, keepdims=True))
    prob /= prob.sum(axis=1, keepdims=True)
    prob = prob.reshape(b, A, D)
    wrapped = np.concatenate([prob[:, -1:], prob, prob[:, :1]], axis=1)
    return nms_peaks(wrapped, max_predictions=max_predictions)[:, 1:-1, :]


def sample_waypoints(heatmap_logits: np.ndarray, peak_map: np.ndarray,
                     rng: np.random.Generator):
    """Train-time waypoint augmentation (ref Policy_ViewSelection_BEV.py:
    233-263): for each NMS peak, sample an (angle, distance) cell from the
    softmax over its camera's 10x12 heatmap region instead of the peak
    itself. Returns per-sample (angle_idxes, distance_idxes) lists."""
    b = heatmap_logits.shape[0]
    # undo the HEATMAP_OFFSET roll so regions align with cameras
    regional = np.roll(heatmap_logits, HEATMAP_OFFSET, axis=1)
    regional = regional.reshape(b, NUM_IMGS, (NUM_ANGLES // NUM_IMGS) * NUM_CLASSES)
    angle_idxes, distance_idxes = [], []
    for j in range(b):
        ai = np.nonzero(peak_map[j])[0]
        img_idxes = (ai + 5) // 10
        img_idxes[img_idxes == NUM_IMGS] = 0
        sa, sd = [], []
        for img in img_idxes:
            logits = regional[j, img]
            p = np.exp(logits - logits.max())
            p /= p.sum()
            act = int(rng.choice(len(p), p=p))
            pointer = (img - 1) * 10 + 5 if img != 0 else 0
            sa.append(act // NUM_CLASSES + pointer)
            sd.append(act % NUM_CLASSES)
        angle_idxes.append(np.asarray(sa, np.int64))
        distance_idxes.append(np.asarray(sd, np.int64))
    return angle_idxes, distance_idxes


def extract_waypoints(heatmap_logits: np.ndarray, max_predictions: int = 5,
                      max_candidates: int = 5, in_train: bool = False,
                      rng: np.random.Generator = None):
    """Heatmap -> per-sample candidate (angles, distances, scores).

    Angles are clockwise offsets from the agent heading (bin a -> a*3deg);
    distance bin d -> (d+1)*0.25 metres. Candidates come back in angle order
    (the ref iterates output_map.nonzero()); train mode replaces each peak
    with a regional sample (waypoint augmentation).
    """
    b = heatmap_logits.shape[0]
    peaks = heatmap_to_peaks(heatmap_logits, max_predictions=max_predictions)
    if in_train:
        assert rng is not None
        ang_lists, dist_lists = sample_waypoints(heatmap_logits, peaks, rng)
    else:
        ang_lists = [np.nonzero(peaks[k])[0] for k in range(b)]
        dist_lists = [np.nonzero(peaks[k])[1] for k in range(b)]
    angles, dists, scores = [], [], []
    for k in range(b):
        ai, di = ang_lists[k][:max_candidates], dist_lists[k][:max_candidates]
        angles.append(ai * (2.0 * math.pi / NUM_ANGLES))
        dists.append((di + 1) * 0.25)
        scores.append(peaks[k][ai % NUM_ANGLES, di])
    return angles, dists, scores
