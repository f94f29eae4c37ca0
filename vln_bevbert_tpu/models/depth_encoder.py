"""DDPPO depth encoder (flax): GroupNorm ResNet-50 + compression head.

Faithful port of the frozen depth tower the reference loads from a DDPPO
point-nav checkpoint (/root/reference/bevbert_ce/vlnce_baselines/models/
encoders/resnet_encoders.py:13-108, wrapping habitat-baselines' ddppo
ResNetEncoder): input avg-pool /2, 7x7/2 stem, GroupNorm(ngroups =
baseplanes/2 = 16) everywhere, bottleneck stages [3,4,6,3] with planes
32/64/128/256 (expansion 4 -> 1024 final), then a 3x3 stride-1 compression
conv with GroupNorm(1) sized so the flattened output is 2048-d — for the
256x256 VLN-CE depth sensor that is the (4, 4, 128) ``depth_features``
consumed by the waypoint predictor and the CE pano depth embedding. All
convolutions use torch-style symmetric padding so remapped checkpoints are
numerically exact (parity vs a torch replica: tests/test_frozen_remap.py).

``load_ddppo_ckpt`` performs the reference's key surgery
(resnet_encoders.py:39-50: take ``actor_critic.net.visual_encoder.*``) onto
this module's param tree.

In this framework the features normally arrive precomputed through
ContinuousEnv observations; this module exists so a TPU deployment can
produce them from raw depth frames.
"""

from __future__ import annotations

from typing import Any, Dict, Sequence

import jax.numpy as jnp
import numpy as np
from flax import linen as nn

_P1 = ((1, 1), (1, 1))


def _gn(ngroups: int, name: str) -> nn.GroupNorm:
    # torch GroupNorm eps (habitat uses the default 1e-5)
    return nn.GroupNorm(num_groups=ngroups, epsilon=1e-5, name=name)


class Bottleneck(nn.Module):
    """habitat-baselines ddppo resnet Bottleneck: 1x1 -> 3x3(stride) -> 1x1
    with GroupNorm after each conv, residual downsample when shapes change."""

    planes: int
    stride: int = 1
    ngroups: int = 16
    expansion: int = 4

    @nn.compact
    def __call__(self, x):
        out_ch = self.planes * self.expansion
        y = nn.Conv(self.planes, (1, 1), use_bias=False, name="conv_0")(x)
        y = nn.relu(_gn(self.ngroups, "gn_1")(y))
        y = nn.Conv(self.planes, (3, 3), strides=(self.stride, self.stride),
                    padding=_P1, use_bias=False, name="conv_3")(y)
        y = nn.relu(_gn(self.ngroups, "gn_4")(y))
        y = nn.Conv(out_ch, (1, 1), use_bias=False, name="conv_6")(y)
        y = _gn(self.ngroups, "gn_7")(y)
        if x.shape[-1] != out_ch or self.stride != 1:
            x = nn.Conv(out_ch, (1, 1), strides=(self.stride, self.stride),
                        use_bias=False, name="ds_conv")(x)
            x = _gn(self.ngroups, "ds_gn")(x)
        return nn.relu(x + y)


class DdppoDepthEncoder(nn.Module):
    """(B, H, W, 1) depth in [0, 1] -> (B, H/64, W/64, C) spatial features
    ((4, 4, 128) for the reference's 256x256 depth frames)."""

    baseplanes: int = 32
    layers: Sequence[int] = (3, 4, 6, 3)
    after_compression_flat_size: int = 2048

    @nn.compact
    def __call__(self, depth: jnp.ndarray) -> jnp.ndarray:
        ngroups = self.baseplanes // 2
        # ResNetEncoder.forward starts with F.avg_pool2d(x, 2)
        x = nn.avg_pool(depth, (2, 2), strides=(2, 2))
        x = nn.Conv(self.baseplanes, (7, 7), strides=(2, 2),
                    padding=((3, 3), (3, 3)), use_bias=False, name="conv1")(x)
        x = nn.relu(_gn(ngroups, "bn1")(x))
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=_P1)
        planes = self.baseplanes
        for stage, blocks in enumerate(self.layers):
            for b in range(blocks):
                stride = 2 if (b == 0 and stage > 0) else 1
                x = Bottleneck(planes, stride=stride, ngroups=ngroups,
                               name=f"layer{stage + 1}_{b}")(x)
            if stage < len(self.layers) - 1:
                planes *= 2
        # compression: 3x3 stride-1 conv sized so flat output is 2048
        spatial = x.shape[1]
        channels = int(round(self.after_compression_flat_size / (spatial ** 2)))
        x = nn.Conv(channels, (3, 3), padding=_P1, use_bias=False,
                    name="compression_conv")(x)
        x = _gn(1, "compression_gn")(x)
        return nn.relu(x)


def load_ddppo_ckpt(ckpt: Dict[str, Any],
                    layers: Sequence[int] = (3, 4, 6, 3)) -> Dict[str, Any]:
    """DDPPO point-nav checkpoint -> DdppoDepthEncoder param tree.

    Accepts either the raw torch checkpoint dict (with a ``state_dict``
    entry whose keys start ``actor_critic.net.visual_encoder.``, the layout
    the reference surgically strips at resnet_encoders.py:39-50) or an
    already-stripped ``{backbone.*, compression.*}`` dict.
    """
    sd_in = ckpt.get("state_dict", ckpt) if isinstance(ckpt, dict) else ckpt
    sd: Dict[str, np.ndarray] = {}
    for k, v in sd_in.items():
        parts = k.split(".")
        if "visual_encoder" in parts:
            parts = parts[parts.index("visual_encoder") + 1:]
        sd[".".join(parts)] = np.asarray(v)

    def conv(prefix):
        # torch (O, I, kH, kW) -> flax (kH, kW, I, O)
        return {"kernel": sd[f"{prefix}.weight"].transpose(2, 3, 1, 0)}

    def gn(prefix):
        return {"scale": sd[f"{prefix}.weight"], "bias": sd[f"{prefix}.bias"]}

    tree: Dict[str, Any] = {
        "conv1": conv("backbone.conv1"),
        "bn1": gn("backbone.bn1"),
        "compression_conv": conv("compression.0"),
        "compression_gn": gn("compression.1"),
    }
    for stage, blocks in enumerate(layers):
        for b in range(blocks):
            p = f"backbone.layer{stage + 1}.{b}"
            node = {
                "conv_0": conv(f"{p}.convs.0"),
                "gn_1": gn(f"{p}.convs.1"),
                "conv_3": conv(f"{p}.convs.3"),
                "gn_4": gn(f"{p}.convs.4"),
                "conv_6": conv(f"{p}.convs.6"),
                "gn_7": gn(f"{p}.convs.7"),
            }
            if f"{p}.downsample.0.weight" in sd:
                node["ds_conv"] = conv(f"{p}.downsample.0")
                node["ds_gn"] = gn(f"{p}.downsample.1")
            tree[f"layer{stage + 1}_{b}"] = node
    return tree
