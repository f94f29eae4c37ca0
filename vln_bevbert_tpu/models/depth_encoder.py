"""DDPPO depth encoder (flax): GroupNorm ResNet-50 + compression head.

Architectural port of the frozen depth tower the reference loads from a
DDPPO point-nav checkpoint (/root/reference/bevbert_ce/vlnce_baselines/models/
encoders/resnet_encoders.py:13-108, wrapping habitat-baselines' ddppo resnet:
baseplanes 32, GroupNorm(ngroups=baseplanes/2), bottleneck [3,4,6,3], then a
3x3 compression conv so the flattened output is 2048-d — the (128, 4, 4)
``depth_features`` consumed by the waypoint predictor and the CE pano depth
embedding). In this framework those features normally arrive precomputed
through ContinuousEnv observations; this module exists so a TPU deployment
can produce them from raw depth frames.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn


class Bottleneck(nn.Module):
    planes: int
    stride: int = 1
    ngroups: int = 16
    expansion: int = 4

    @nn.compact
    def __call__(self, x):
        out_ch = self.planes * self.expansion
        y = nn.Conv(self.planes, (1, 1), use_bias=False, name="conv1")(x)
        y = nn.GroupNorm(num_groups=min(self.ngroups, self.planes), name="gn1")(y)
        y = nn.relu(y)
        y = nn.Conv(
            self.planes, (3, 3), strides=(self.stride, self.stride),
            use_bias=False, name="conv2",
        )(y)
        y = nn.GroupNorm(num_groups=min(self.ngroups, self.planes), name="gn2")(y)
        y = nn.relu(y)
        y = nn.Conv(out_ch, (1, 1), use_bias=False, name="conv3")(y)
        y = nn.GroupNorm(num_groups=min(self.ngroups, out_ch), name="gn3")(y)
        if x.shape[-1] != out_ch or self.stride != 1:
            x = nn.Conv(
                out_ch, (1, 1), strides=(self.stride, self.stride),
                use_bias=False, name="down_conv",
            )(x)
            x = nn.GroupNorm(num_groups=min(self.ngroups, out_ch), name="down_gn")(x)
        return nn.relu(x + y)


class DdppoDepthEncoder(nn.Module):
    """(B, H, W, 1) depth -> (B, fh, fw, channels) spatial features
    (default (4, 4, 128): flattened 2048-d, the reference layout)."""

    baseplanes: int = 32
    layers: Sequence[int] = (3, 4, 6, 3)
    final_channels: int = 128
    final_spatial: int = 4

    @nn.compact
    def __call__(self, depth: jnp.ndarray) -> jnp.ndarray:
        ngroups = self.baseplanes // 2
        x = nn.Conv(
            self.baseplanes, (7, 7), strides=(2, 2), use_bias=False, name="stem",
        )(depth)
        x = nn.GroupNorm(num_groups=ngroups, name="stem_gn")(x)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding="SAME")
        planes = self.baseplanes
        for stage, blocks in enumerate(self.layers):
            for b in range(blocks):
                stride = 2 if (b == 0 and stage > 0) else 1
                x = Bottleneck(
                    planes, stride=stride, ngroups=ngroups,
                    name=f"stage{stage}_block{b}",
                )(x)
            planes *= 2
        # compression head to the (final_spatial, final_spatial,
        # final_channels) layout (habitat ResNetEncoder's 3x3 compression)
        h = x.shape[1]
        stride = max(h // self.final_spatial, 1)
        x = nn.Conv(
            self.final_channels, (3, 3), strides=(stride, stride),
            use_bias=False, name="compress",
        )(x)
        x = nn.GroupNorm(
            num_groups=min(ngroups, self.final_channels), name="compress_gn"
        )(x)
        return nn.relu(x)
