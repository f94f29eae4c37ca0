"""Frozen-encoder weight remappers: torch-checkpoint -> flax parity.

Builds torch replicas with the exact state-dict layouts of the reference's
frozen towers — the CWP waypoint predictor (bevbert_ce/vlnce_baselines/
waypoint_pred/TRM_net.py:9-90, pytorch_transformers BERT layers == HF
layout) and habitat's DDPPO ResNetEncoder depth tower (resnet_encoders.py:
13-108) — then checks load_waypoint_ckpt / load_ddppo_ckpt reproduce the
torch forward numerically.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as nn  # noqa: E402

from vln_bevbert_tpu.ce.waypoint_predictor import (  # noqa: E402
    NUM_ANGLES,
    NUM_CLASSES,
    HEATMAP_OFFSET,
    WaypointPredictor,
    load_waypoint_ckpt,
    ring_neighbor_bias,
)
from vln_bevbert_tpu.configs import ModelConfig  # noqa: E402
from vln_bevbert_tpu.models.depth_encoder import (  # noqa: E402
    DdppoDepthEncoder,
    load_ddppo_ckpt,
)


# --------------------------------------------------------------- waypoint


class _TorchWaypoint(nn.Module):
    """BinaryDistPredictor_TRM's depth-only compute path with its checkpoint
    key layout (visual_fc_depth.1, waypoint_TRM.bert.encoder.layer.N.*,
    vis_classifier.{0,2}); HF BertLayer shares pytorch_transformers' naming."""

    def __init__(self, hidden=768, heads=12, intermediate=3072):
        super().__init__()
        from transformers import BertConfig
        from transformers.models.bert.modeling_bert import BertLayer

        self.visual_fc_depth = nn.Sequential(
            nn.Flatten(), nn.Linear(128 * 4 * 4, hidden), nn.ReLU(True)
        )
        cfg = BertConfig(
            hidden_size=hidden, num_attention_heads=heads,
            intermediate_size=intermediate,
            hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
            layer_norm_eps=1e-12, attn_implementation="eager",
        )
        encoder = nn.Module()
        encoder.layer = nn.ModuleList([BertLayer(cfg) for _ in range(2)])
        bert = nn.Module()
        bert.encoder = encoder
        self.waypoint_TRM = nn.Module()
        self.waypoint_TRM.bert = bert
        per_view = NUM_CLASSES * (NUM_ANGLES // 12)
        self.vis_classifier = nn.Sequential(
            nn.Linear(hidden, hidden), nn.ReLU(), nn.Linear(hidden, per_view)
        )

    def forward(self, depth_feats):
        b = depth_feats.size(0) // 12
        x = self.visual_fc_depth(depth_feats).reshape(b, 12, -1)
        # ref applies (1 - ring_mask) * -10000 (waypoint_bert.py BertImgModel)
        bias = torch.from_numpy(ring_neighbor_bias()).to(x.dtype)
        for layer in self.waypoint_TRM.bert.encoder.layer:
            x = layer(x, attention_mask=bias)[0]
        y = self.vis_classifier(x).reshape(b, NUM_ANGLES, NUM_CLASSES)
        return torch.cat(
            (y[:, HEATMAP_OFFSET:, :], y[:, :HEATMAP_OFFSET, :]), dim=1
        )


def test_waypoint_remap_parity():
    torch.manual_seed(0)
    tm = _TorchWaypoint().eval()
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    # the published ckpt carries unused rgb-branch params -> must be ignored
    sd["visual_merge.0.weight"] = np.zeros((768, 1536), np.float32)
    sd["mergefeats_LayerNorm.weight"] = np.ones(768, np.float32)
    sd["mergefeats_LayerNorm.bias"] = np.zeros(768, np.float32)
    params = load_waypoint_ckpt(sd)

    cfg = ModelConfig(dtype="float32")
    model = WaypointPredictor(cfg)
    depth = np.random.default_rng(1).normal(size=(12, 128, 4, 4)).astype(np.float32)
    ours = np.asarray(model.apply({"params": params}, depth))
    with torch.no_grad():
        theirs = tm(torch.from_numpy(depth)).numpy()
    np.testing.assert_allclose(ours, theirs, atol=2e-4)


def test_waypoint_remap_module_prefix():
    tm = _TorchWaypoint().eval()
    sd = {"module." + k: v.detach().numpy() for k, v in tm.state_dict().items()}
    params = load_waypoint_ckpt(sd)
    assert params["depth_fc"]["kernel"].shape == (2048, 768)


# ------------------------------------------------------------------ ddppo


class _TorchBottleneck(nn.Module):
    def __init__(self, in_ch, planes, ngroups, stride):
        super().__init__()
        out_ch = planes * 4
        self.convs = nn.Sequential(
            nn.Conv2d(in_ch, planes, 1, bias=False),
            nn.GroupNorm(ngroups, planes),
            nn.ReLU(True),
            nn.Conv2d(planes, planes, 3, stride, 1, bias=False),
            nn.GroupNorm(ngroups, planes),
            nn.ReLU(True),
            nn.Conv2d(planes, out_ch, 1, bias=False),
            nn.GroupNorm(ngroups, out_ch),
        )
        self.downsample = None
        if stride != 1 or in_ch != out_ch:
            self.downsample = nn.Sequential(
                nn.Conv2d(in_ch, out_ch, 1, stride, bias=False),
                nn.GroupNorm(ngroups, out_ch),
            )

    def forward(self, x):
        y = self.convs(x)
        if self.downsample is not None:
            x = self.downsample(x)
        return torch.relu_(y + x)


class _TorchResNetEncoder(nn.Module):
    """habitat-baselines ddppo ResNetEncoder (depth-only, no input norm)."""

    def __init__(self, baseplanes=8, layers=(1, 1), flat_size=64):
        super().__init__()
        ngroups = baseplanes // 2
        backbone = nn.Module()
        backbone.conv1 = nn.Conv2d(1, baseplanes, 7, 2, 3, bias=False)
        backbone.bn1 = nn.GroupNorm(ngroups, baseplanes)
        self._layers = layers
        in_ch, planes = baseplanes, baseplanes
        for stage, blocks in enumerate(layers):
            mods = []
            for b in range(blocks):
                stride = 2 if (b == 0 and stage > 0) else 1
                mods.append(_TorchBottleneck(in_ch, planes, ngroups, stride))
                in_ch = planes * 4
            setattr(backbone, f"layer{stage + 1}", nn.Sequential(*mods))
            if stage < len(layers) - 1:
                planes *= 2
        self.backbone = backbone
        self._spatial_div = 2 ** (2 + len(layers))  # avg2 * stem2 * pool2 * stage strides
        self._flat_size = flat_size
        self._compress_in = in_ch

    def build_compression(self, spatial):
        channels = int(round(self._flat_size / spatial ** 2))
        self.compression = nn.Sequential(
            nn.Conv2d(self._compress_in, channels, 3, 1, 1, bias=False),
            nn.GroupNorm(1, channels),
            nn.ReLU(True),
        )

    def forward(self, depth):
        x = torch.nn.functional.avg_pool2d(depth, 2)
        b = self.backbone
        x = torch.relu(b.bn1(b.conv1(x)))
        x = torch.nn.functional.max_pool2d(x, 3, 2, 1)
        for stage in range(len(self._layers)):
            x = getattr(b, f"layer{stage + 1}")(x)
        return self.compression(x)


def test_ddppo_remap_parity():
    torch.manual_seed(0)
    tm = _TorchResNetEncoder(baseplanes=8, layers=(1, 1), flat_size=64)
    tm.build_compression(spatial=4)
    tm = tm.eval()
    # wrap the keys the way a raw ddppo ckpt stores them (the prefix the
    # reference strips at resnet_encoders.py:39-50)
    ckpt = {"state_dict": {
        "actor_critic.net.visual_encoder." + k: v.detach().numpy()
        for k, v in tm.state_dict().items()
    }}
    params = load_ddppo_ckpt(ckpt, layers=(1, 1))

    enc = DdppoDepthEncoder(baseplanes=8, layers=(1, 1),
                            after_compression_flat_size=64)
    depth = np.random.default_rng(2).uniform(0, 1, (2, 64, 64, 1)).astype(np.float32)
    ours = np.asarray(enc.apply({"params": params}, depth))
    with torch.no_grad():
        theirs = tm(torch.from_numpy(depth).permute(0, 3, 1, 2)).numpy()
    np.testing.assert_allclose(ours, theirs.transpose(0, 2, 3, 1), atol=1e-4)


def test_ddppo_remap_full_tree_shapes():
    """The resnet50-shaped tree must cover every DdppoDepthEncoder param
    (shape-only via eval_shape — no compute)."""
    import jax

    enc = DdppoDepthEncoder()
    shapes = jax.eval_shape(
        enc.init, jax.random.key(0), np.zeros((1, 256, 256, 1), np.float32)
    )["params"]
    leaves, _ = jax.tree_util.tree_flatten_with_path(shapes)
    # stem (1 conv + 2 gn) + 16 bottlenecks x 9 + 4 downsamples x 3 +
    # compression (1 conv + 2 gn) = 162
    assert len(leaves) == 162
    names = {p[0].key for p, _ in leaves}
    assert "conv1" in names and "compression_conv" in names
    # every stage block is present with its bottleneck convs
    for stage, blocks in enumerate((3, 4, 6, 3)):
        for b in range(blocks):
            assert f"layer{stage + 1}_{b}" in names
    # compression output is the reference's (4, 4, 128) layout
    comp = shapes["compression_conv"]["kernel"]
    assert comp.shape == (3, 3, 1024, 128)
