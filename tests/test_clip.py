"""Flax CLIP vision tower vs transformers' torch CLIPVisionModel (random
init — no downloads): pooled and grid outputs must match through the
state-dict remapper."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

import jax

from vln_bevbert_tpu.models.clip import ClipVisionTower, hf_clip_to_tree, preprocess


@pytest.mark.slow
def test_clip_forward_parity():
    from transformers import CLIPVisionConfig, CLIPVisionModel

    hf_cfg = CLIPVisionConfig(
        hidden_size=32, intermediate_size=64, num_hidden_layers=2,
        num_attention_heads=2, image_size=32, patch_size=16,
        attention_dropout=0.0,
    )
    torch.manual_seed(0)
    hf = CLIPVisionModel(hf_cfg).eval()

    tower = ClipVisionTower(
        hidden_size=32, intermediate_size=64, num_layers=2, num_heads=2,
        patch_size=16,
    )
    rng = np.random.default_rng(0)
    imgs = rng.uniform(-1, 1, (2, 32, 32, 3)).astype(np.float32)

    params = tower.init(jax.random.key(0), imgs)["params"]
    tree = hf_clip_to_tree(
        {k: v.detach().numpy() for k, v in hf.state_dict().items()},
        num_layers=2,
    )
    # shapes line up exactly
    flat_new = jax.tree.map(np.shape, tree)
    flat_old = jax.tree.map(np.shape, dict(params))
    assert flat_new == flat_old, (flat_new, flat_old)

    out = tower.apply({"params": tree}, imgs)
    with torch.no_grad():
        t_out = hf(torch.from_numpy(imgs).permute(0, 3, 1, 2))
    np.testing.assert_allclose(
        np.asarray(out["pooled"]), t_out.pooler_output.numpy(), atol=3e-4
    )
    np.testing.assert_allclose(
        np.asarray(out["grid"]),
        t_out.last_hidden_state[:, 1:].numpy(),
        atol=3e-4,
    )


def test_preprocess_range():
    imgs = np.full((1, 8, 8, 3), 255, np.uint8)
    x = preprocess(imgs)
    assert x.max() < 2.5 and x.min() > 1.5  # (1-mean)/std for CLIP stats


def test_jax_clip_encoder_in_pipeline(tmp_path):
    import h5py
    import jax

    from vln_bevbert_tpu.models.clip import ClipVisionTower
    from vln_bevbert_tpu.precompute import (
        JaxClipEncoder,
        SyntheticImageSource,
        build_feature_files,
    )

    tower_kw = dict(hidden_size=32, intermediate_size=64, num_layers=1,
                    num_heads=2, patch_size=16)
    tower = ClipVisionTower(**tower_kw)
    params = tower.init(
        jax.random.key(0), np.zeros((1, 32, 32, 3), np.float32)
    )["params"]
    enc = JaxClipEncoder(params, grid_hw=2, **tower_kw)
    src = SyntheticImageSource({"s": ["v0"]}, image_hw=32, grid_hw=2, num_views=2)
    paths = build_feature_files(src, enc, str(tmp_path), progress_every=0)
    with h5py.File(paths["img_ft"]) as f:
        assert f["s_v0"].shape == (36, 32)
    with h5py.File(paths["rgb"]) as f:
        assert f["s_v0"].shape == (2, 4, 32)  # 2 views, 2x2 patches, 32-d
