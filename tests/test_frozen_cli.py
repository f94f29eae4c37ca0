"""CLI wiring of the real frozen CE stack (VERDICT r3 item 3):
--waypoint_ckpt / --ddppo_ckpt / --clip_ckpt files -> remapped trees ->
agent init, with the random-frozen path gated behind --allow_random_frozen.

Checkpoint files here are synthetic but carry the reference's EXACT torch
layouts: waypoint = torch.load(p)['predictor']['state_dict']
(ss_trainer_BEV.py:238), ddppo = {'state_dict':
{'actor_critic.net.visual_encoder.*'}} (resnet_encoders.py:39-50), clip =
HF CLIPVisionModel state dict.
"""

import json

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from vln_bevbert_tpu.cli import ce_train  # noqa: E402
from vln_bevbert_tpu.ce.frozen import (  # noqa: E402
    JaxDepthEncoder,
    load_clip_params,
    load_depth_params,
    load_waypoint_params,
)

TINY_CFG = {
    "model": {"vocab_size": 30522, "hidden_size": 32,
              "num_attention_heads": 2, "intermediate_size": 64,
              "num_l_layers": 1, "num_pano_layers": 1, "num_x_layers": 1,
              "image_feat_size": 16, "bev_grid_feat_size": 12,
              "bev_dim": 5, "bev_res": 1.5, "dtype": "float32"},
    "shapes": {"max_txt_len": 32, "max_steps": 4, "max_pano_len": 16,
               "max_gmap_len": 12, "max_local_len": 8, "max_objects": 0,
               "num_views": 12, "grid_hw": 4, "max_pc_steps": 3},
    "batch_size": 2, "max_action_len": 3,
}


def _tiny_waypoint_file(tmp_path):
    from test_frozen_remap import _TorchWaypoint

    torch.manual_seed(0)
    tm = _TorchWaypoint(hidden=32, heads=2, intermediate=64).eval()
    path = tmp_path / "check_cwp_bestdist_hfov90"
    torch.save({"predictor": {"state_dict": tm.state_dict()}}, str(path))
    return path, {k: v.detach().numpy() for k, v in tm.state_dict().items()}


def test_waypoint_ckpt_flag_end_to_end(tmp_path):
    """ce_train --waypoint_ckpt drives an eval run whose agent holds the
    REMAPPED published-layout weights, not a random init."""
    wp_path, sd = _tiny_waypoint_file(tmp_path)
    from vln_bevbert_tpu.ce.waypoint_predictor import load_waypoint_ckpt

    expect = load_waypoint_ckpt(sd)

    # the flag resolves to exactly the remapped tree
    args = ce_train.parse_args(["--waypoint_ckpt", str(wp_path)])
    wp_params, clip_enc, depth_enc = ce_train.build_frozen(args)
    assert clip_enc is None and depth_enc is None
    import jax

    for a, b in zip(jax.tree.leaves(expect), jax.tree.leaves(wp_params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # and the full CLI path runs with it (eval, synthetic world)
    cfg = tmp_path / "cfg.json"
    cfg.write_text(json.dumps(TINY_CFG))
    out = tmp_path / "run"
    ce_train.main([
        "--config", str(cfg), "--run_type", "eval", "--eval_batches", "1",
        "--n_episodes", "4", "--output_dir", str(out), "--seed", "0",
        "--waypoint_ckpt", str(wp_path),
    ])
    assert (out / "metrics.jsonl").exists()


def test_random_frozen_requires_explicit_flag(tmp_path):
    cfg = tmp_path / "cfg.json"
    cfg.write_text(json.dumps(TINY_CFG))
    with pytest.raises(SystemExit, match="allow_random_frozen"):
        ce_train.main([
            "--config", str(cfg), "--run_type", "eval", "--eval_batches", "1",
            "--n_episodes", "4", "--output_dir", str(tmp_path / "r"),
        ])


def test_encoder_ckpts_require_habitat():
    args = ce_train.parse_args(
        ["--allow_random_frozen", "--clip_ckpt", "/nonexistent"]
    )
    with pytest.raises(SystemExit, match="habitat_config"):
        ce_train.build_frozen(args)


def test_waypoint_npz_roundtrip(tmp_path):
    """An already-remapped tree saved as npz loads back identically."""
    wp_path, sd = _tiny_waypoint_file(tmp_path)
    tree = load_waypoint_params(str(wp_path))
    import jax

    flat = {
        "/".join(str(k.key) for k in path): np.asarray(v)
        for path, v in jax.tree_util.tree_flatten_with_path(tree)[0]
    }
    npz = tmp_path / "wp.npz"
    np.savez(npz, **flat)
    tree2 = load_waypoint_params(str(npz))
    for a, b in zip(jax.tree.leaves(tree), jax.tree.leaves(tree2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_ddppo_torch_file(tmp_path):
    """A full-resnet50-structured (tiny-width) ddppo torch checkpoint file
    remaps and drives the pooled JaxDepthEncoder the habitat binding uses."""
    from test_frozen_remap import _TorchResNetEncoder

    torch.manual_seed(1)
    tm = _TorchResNetEncoder(baseplanes=8, layers=(3, 4, 6, 3), flat_size=32)
    tm.build_compression(spatial=2)
    ckpt = {"state_dict": {
        "actor_critic.net.visual_encoder." + k: v
        for k, v in tm.state_dict().items()
    }, "extra_state": {"step": 0}}
    path = tmp_path / "gibson-2plus-resnet50.pth"
    torch.save(ckpt, str(path))

    params = load_depth_params(str(path))
    assert "conv1" in params and "layer4_2" in params
    enc = JaxDepthEncoder(params, baseplanes=8,
                          after_compression_flat_size=32)
    out = enc(np.random.default_rng(0).uniform(0, 1, (2, 128, 128))
              .astype(np.float32))
    assert out.shape[0] == 2 and out.ndim == 2
    assert np.isfinite(out).all()


def test_clip_torch_file(tmp_path):
    """A tiny-width HF-layout CLIP vision state dict remaps through the
    --clip_ckpt file path identically to hf_clip_to_tree."""
    from transformers import CLIPVisionConfig, CLIPVisionModel

    hf = CLIPVisionModel(CLIPVisionConfig(
        hidden_size=32, intermediate_size=64, num_hidden_layers=12,
        num_attention_heads=2, image_size=32, patch_size=16,
    )).eval()
    sd = {k: v for k, v in hf.state_dict().items()}
    path = tmp_path / "clip.pt"
    torch.save(sd, str(path))

    from vln_bevbert_tpu.models.clip import hf_clip_to_tree

    expect = hf_clip_to_tree(
        {k: v.detach().numpy() for k, v in sd.items()}
    )
    got = load_clip_params(str(path))
    import jax

    for a, b in zip(jax.tree.leaves(expect), jax.tree.leaves(got)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
