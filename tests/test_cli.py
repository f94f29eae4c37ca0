"""CLI smoke tests: both entry points run end-to-end in synthetic mode."""

import json
import os

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # every test drives a full CLI run end-to-end (smoke tier: pytest -m 'not slow')

TINY_MODEL = {
    "vocab_size": 30522, "hidden_size": 32, "num_attention_heads": 2,
    "intermediate_size": 64, "num_l_layers": 1, "num_pano_layers": 1,
    "num_x_layers": 1, "image_feat_size": 16, "bev_grid_feat_size": 12,
    "bev_dim": 5, "bev_res": 1.5, "dtype": "float32",
}
TINY_SHAPES = {
    "max_txt_len": 48, "max_steps": 5, "max_pano_len": 40, "max_gmap_len": 20,
    "max_local_len": 8, "max_objects": 0, "num_views": 2, "grid_hw": 4,
    "max_masked_tokens": 6, "max_pc_steps": 3,
}


def test_pretrain_cli_synthetic(tmp_path, monkeypatch):
    from vln_bevbert_tpu.cli import pretrain

    cfg_path = tmp_path / "cfg.json"
    cfg_path.write_text(json.dumps({
        "model": TINY_MODEL, "shapes": TINY_SHAPES,
        "optim": {"num_train_steps": 3, "warmup_steps": 1},
        "train_batch_size": 2, "valid_steps": 0, "log_steps": 2,
    }))
    orig = pretrain.build_synthetic_db
    monkeypatch.setattr(
        pretrain, "build_synthetic_db",
        lambda cfg, seed=0, tmpdir=None: orig(cfg, seed, str(tmp_path / "synth")),
    )
    out = tmp_path / "run"
    pretrain.main([
        "--synthetic", "--config", str(cfg_path), "--output_dir", str(out),
        "--num_steps", "3",
    ])
    assert (out / "metrics.jsonl").exists()
    # final checkpoint written
    assert any(p.name.startswith("ckpt_") for p in out.iterdir())


def test_finetune_cli_reverie_synthetic(tmp_path):
    """REVERIE object pipeline through the CLI (VERDICT r1 item 7): object
    DBs, OG head, RGS metrics, and predObjId in the submission dump."""
    from vln_bevbert_tpu.cli import finetune

    model = dict(TINY_MODEL, obj_feat_size=8)
    shapes = dict(TINY_SHAPES, max_objects=4)
    cfg_path = tmp_path / "cfg.json"
    cfg_path.write_text(json.dumps({
        "model": model, "shapes": shapes,
        "batch_size": 2, "max_action_len": 3,
    }))
    out = tmp_path / "run"
    finetune.main([
        "--synthetic", "--dataset", "reverie", "--config", str(cfg_path),
        "--output_dir", str(out), "--iters", "1", "--log_every", "1",
        "--feedback", "teacher", "--synth_dir", str(tmp_path / "synth_rvr"),
    ])
    metrics = [json.loads(l) for l in (out / "metrics.jsonl").read_text().splitlines()]
    assert any("val_unseen/rgs" in m for m in metrics)
    preds = [p for p in out.iterdir() if p.name.startswith("preds_")]
    data = json.loads(preds[0].read_text())
    assert any("predObjId" in d for d in data)


def test_finetune_cli_soon_synthetic(tmp_path):
    from vln_bevbert_tpu.cli import finetune

    model = dict(TINY_MODEL, obj_feat_size=8)
    shapes = dict(TINY_SHAPES, max_objects=4)
    cfg_path = tmp_path / "cfg.json"
    cfg_path.write_text(json.dumps({
        "model": model, "shapes": shapes,
        "batch_size": 2, "max_action_len": 3,
    }))
    out = tmp_path / "run"
    finetune.main([
        "--synthetic", "--dataset", "soon", "--config", str(cfg_path),
        "--output_dir", str(out), "--iters", "1", "--log_every", "1",
        "--feedback", "teacher", "--synth_dir", str(tmp_path / "synth_soon"),
        "--test",
    ])
    assert (out / "metrics.jsonl").exists()


def test_finetune_cli_synthetic(tmp_path, monkeypatch):
    from vln_bevbert_tpu.cli import finetune

    cfg_path = tmp_path / "cfg.json"
    cfg_path.write_text(json.dumps({
        "model": TINY_MODEL, "shapes": TINY_SHAPES,
        "batch_size": 2, "max_action_len": 4,
    }))
    out = tmp_path / "run"
    finetune.main([
        "--synthetic", "--config", str(cfg_path), "--output_dir", str(out),
        "--iters", "1", "--log_every", "1", "--feedback", "sample",
        "--synth_dir", str(tmp_path / "synth_nav"),
    ])
    assert (out / "metrics.jsonl").exists()
    assert (out / "ckpt_latest").exists()
    preds = [p for p in out.iterdir() if p.name.startswith("preds_")]
    assert preds
    data = json.loads(preds[0].read_text())
    assert all("instr_id" in d and "trajectory" in d for d in data)


def test_full_cycle_pretrain_to_finetune(tmp_path, monkeypatch):
    """The staged production cycle: pretrain -> orbax ckpt -> finetune
    restores it via --pretrain_ckpt (structural transfer) -> eval + preds."""
    from vln_bevbert_tpu.cli import finetune, pretrain

    cfg_path = tmp_path / "pt.json"
    cfg_path.write_text(json.dumps({
        "model": TINY_MODEL, "shapes": TINY_SHAPES,
        "optim": {"num_train_steps": 2, "warmup_steps": 1},
        "train_batch_size": 2, "valid_steps": 0, "log_steps": 1,
    }))
    orig = pretrain.build_synthetic_db
    monkeypatch.setattr(
        pretrain, "build_synthetic_db",
        lambda cfg, seed=0, tmpdir=None: orig(cfg, seed, str(tmp_path / "synth")),
    )
    pt_out = tmp_path / "pt_run"
    pretrain.main([
        "--synthetic", "--config", str(cfg_path), "--output_dir", str(pt_out),
        "--num_steps", "2",
    ])
    ckpts = sorted(p for p in pt_out.iterdir() if p.name.startswith("ckpt_")
                   and p.name != "ckpt_latest")
    assert ckpts

    ft_cfg = tmp_path / "ft.json"
    ft_cfg.write_text(json.dumps({
        "model": TINY_MODEL, "shapes": TINY_SHAPES,
        "batch_size": 2, "max_action_len": 3,
    }))
    ft_out = tmp_path / "ft_run"
    finetune.main([
        "--synthetic", "--config", str(ft_cfg), "--output_dir", str(ft_out),
        "--iters", "1", "--log_every", "1", "--feedback", "teacher",
        "--synth_dir", str(tmp_path / "synth_nav"),
        "--pretrain_ckpt", str(ckpts[-1]),
    ])
    assert (ft_out / "metrics.jsonl").exists()
    assert any(p.name.startswith("preds_") for p in ft_out.iterdir())


def test_finetune_cli_aug_alternation(tmp_path):
    """--aug_path alternates gt/aug envs 1:1 per iteration
    (ref main_nav.py:160-174)."""
    from vln_bevbert_tpu.cli import finetune

    cfg_path = tmp_path / "cfg.json"
    cfg_path.write_text(json.dumps({
        "model": TINY_MODEL, "shapes": TINY_SHAPES,
        "batch_size": 2, "max_action_len": 3,
    }))
    out = tmp_path / "run"
    finetune.main([
        "--synthetic", "--config", str(cfg_path), "--output_dir", str(out),
        "--iters", "2", "--log_every", "2", "--feedback", "teacher",
        "--synth_dir", str(tmp_path / "synth_aug"), "--aug_path", "synth",
    ])
    metrics = [json.loads(l) for l in (out / "metrics.jsonl").read_text().splitlines()]
    assert any("train/IL_loss" in m for m in metrics)
