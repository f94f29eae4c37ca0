"""Auxiliary-subsystem tests: precompute pipeline, visualizer, distributed
helpers, profiling, depth embedding, fusion variants, auto-resume."""

import os

import jax
import numpy as np
import pytest

from vln_bevbert_tpu.configs import ModelConfig


def test_precompute_pipeline(tmp_path):
    import h5py

    from vln_bevbert_tpu.precompute import (
        RandomProjectionEncoder,
        SyntheticImageSource,
        build_feature_files,
    )

    source = SyntheticImageSource(
        {"scanA": ["vp0", "vp1"]}, image_hw=32, grid_hw=4, num_views=3
    )
    enc = RandomProjectionEncoder(pooled_dim=16, grid_dim=12, grid_hw=4)
    paths = build_feature_files(source, enc, str(tmp_path), progress_every=0)
    with h5py.File(paths["img_ft"]) as f:
        assert f["scanA_vp0"].shape == (36, 16)
    with h5py.File(paths["rgb"]) as f:
        assert f["scanA_vp1"].shape == (3, 16, 12)
    with h5py.File(paths["depth"]) as f:
        d = f["scanA_vp0"][...]
        assert d.shape == (3, 4, 4) and d.max() <= 0.91  # metres / 10
    with h5py.File(paths["sem"]) as f:
        assert f["scanA_vp0"].dtype == np.uint8
    # determinism: rebuilding produces identical features
    paths2 = build_feature_files(source, enc, str(tmp_path / "again"), 0)
    with h5py.File(paths["img_ft"]) as f1, h5py.File(paths2["img_ft"]) as f2:
        np.testing.assert_array_equal(f1["scanA_vp0"][...], f2["scanA_vp0"][...])
    # raw-image dumps (ref save_habitat_img.py / save_depth_img.py products)
    paths3 = build_feature_files(
        source, enc, str(tmp_path / "raw"), 0, save_raw_images=True
    )
    with h5py.File(paths3["raw_rgb"]) as f:
        assert f["scanA_vp0"].shape == (3, 32, 32, 3)
        assert f["scanA_vp0"].dtype == np.uint8
    with h5py.File(paths3["raw_depth"]) as f:
        assert f["scanA_vp0"].shape == (3, 4, 4)


@pytest.mark.slow
def test_precompute_reference_dump_products(tmp_path):
    """The reference's two standalone dump products: raw 36-view image dbs
    (save_habitat_img.py layout — BGR uint8 / float32 depth + geometry
    attrs) and DDPPO depth features pooled per view (save_depth_feature.py
    layout), readable back through H5FeatureDB."""
    import h5py

    from vln_bevbert_tpu.data.feature_db import H5FeatureDB
    from vln_bevbert_tpu.precompute import (
        SyntheticImageSource,
        dump_depth_features,
        dump_raw_view_images,
    )

    src = SyntheticImageSource({"scanA": ["vp0"]}, image_hw=64, grid_hw=4,
                               num_views=2)
    rgb_db = dump_raw_view_images(
        src, str(tmp_path / "habitat_64x64_vfov60_bgr.hdf5"), "rgb",
        progress_every=0)
    depth_db = dump_raw_view_images(
        src, str(tmp_path / "habitat_64x64_vfov60_depth.hdf5"), "depth",
        progress_every=0)
    with h5py.File(rgb_db) as f:
        d = f["scanA_vp0"]
        assert d.shape == (36, 64, 64, 3) and d.dtype == np.uint8
        assert d.attrs["scanId"] == "scanA" and d.attrs["vfov"] == 60
        assert d.attrs["image_w"] == 64 and d.attrs["image_h"] == 64
        # stored BGR: channel order is reversed vs the source frames
        frames = next(iter(src))[2]["views36"]
        np.testing.assert_array_equal(d[...], frames[..., ::-1])
    with h5py.File(depth_db) as f:
        d = f["scanA_vp0"]
        assert d.shape == (36, 64, 64, 1) and d.dtype == np.float32

    ft_db = dump_depth_features(depth_db, str(tmp_path / "depth_fts.hdf5"),
                                progress_every=0)
    with h5py.File(ft_db) as f:
        d = f["scanA_vp0"]
        assert d.shape[0] == 36 and d.ndim == 2
        assert d.dtype == np.float32
        assert d.attrs["viewpointId"] == "vp0"
        fts = d[...]
        assert np.isfinite(fts).all() and fts.min() >= 0  # post-ReLU pool
    # consumable through the training-side reader
    reader = H5FeatureDB(ft_db)
    arr = reader.get("scanA", "vp0")
    np.testing.assert_allclose(arr, fts, rtol=1e-6)


def test_visualizer(tmp_path):
    from vln_bevbert_tpu.utils.visualize import (
        render_bev_mask,
        render_topdown_traj,
        save_image,
    )

    occ = np.zeros(25, bool)
    occ[[3, 7, 12]] = True
    img = render_bev_mask(occ, cand_cells=[12], scale=4)
    assert img.shape == (20, 20, 3)
    assert (img[12 // 5 * 4, 12 % 5 * 4] == (0, 255, 0)).all()
    walked = [[0, 0, 0], [1, 0, 1], [2, 0, 3]]
    gt = [[0, 0, 0], [2, 0, 2]]
    tra = render_topdown_traj(walked, gt)
    assert tra.shape == (320, 320, 3) and tra.sum() > 0
    save_image(str(tmp_path / "t.png"), tra)
    assert os.path.exists(tmp_path / "t.png")


def test_distributed_single_host():
    from vln_bevbert_tpu.parallel.distributed import (
        all_gather_objects,
        is_primary,
        merge_results,
    )

    assert is_primary()
    assert all_gather_objects({"a": 1}) == [{"a": 1}]
    merged = merge_results(
        [[{"instr_id": "x", "v": 1}], [{"instr_id": "x", "v": 2}, {"instr_id": "y"}]]
    )
    assert [m["instr_id"] for m in merged] == ["x", "y"]
    assert merged[0]["v"] == 1


def test_step_timer_and_trace(tmp_path):
    from vln_bevbert_tpu.utils.profiling import StepTimer, annotate, trace

    t = StepTimer(window=3)
    ticked = [t.tick(4) for _ in range(3)]
    assert ticked == [False, False, True]
    assert t.examples_per_sec > 0
    with annotate("host-phase"):
        pass
    with trace(str(tmp_path / "prof")):
        jax.block_until_ready(jax.numpy.zeros(8) + 1)
    assert any(os.scandir(tmp_path / "prof"))


def test_depth_embedding_changes_output():
    from vln_bevbert_tpu.models import GlocalTextPathNavCMT

    cfg = ModelConfig(
        vocab_size=100, hidden_size=32, num_attention_heads=2,
        intermediate_size=64, num_l_layers=1, num_pano_layers=1,
        num_x_layers=1, image_feat_size=16, dtype="float32",
        use_depth_embedding=True,
    )
    model = GlocalTextPathNavCMT(cfg)
    rng = np.random.default_rng(0)
    batch = {
        "view_fts": rng.normal(size=(2, 6, 16)).astype(np.float32),
        "loc_fts": rng.normal(size=(2, 6, 7)).astype(np.float32),
        "nav_types": np.zeros((2, 6), np.int32),
        "view_lens": np.full(2, 6, np.int32),
        "dep_fts": rng.normal(size=(2, 6, 128)).astype(np.float32),
    }
    params = model.init(jax.random.key(0), "panorama", batch)
    out1, _ = model.apply(params, "panorama", batch)
    batch2 = dict(batch, dep_fts=batch["dep_fts"] * 0)
    out2, _ = model.apply(params, "panorama", batch2)
    assert not np.allclose(np.asarray(out1), np.asarray(out2))


@pytest.mark.slow
def test_trainer_auto_resume(tmp_path):
    from vln_bevbert_tpu.configs import (
        ModelConfig as MC, OptimConfig, PretrainConfig, ShapeConfig,
    )
    from vln_bevbert_tpu.data.synthetic import synthetic_pretrain_batch
    from vln_bevbert_tpu.data.loader import PretrainLoader
    from vln_bevbert_tpu.pretrain import PretrainTrainer

    tiny = MC(vocab_size=300, hidden_size=16, num_attention_heads=2,
              intermediate_size=32, num_l_layers=1, num_pano_layers=1,
              num_x_layers=1, image_feat_size=8, bev_grid_feat_size=8,
              bev_dim=3, dtype="float32", max_position_embeddings=32)
    shapes = ShapeConfig(max_txt_len=12, max_steps=2, max_pano_len=6,
                         max_gmap_len=6, max_local_len=4, max_objects=0,
                         num_views=2, grid_hw=2, max_masked_tokens=3)
    cfg = PretrainConfig(model=tiny, shapes=shapes,
                         optim=OptimConfig(warmup_steps=1, num_train_steps=4),
                         tasks=("sap",), mix_ratio=(1,), train_batch_size=2,
                         valid_steps=0)

    class FakeLoader:
        global_batch_size = 2

        def __init__(self):
            self.rng = np.random.default_rng(0)

        def build_batch(self, step, task=None):
            return "sap", synthetic_pretrain_batch(
                np.random.default_rng(step), 2, shapes, tiny, raw_bev=True
            )

        def __iter__(self):
            step = 0
            while True:
                yield self.build_batch(step)
                step += 1

    trainer = PretrainTrainer(cfg, FakeLoader(), output_dir=str(tmp_path))
    assert trainer.auto_resume() is None
    trainer.train(num_steps=2)
    trainer.save(2)
    trainer2 = PretrainTrainer(cfg, FakeLoader(), output_dir=str(tmp_path))
    restored = trainer2.auto_resume()
    assert restored and restored.endswith("ckpt_2")
    assert int(trainer2.state.step) == 2


def test_multilabel_metrics():
    from vln_bevbert_tpu.utils.mlabel import MP3D_CATEGORIES, binary_auc, multilabel_report

    assert len(MP3D_CATEGORIES) == 40
    # perfect separation -> AUC 1; anti-separation -> 0; ties -> 0.5
    assert binary_auc(np.array([0.9, 0.8, 0.1, 0.2]), np.array([1, 1, 0, 0])) == 1.0
    assert binary_auc(np.array([0.1, 0.2, 0.9, 0.8]), np.array([1, 1, 0, 0])) == 0.0
    assert binary_auc(np.array([0.5, 0.5, 0.5, 0.5]), np.array([1, 1, 0, 0])) == 0.5
    assert np.isnan(binary_auc(np.array([0.5, 0.4]), np.array([1, 1])))
    rng = np.random.default_rng(0)
    labels = rng.uniform(size=(200, 5)) < 0.3
    scores = labels * 0.8 + rng.uniform(size=(200, 5)) * 0.3
    rep = multilabel_report(scores, labels, class_names=list("abcde"))
    assert rep["auc_macro"] > 0.95
    assert rep["f1_macro"] > 0.5
    assert "auc/a" in rep


@pytest.mark.slow
def test_sem_auc_in_validation(tmp_path):
    """Trainer validation reports macro AUC for semantic tasks."""
    from vln_bevbert_tpu.configs import (
        ModelConfig as MC, OptimConfig, PretrainConfig, ShapeConfig,
    )
    from vln_bevbert_tpu.data.synthetic import synthetic_pretrain_batch
    from vln_bevbert_tpu.pretrain import PretrainTrainer

    tiny = MC(vocab_size=300, hidden_size=16, num_attention_heads=2,
              intermediate_size=32, num_l_layers=1, num_pano_layers=1,
              num_x_layers=1, image_feat_size=8, bev_grid_feat_size=8,
              bev_dim=3, dtype="float32", max_position_embeddings=32,
              num_sem_classes=6)
    shapes = ShapeConfig(max_txt_len=12, max_steps=2, max_pano_len=6,
                         max_gmap_len=8, max_local_len=4, max_objects=0,
                         num_views=2, grid_hw=2, max_masked_tokens=3)
    cfg = PretrainConfig(model=tiny, shapes=shapes,
                         optim=OptimConfig(warmup_steps=1, num_train_steps=2),
                         tasks=("masksem",), mix_ratio=(1,), train_batch_size=2,
                         valid_steps=0)

    class FakeLoader:
        global_batch_size = 2

        def build_batch(self, step, task=None):
            return "masksem", synthetic_pretrain_batch(
                np.random.default_rng(step), 2, shapes, tiny, raw_bev=True
            )

        def __iter__(self):
            step = 0
            while True:
                yield self.build_batch(step)
                step += 1

    trainer = PretrainTrainer(cfg, FakeLoader(), {"val": FakeLoader()},
                              output_dir=str(tmp_path))
    results = trainer.validate(step=0, num_batches=2)
    assert "val/sem/auc_macro" in results
    assert "val/masksem/loss" in results
