"""Reference-format annotation shims (data/annotations.py) — fixtures below
are verbatim reference shapes (map_nav_src/*/data_utils.py), round-tripped
into the internal per-instruction records."""

import json
import os

import numpy as np
import pytest

from vln_bevbert_tpu.data.annotations import (
    construct_instrs,
    load_instr_datasets,
    read_annotation_file,
    resolve_annotation_file,
)


def _write(path, obj, jsonl=False):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as f:
        if jsonl:
            for item in obj:
                f.write(json.dumps(item) + "\n")
        else:
            json.dump(obj, f)


def _r2r_item(pid, n_instr=3):
    return {
        "path_id": pid,
        "scan": "scanA",
        "path": ["vp0", "vp1", "vp2"],
        "heading": 1.0,
        "instructions": [f"walk {pid} #{j}" for j in range(n_instr)],
        "instr_encodings": [
            list(range(100 + j, 100 + j + 8)) for j in range(n_instr)
        ],
    }


def test_r2r_reference_json(tmp_path):
    """R2R_%s_enc.json JSON list -> per-instruction records
    (ref r2r/data_utils.py:41-62)."""
    items = [_r2r_item(7), _r2r_item(8, n_instr=2)]
    _write(str(tmp_path / "R2R_val_seen_enc.json"), items)
    out = construct_instrs(str(tmp_path), "r2r", ["val_seen"], max_instr_len=5)
    assert len(out) == 5
    assert out[0]["instr_id"] == "7_0"
    assert out[4]["instr_id"] == "8_1"
    assert out[0]["instruction"] == "walk 7 #0"
    # truncated to max_instr_len, source lists removed
    assert out[0]["instr_encoding"] == list(range(100, 105))
    assert "instructions" not in out[0] and "instr_encodings" not in out[0]
    assert out[0]["path"] == ["vp0", "vp1", "vp2"]


def test_native_jsonl_passthrough(tmp_path):
    items = [
        {"instr_id": "1_0", "scan": "s", "path": ["a", "b"],
         "instr_encoding": list(range(20))},
    ]
    _write(str(tmp_path / "r2r_train_enc.jsonl"), items, jsonl=True)
    out = construct_instrs(str(tmp_path), "r2r", ["train"], max_instr_len=6)
    assert len(out) == 1
    assert out[0]["instr_id"] == "1_0"
    assert out[0]["instr_encoding"] == list(range(6))


def test_native_name_wins_over_reference(tmp_path):
    _write(str(tmp_path / "r2r_train_enc.jsonl"),
           [{"instr_id": "n", "instr_encoding": [1]}], jsonl=True)
    _write(str(tmp_path / "R2R_train_enc.json"), [_r2r_item(1)])
    path = resolve_annotation_file(str(tmp_path), "r2r", "train")
    assert path.endswith("r2r_train_enc.jsonl")


def test_rxr_guide_jsonl(tmp_path):
    """rxr_%s_guide_enc_xlmr.jsonl is already split; ids derive from
    instruction_id (ref r2r/data_utils.py:44-52)."""
    items = [
        {"path_id": 3, "instruction_id": 12, "scan": "s",
         "path": ["a", "b"], "instr_encoding": list(range(30))},
        {"instruction_id": 99, "scan": "s", "path": ["a"],
         "instr_encoding": [5, 6]},  # test split: no path_id
    ]
    _write(str(tmp_path / "rxr_val_unseen_guide_enc_xlmr.jsonl"), items,
           jsonl=True)
    out = construct_instrs(str(tmp_path), "rxr", ["val_unseen"],
                           max_instr_len=10)
    assert out[0]["instr_id"] == "3_12"
    assert len(out[0]["instr_encoding"]) == 10
    assert out[1]["instr_id"] == "99" and out[1]["path_id"] == "99"


def test_reverie_objid_ids(tmp_path):
    """REVERIE joins objId into instr_id; items without objId fall back to
    item['id'] (ref reverie/data_utils.py:79-86)."""
    items = [
        {"path_id": 4, "objId": 17, "scan": "s", "path": ["a", "b"],
         "instructions": ["find it"], "instr_encodings": [[1, 2, 3]]},
        {"id": "ep5", "scan": "s", "path": ["a"],
         "instructions": ["go"], "instr_encodings": [[9]]},
    ]
    _write(str(tmp_path / "REVERIE_val_unseen_enc.json"), items)
    out = construct_instrs(str(tmp_path), "reverie", ["val_unseen"])
    assert out[0]["instr_id"] == "4_17_0"
    assert out[1]["instr_id"] == "ep5_0"
    assert out[1]["objId"] is None and out[1]["path_id"] == "ep5"


def test_reverie_xlmr_variant(tmp_path):
    _write(str(tmp_path / "REVERIE_train_enc_xlmr.json"),
           [{"path_id": 1, "objId": 2, "scan": "s", "path": ["a"],
             "instructions": ["x"], "instr_encodings": [[1]]}])
    with pytest.raises(FileNotFoundError):
        resolve_annotation_file(str(tmp_path), "reverie", "train", "bert")
    p = resolve_annotation_file(str(tmp_path), "reverie", "train", "xlm")
    assert p.endswith("_enc_xlmr.json")


def test_soon_bbox_normalisation(tmp_path):
    """SOON raw bbox lists are re-keyed by image_id with pseudo-label and
    end-image tables; instructions are dicts keyed by instr_type
    (ref soon/data_utils.py:33-69)."""
    items = [{
        "path_id": 11, "scan": "s", "path": ["a", "b"],
        "bboxes": [
            {"image_id": "imgA", "pseudo_label": 3, "x": 1},
            {"image_id": "imgB", "x": 2},
        ],
        "instructions": [{"full": "full text", "short": "short"}],
        "instr_encodings": [{"full": list(range(9)), "short": [1, 2]}],
    }]
    _write(str(tmp_path / "bert_enc" / "train_enc_pseudo_obj_label.jsonl"),
           items, jsonl=True)
    out = construct_instrs(str(tmp_path), "soon", ["train"], max_instr_len=4)
    assert out[0]["instr_id"] == "11_0"
    assert out[0]["instruction"] == "full text"
    assert out[0]["instr_encoding"] == [0, 1, 2, 3]
    assert out[0]["end_image_ids"] == ["imgA", "imgB"]
    assert out[0]["image_id_to_obj_label"] == {"imgA": 3, "imgB": None}
    assert set(out[0]["bboxes"]) == {"imgA", "imgB"}
    # short instr_type selects the other encoding
    out_s = construct_instrs(str(tmp_path), "soon", ["train"],
                             instr_type="short")
    assert out_s[0]["instruction"] == "short"


def test_soon_enc_fallback(tmp_path):
    _write(str(tmp_path / "bert_enc" / "val_unseen_house_enc.jsonl"), [],
           jsonl=True)
    _write(str(tmp_path / "bert_enc" / "val_unseen_enc.jsonl"),
           [{"path_id": 1, "bboxes": [], "instructions": [{"full": "t"}],
             "instr_encodings": [{"full": [1]}]}], jsonl=True)
    p = resolve_annotation_file(str(tmp_path), "soon", "val_unseen")
    assert p.endswith("val_unseen_enc.jsonl")


def test_aug_split_as_path_with_schema_sniff(tmp_path):
    """A split containing a path separator is an explicit file; reference
    multi-instruction shape is sniffed per item (r2r/data_utils.py:25-35)."""
    aug = str(tmp_path / "aug" / "prevalent_aug_enc.json")
    _write(aug, [_r2r_item(99, n_instr=1)])
    out = construct_instrs(str(tmp_path), "r2r", [aug])
    assert len(out) == 1 and out[0]["instr_id"] == "99_0"


def test_r4r_val_unseen_subsample(tmp_path):
    """r4r val_unseen is subsampled to 200 when not is_test
    (ref r2r/data_utils.py:21-24)."""
    items = [_r2r_item(i, n_instr=1) for i in range(300)]
    _write(str(tmp_path / "R4R_val_unseen_enc.json"), items)
    out = load_instr_datasets(str(tmp_path), "r4r", ["val_unseen"],
                              is_test=False, rng=np.random.default_rng(0))
    assert len(out) == 200
    full = load_instr_datasets(str(tmp_path), "r4r", ["val_unseen"],
                               is_test=True)
    assert len(full) == 300


def test_missing_file_lists_candidates(tmp_path):
    with pytest.raises(FileNotFoundError) as e:
        resolve_annotation_file(str(tmp_path), "r2r", "train")
    assert "r2r_train_enc.jsonl" in str(e.value)
    assert "R2R_train_enc.json" in str(e.value)


@pytest.mark.slow
def test_finetune_three_split_reference_format(tmp_path):
    """End-to-end: a data_root holding verbatim reference-format
    R2R_%s_enc.json files drives fine-tune unconverted, and every present
    eval split is evaluated + logged (ref main_nav.py:71-75 builds
    val_train_seen/val_seen/val_unseen; absent split files are skipped)."""
    from vln_bevbert_tpu.cli import finetune
    from vln_bevbert_tpu.data.feature_db import write_synthetic_features
    from vln_bevbert_tpu.data.loader import make_synthetic_annotations
    from vln_bevbert_tpu.data.nav_graph import (
        load_nav_graphs,
        write_synthetic_connectivity,
    )

    root = tmp_path / "data"
    rng = np.random.default_rng(0)
    write_synthetic_connectivity(str(root / "connectivity"), rng,
                                 n_scans=2, n_nodes=10)
    graphs = load_nav_graphs(str(root / "connectivity"))
    tiny_model = {
        "vocab_size": 30522, "hidden_size": 32, "num_attention_heads": 2,
        "intermediate_size": 64, "num_l_layers": 1, "num_pano_layers": 1,
        "num_x_layers": 1, "image_feat_size": 16, "bev_grid_feat_size": 12,
        "bev_dim": 5, "bev_res": 1.5, "dtype": "float32",
    }
    tiny_shapes = {
        "max_txt_len": 48, "max_steps": 4, "max_pano_len": 40,
        "max_gmap_len": 20, "max_local_len": 8, "max_objects": 0,
        "num_views": 2, "grid_hw": 4, "max_masked_tokens": 6,
        "max_pc_steps": 3,
    }
    write_synthetic_features(
        str(root), rng, {s: g.node_ids for s, g in graphs.items()},
        image_feat_size=16, grid_feat_size=12, grid_hw=4, num_views=2,
    )

    def to_reference(items):
        # group native records into the reference's multi-instruction shape
        return [
            {
                "path_id": i,
                "scan": it["scan"],
                "path": it["path"],
                "heading": it["heading"],
                "instructions": ["synthetic instruction"],
                "instr_encodings": [[int(t) for t in it["instr_encoding"]]],
            }
            for i, it in enumerate(items)
        ]

    for split, n in (("train", 8), ("val_seen", 4), ("val_unseen", 4)):
        _write(str(root / f"R2R_{split}_enc.json"),
               to_reference(make_synthetic_annotations(graphs, rng, n_items=n)))
    # no val_train_seen file on purpose — must be skipped, not fatal

    cfg = tmp_path / "cfg.json"
    cfg.write_text(json.dumps({
        "model": tiny_model, "shapes": tiny_shapes,
        "batch_size": 2, "max_action_len": 3,
    }))
    out = tmp_path / "run"
    finetune.main([
        "--data_root", str(root), "--config", str(cfg),
        "--output_dir", str(out), "--iters", "1", "--log_every", "1",
        "--feedback", "teacher",
    ])
    rows = [json.loads(l) for l in
            (out / "metrics.jsonl").read_text().splitlines() if l.strip()]
    keys = set()
    for r in rows:
        keys.update(r.get("metrics", r).keys())
    assert any(k.startswith("val_seen/") for k in keys)
    assert any(k.startswith("val_unseen/") for k in keys)
    assert not any(k.startswith("val_train_seen/") for k in keys)


def test_finetune_submit_split_dumps_predictions(tmp_path):
    """--submit builds the gt-less leaderboard test split: predictions are
    dumped in submission format, no metrics logged for it
    (ref main_nav.py:77-81, 270-291)."""
    from vln_bevbert_tpu.cli import finetune
    from vln_bevbert_tpu.data.feature_db import write_synthetic_features
    from vln_bevbert_tpu.data.loader import make_synthetic_annotations
    from vln_bevbert_tpu.data.nav_graph import (
        load_nav_graphs,
        write_synthetic_connectivity,
    )

    root = tmp_path / "data"
    rng = np.random.default_rng(0)
    write_synthetic_connectivity(str(root / "connectivity"), rng,
                                 n_scans=2, n_nodes=10)
    graphs = load_nav_graphs(str(root / "connectivity"))
    write_synthetic_features(
        str(root), rng, {s: g.node_ids for s, g in graphs.items()},
        image_feat_size=16, grid_feat_size=12, grid_hw=4, num_views=2,
    )

    def to_reference(items, start_only=False):
        return [
            {
                "path_id": i, "scan": it["scan"],
                "path": it["path"][:1] if start_only else it["path"],
                "heading": it["heading"],
                "instructions": ["synthetic instruction"],
                "instr_encodings": [[int(t) for t in it["instr_encoding"]]],
            }
            for i, it in enumerate(items)
        ]

    for split, n, start_only in (("train", 8, False), ("val_unseen", 4, False),
                                 ("test", 4, True)):
        _write(str(root / f"R2R_{split}_enc.json"),
               to_reference(make_synthetic_annotations(graphs, rng, n_items=n),
                            start_only))

    cfg = tmp_path / "cfg.json"
    cfg.write_text(json.dumps({
        "model": {
            "vocab_size": 30522, "hidden_size": 32, "num_attention_heads": 2,
            "intermediate_size": 64, "num_l_layers": 1, "num_pano_layers": 1,
            "num_x_layers": 1, "image_feat_size": 16,
            "bev_grid_feat_size": 12, "bev_dim": 5, "bev_res": 1.5,
            "dtype": "float32",
        },
        "shapes": {
            "max_txt_len": 48, "max_steps": 4, "max_pano_len": 40,
            "max_gmap_len": 20, "max_local_len": 8, "max_objects": 0,
            "num_views": 2, "grid_hw": 4, "max_masked_tokens": 6,
            "max_pc_steps": 3,
        },
        "batch_size": 2, "max_action_len": 3,
    }))
    out = tmp_path / "run"
    finetune.main([
        "--data_root", str(root), "--config", str(cfg),
        "--output_dir", str(out), "--test", "--submit",
        "--val_splits", "val_unseen",
    ])
    preds = json.loads((out / "preds_test_0.json").read_text())
    assert len(preds) == 4
    assert all("instr_id" in p and "trajectory" in p for p in preds)
    rows = [json.loads(l) for l in
            (out / "metrics.jsonl").read_text().splitlines() if l.strip()]
    keys = set()
    for r in rows:
        keys.update(r.keys())
    assert any(k.startswith("val_unseen/") for k in keys)
    assert not any(k.startswith("test/") for k in keys)


@pytest.mark.slow
def test_pretrain_traj_file_lists(tmp_path):
    """--train_files consumes explicit trajectory-file lists like the
    reference's data_cfg.train_traj_files (train_r2r.py:164-173)."""
    from vln_bevbert_tpu.cli.pretrain import build_real_db
    from vln_bevbert_tpu.configs import PretrainConfig
    from vln_bevbert_tpu.data.feature_db import write_synthetic_features
    from vln_bevbert_tpu.data.loader import make_synthetic_annotations
    from vln_bevbert_tpu.data.nav_graph import (
        load_nav_graphs,
        write_synthetic_connectivity,
    )

    root = str(tmp_path / "data")
    rng = np.random.default_rng(0)
    write_synthetic_connectivity(os.path.join(root, "connectivity"), rng,
                                 n_scans=2, n_nodes=8)
    graphs = load_nav_graphs(os.path.join(root, "connectivity"))
    cfg = PretrainConfig()
    cfg.model.image_feat_size = 16
    cfg.model.bev_grid_feat_size = 12
    cfg.shapes.grid_hw = 4
    cfg.shapes.num_views = 2
    write_synthetic_features(root, rng,
                             {s: g.node_ids for s, g in graphs.items()},
                             image_feat_size=16, grid_feat_size=12,
                             grid_hw=4, num_views=2)
    f1 = str(tmp_path / "part1_enc.jsonl")
    f2 = str(tmp_path / "part2_enc.jsonl")
    for f, n in ((f1, 5), (f2, 3)):
        items = make_synthetic_annotations(graphs, rng, n_items=n)
        _write(f, [{**it, "instr_encoding": [int(t) for t in
                                             it["instr_encoding"]]}
                   for it in items], jsonl=True)
    db = build_real_db(cfg, root, "r2r", traj_files=[f1, f2])
    assert len(db.data) == 8
    # no native-layout file exists, so the default path must fail loudly
    with pytest.raises(FileNotFoundError):
        build_real_db(cfg, root, "r2r")


def test_read_annotation_file_rejects_non_list(tmp_path):
    p = str(tmp_path / "bad.json")
    _write(p, [])
    with open(p, "w") as f:
        json.dump({"episodes": []}, f)
    with pytest.raises(ValueError):
        read_annotation_file(p)
