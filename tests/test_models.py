"""Model library tests: every proxy task runs, losses are finite, and the
static-slot masking is airtight (perturbing padded regions never changes the
loss — the property that makes the TPU padding re-design equivalent to the
reference's dynamic shapes)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vln_bevbert_tpu.configs import ModelConfig, ShapeConfig
from vln_bevbert_tpu.data.synthetic import synthetic_pretrain_batch
from vln_bevbert_tpu.models import GlocalTextPathCMTPreTraining, GlocalTextPathNavCMT

TINY = ModelConfig(
    vocab_size=400,
    hidden_size=32,
    num_attention_heads=2,
    intermediate_size=64,
    num_l_layers=2,
    num_pano_layers=1,
    num_x_layers=1,
    image_feat_size=24,
    obj_feat_size=0,
    bev_grid_feat_size=20,
    bev_dim=5,
    dtype="float32",
    max_position_embeddings=64,
)
TINY_OBJ = ModelConfig(**{**TINY.__dict__, "obj_feat_size": 28, "obj_prob_size": 10})
TINY_SHAPES = ShapeConfig(
    max_txt_len=24, max_steps=4, max_pano_len=10, max_gmap_len=12,
    max_local_len=8, max_objects=3, num_views=2, grid_hw=4, max_masked_tokens=6,
)
ALL_TASKS = ("mlm", "sap", "sem", "masksem", "mrc", "og")


def make_batch(with_objects=False, batch=2, seed=0):
    rng = np.random.default_rng(seed)
    model = TINY_OBJ if with_objects else TINY
    b = synthetic_pretrain_batch(
        rng, batch, TINY_SHAPES, model, with_objects=with_objects, raw_bev=False
    )
    # clamp synthetic token ids into the tiny vocab
    b["txt_ids"] = (b["txt_ids"] % 300).astype(np.int32)
    b["mlm_tgt"] = (b["mlm_tgt"] % 300).astype(np.int32)
    b["mlm_ids"] = (b["mlm_ids"] % 300).astype(np.int32)
    return b


@pytest.fixture(scope="module")
def pretrain_model_and_params():
    model = GlocalTextPathCMTPreTraining(TINY_OBJ, tasks=ALL_TASKS)
    batch = make_batch(with_objects=True)
    params = model.init(jax.random.key(0), batch, method=model.init_all)
    return model, params, batch


@pytest.mark.parametrize("task", ALL_TASKS)
def test_pretrain_tasks_run(pretrain_model_and_params, task):
    model, params, batch = pretrain_model_and_params
    b = dict(batch)
    if task == "mlm":
        b["txt_ids"] = b["mlm_ids"]
    loss, metrics = model.apply(params, b, task)
    assert np.isfinite(float(loss)), f"{task} loss not finite"
    assert float(loss) >= 0 or task == "mrc"  # kl can't be negative either
    for k, v in metrics.items():
        assert np.isfinite(float(v)), f"{task} metric {k} not finite"


def test_no_objects_variant():
    model = GlocalTextPathCMTPreTraining(TINY, tasks=("mlm", "sap", "masksem"))
    batch = make_batch(with_objects=False)
    params = model.init(jax.random.key(0), batch, method=model.init_all)
    for task in ("mlm", "sap", "masksem"):
        b = dict(batch)
        if task == "mlm":
            b["txt_ids"] = b["mlm_ids"]
        loss, _ = model.apply(params, b, task)
        assert np.isfinite(float(loss))


def perturb_padding(batch, rng):
    """Corrupt every padded slot: text beyond len, view/obj slots beyond lens,
    gmap nodes beyond len, local cand slots beyond count."""
    b = {k: np.array(v) for k, v in batch.items()}
    tm = b["txt_masks"]
    b["txt_ids"] = np.where(tm, b["txt_ids"], rng.integers(1, 300, tm.shape))
    V = b["traj_view_fts"].shape[2]
    slot = np.arange(V)[None, None, :]
    view_pad = slot >= b["traj_view_lens"][:, :, None]
    b["traj_view_fts"] = b["traj_view_fts"] + view_pad[..., None] * rng.normal(
        size=b["traj_view_fts"].shape
    ).astype(np.float32) * 7
    if "traj_obj_fts" in b:
        O = b["traj_obj_fts"].shape[2]
        obj_pad = np.arange(O)[None, None, :] >= b["traj_obj_lens"][:, :, None]
        b["traj_obj_fts"] = b["traj_obj_fts"] + obj_pad[..., None] * rng.normal(
            size=b["traj_obj_fts"].shape
        ).astype(np.float32) * 7
    gm = b["gmap_masks"]
    b["gmap_pos_fts"] = b["gmap_pos_fts"] + (~gm)[..., None] * 5.0
    b["gmap_step_ids"] = np.where(gm, b["gmap_step_ids"], 3)
    lm = b["local_masks"]
    b["bev_cand_idxs"] = np.where(lm, b["bev_cand_idxs"], 2)
    return b


@pytest.mark.parametrize("task", ["mlm", "sap", "og"])
def test_padding_invariance(pretrain_model_and_params, task):
    model, params, batch = pretrain_model_and_params
    rng = np.random.default_rng(7)
    b0 = dict(batch)
    b1 = perturb_padding(batch, rng)
    if task == "mlm":
        b0["txt_ids"] = b0["mlm_ids"]
        b1["txt_ids"] = np.where(
            np.array(batch["txt_masks"]), np.array(batch["mlm_ids"]), b1["txt_ids"]
        )
    l0, _ = model.apply(params, b0, task)
    l1, _ = model.apply(params, b1, task)
    np.testing.assert_allclose(float(l0), float(l1), rtol=2e-5)


@pytest.mark.slow
def test_dropout_rngs_change_loss(pretrain_model_and_params):
    model, params, batch = pretrain_model_and_params
    l0, _ = model.apply(
        params, batch, "sap", deterministic=False,
        rngs={"dropout": jax.random.key(1)},
    )
    l1, _ = model.apply(
        params, batch, "sap", deterministic=False,
        rngs={"dropout": jax.random.key(2)},
    )
    assert float(l0) != float(l1)


@pytest.mark.parametrize("mode", ["dots", "full"])
@pytest.mark.slow
def test_attn_remat_equivalence(pretrain_model_and_params, mode, monkeypatch):
    """VLN_BEVBERT_REMAT_ATTN must be numerics-transparent: loss and grads
    of a dropout-active step match the un-remat'd path (nn.remat replays the
    lifted dropout rng exactly, so the recomputed masks are identical; only
    fusion-order float noise is tolerated)."""
    model, params, batch = pretrain_model_and_params

    def loss_and_grads():
        def loss_fn(p):
            loss, _ = model.apply(p, batch, "sap", deterministic=False,
                                  rngs={"dropout": jax.random.key(3)})
            return loss

        return jax.value_and_grad(loss_fn)(params)

    monkeypatch.delenv("VLN_BEVBERT_REMAT_ATTN", raising=False)
    base_l, base_g = loss_and_grads()
    monkeypatch.setenv("VLN_BEVBERT_REMAT_ATTN", mode)
    l, g = loss_and_grads()
    np.testing.assert_allclose(float(l), float(base_l), rtol=1e-6)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-6),
        base_g, g,
    )


def test_nav_model_modes():
    cfg = TINY
    model = GlocalTextPathNavCMT(cfg)
    batch = make_batch(with_objects=False)
    B, L = batch["txt_ids"].shape
    N = batch["gmap_masks"].shape[1]
    C = cfg.num_bev_tokens
    K = batch["local_masks"].shape[1]
    D = cfg.hidden_size
    rng = np.random.default_rng(3)

    lang_in = {"txt_ids": batch["txt_ids"], "txt_masks": batch["txt_masks"]}
    pano_in = {
        "view_fts": batch["traj_view_fts"][:, 0],
        "loc_fts": batch["traj_loc_fts"][:, 0],
        "nav_types": batch["traj_nav_types"][:, 0],
        "view_lens": batch["traj_view_lens"][:, 0],
    }
    nav_in = {
        "txt_masks": batch["txt_masks"],
        "gmap_img_embeds": rng.normal(size=(B, N, D)).astype(np.float32),
        "gmap_step_ids": batch["gmap_step_ids"],
        "gmap_pos_fts": batch["gmap_pos_fts"],
        "gmap_masks": batch["gmap_masks"],
        "gmap_pair_dists": batch["gmap_pair_dists"],
        "gmap_visited_masks": batch["gmap_visited_masks"],
        "bev_fts": batch["bev_fts"],
        "bev_pos_fts": batch["bev_pos_fts"],
        "bev_masks": batch["bev_masks"],
        "bev_nav_masks": batch["bev_nav_masks"],
        "bev_cand_idxs": batch["bev_cand_idxs"],
        "local_masks": batch["local_masks"],
        "fuse_map": batch["fuse_map"],
    }

    params = model.init(jax.random.key(0), "language", lang_in)
    txt_embeds = model.apply(params, "language", lang_in)
    assert txt_embeds.shape == (B, L, D)

    params_p = model.init(jax.random.key(0), "panorama", pano_in)
    pano_embeds, pano_masks = model.apply(params_p, "panorama", pano_in)
    assert pano_embeds.shape[0] == B and pano_masks.dtype == bool

    nav_in["txt_embeds"] = np.asarray(txt_embeds)
    params_n = model.init(jax.random.key(0), "navigation", nav_in)
    outs = model.apply(params_n, "navigation", nav_in)
    assert outs["global_logits"].shape == (B, N)
    assert outs["local_logits"].shape == (B, K)
    assert outs["fused_logits"].shape == (B, N)
    # masked positions are at NEG_INF
    gl = np.asarray(outs["global_logits"])
    assert (gl[~np.array(batch["gmap_masks"])] <= -9999).all()
    assert (gl[np.array(batch["gmap_visited_masks"])] <= -9999).all()
    # fused logits add local stop logit onto global stop
    ll = np.asarray(outs["local_logits"])
    fl = np.asarray(outs["fused_logits"])
    np.testing.assert_allclose(fl[:, 0], gl[:, 0] + ll[:, 0], rtol=1e-4)


def test_fuse_map_matches_loop(pretrain_model_and_params):
    """The einsum fusion must equal the reference's per-sample loop semantics:
    fused[j] = global[j] + sum_k fuse_map[j,k] * local[k]."""
    model, params, batch = pretrain_model_and_params
    g, l, f = model.apply(params, batch, method=model.sap_logits)
    g, l, f = np.asarray(g), np.asarray(l), np.asarray(f)
    fm = np.array(batch["fuse_map"])
    lm = np.array(batch["local_masks"])
    B, N = g.shape
    for b in range(B):
        for j in range(N):
            acc = g[b, j]
            for k in range(fm.shape[2]):
                if fm[b, j, k] and lm[b, k]:
                    acc += l[b, k]
            np.testing.assert_allclose(f[b, j], acc, rtol=1e-4, atol=1e-4)
