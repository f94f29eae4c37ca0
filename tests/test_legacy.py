"""CE legacy policies: topo-only ETP navigation and Recurrent VLN-BERT
(PREVALENT).

Covers VERDICT r1 item 6: the true ETP model (global-branch-only navigation,
ref bevbert_ce/vlnce_baselines/models/etp/vilmodel_cmt.py:721-751) wired
through the CE agent, and the PREVALENT policy
(models/vlnbert/vlnbert_PREVALENT.py:291-447) with its state-token
recurrence, checked against an independent float64 numpy replica of the
reference's torch forward.
"""

import dataclasses

import jax
import numpy as np
import pytest

from vln_bevbert_tpu.configs import FinetuneConfig, ModelConfig, ShapeConfig
from vln_bevbert_tpu.models.legacy import RecurrentVLNBert, prevalent_to_tree

TINY = ModelConfig(
    vocab_size=30522, hidden_size=32, num_attention_heads=2, intermediate_size=64,
    num_l_layers=1, num_pano_layers=1, num_x_layers=1, image_feat_size=16,
    obj_feat_size=0, bev_grid_feat_size=12, bev_dim=5, bev_res=1.5,
    dtype="float32",
)
SHAPES = ShapeConfig(
    max_txt_len=64, max_steps=5, max_pano_len=20, max_gmap_len=16,
    max_local_len=8, max_objects=0, num_views=12, grid_hw=4, max_pc_steps=3,
)


# ------------------------------------------------------------------- ETP


@pytest.fixture(scope="module")
def etp_world():
    from vln_bevbert_tpu.ce.agent import CEAgent
    from vln_bevbert_tpu.ce.env import (
        SyntheticContinuousEnv,
        make_synthetic_ce_episodes,
    )

    rng = np.random.default_rng(5)
    episodes = make_synthetic_ce_episodes(rng, n=6)
    env = SyntheticContinuousEnv(
        episodes, batch_size=2, num_views=12, grid_hw=4,
        grid_feat_size=TINY.bev_grid_feat_size,
        view_feat_size=TINY.image_feat_size,
        depth_feat_shape=(4, 2, 2),
    )
    model = dataclasses.replace(TINY, use_bev=False)
    cfg = FinetuneConfig(model=model, shapes=SHAPES, batch_size=2,
                         max_action_len=4, learning_rate=1e-3,
                         fusion="global")
    agent = CEAgent(cfg, env)
    agent.init_params()
    return env, agent


def test_etp_param_tree_has_no_bev_branch(etp_world):
    _, agent = etp_world
    bert = agent.params["bert"]
    assert "local_encoder" not in bert
    assert "global_encoder" in bert
    assert "local_sap_head" not in agent.params
    assert "sap_fuse_linear" not in agent.params


@pytest.mark.slow
def test_etp_rollout_and_replay(etp_world):
    env, agent = etp_world
    trajs, loss = agent.rollout(feedback="teacher", train=True)
    assert loss is not None and np.isfinite(loss)
    metrics = agent.evaluate(num_batches=1)
    assert np.isfinite(metrics["success"])


def test_etp_global_logits_are_fused_logits():
    from vln_bevbert_tpu.models.nav import GlocalTextPathNavCMT

    model = GlocalTextPathNavCMT(dataclasses.replace(TINY, use_bev=False))
    B, N, L, D = 2, 6, 8, TINY.hidden_size
    batch = {
        "txt_embeds": np.random.default_rng(0).normal(size=(B, L, D)).astype(np.float32),
        "txt_masks": np.ones((B, L), bool),
        "gmap_img_embeds": np.zeros((B, N, D), np.float32),
        "gmap_step_ids": np.zeros((B, N), np.int32),
        "gmap_pos_fts": np.zeros((B, N, TINY.angle_feat_size + 3), np.float32),
        "gmap_masks": np.ones((B, N), bool),
        "gmap_pair_dists": np.zeros((B, N, N), np.float32),
        "gmap_visited_masks": np.zeros((B, N), bool),
    }
    params = model.init(jax.random.key(0), "navigation", batch)
    outs = model.apply(params, "navigation", batch)
    np.testing.assert_array_equal(
        np.asarray(outs["fused_logits"]), np.asarray(outs["global_logits"])
    )
    assert outs["local_logits"] is None and outs["bev_embeds"] is None


# -------------------------------------------------------------- PREVALENT


def _np_linear(sd, prefix, x):
    return x @ sd[f"{prefix}.weight"].T + sd[f"{prefix}.bias"]


def _np_ln(sd, prefix, x, eps=1e-12):
    mu = x.mean(-1, keepdims=True)
    var = ((x - mu) ** 2).mean(-1, keepdims=True)
    return (x - mu) / np.sqrt(var + eps) * sd[f"{prefix}.weight"] + sd[f"{prefix}.bias"]


def _np_softmax(x):
    e = np.exp(x - x.max(-1, keepdims=True))
    return e / e.sum(-1, keepdims=True)


def _np_gelu(x):
    from scipy.special import erf

    return x * 0.5 * (1.0 + erf(x / np.sqrt(2.0)))


def _np_mha(sd, prefix, q_in, kv_in, bias, heads):
    """Multi-head attention with {prefix}.{query,key,value} torch weights;
    returns (context, pre-softmax scores)."""
    b, lq, d = q_in.shape
    hd = d // heads

    def split(x):
        return x.reshape(b, -1, heads, hd).transpose(0, 2, 1, 3)

    q = split(_np_linear(sd, f"{prefix}.query", q_in))
    k = split(_np_linear(sd, f"{prefix}.key", kv_in))
    v = split(_np_linear(sd, f"{prefix}.value", kv_in))
    scores = q @ k.transpose(0, 1, 3, 2) / np.sqrt(hd)
    if bias is not None:
        scores = scores + bias
    ctx = _np_softmax(scores) @ v
    ctx = ctx.transpose(0, 2, 1, 3).reshape(b, lq, d)
    return ctx, scores


def _np_attention_block(sd, att_prefix, out_prefix, q_in, kv_in, bias, heads):
    ctx, scores = _np_mha(sd, att_prefix, q_in, kv_in, bias, heads)
    out = _np_linear(sd, f"{out_prefix}.dense", ctx)
    return _np_ln(sd, f"{out_prefix}.LayerNorm", out + q_in), scores


def _np_prevalent_visual(sd, lang, lang_mask, visn, vis_mask, vl_layers, heads):
    """Reference LXRTXLayer stack + pooler (vlnbert_PREVALENT.py:322-447)."""
    lang_bias = ((1.0 - lang_mask) * -10000.0)[:, None, None, :]
    vis_bias = ((1.0 - vis_mask) * -10000.0)[:, None, None, :]
    for i in range(vl_layers):
        p = f"addlayer.{i}"
        state_vis = np.concatenate([lang[:, :1], visn], axis=1)
        sv_bias = np.concatenate([lang_bias[..., :1], vis_bias], axis=-1)
        x, _ = _np_attention_block(
            sd, f"{p}.visual_attention.att", f"{p}.visual_attention.output",
            state_vis, lang[:, 1:], lang_bias[..., 1:], heads,
        )
        x, self_scores = _np_attention_block(
            sd, f"{p}.visn_self_att.self", f"{p}.visn_self_att.output",
            x, x, sv_bias, heads,
        )
        y = _np_gelu(_np_linear(sd, f"{p}.visn_inter.dense", x))
        y = _np_linear(sd, f"{p}.visn_output.dense", y)
        x = _np_ln(sd, f"{p}.visn_output.LayerNorm", y + x)
        visn = x[:, 1:]
        lang = np.concatenate([x[:, :1], lang[:, 1:]], axis=1)
        visual_scores = self_scores[:, :, 0, 1:]
    h_t = np.tanh(_np_linear(sd, "pooler.dense", lang[:, 0]))
    return h_t, visual_scores.mean(axis=1)


def _random_torch_sd(rng, cfg, la_layers, vl_layers):
    """Random PREVALENT torch-layout state dict (numpy tensors)."""
    d, inter, vocab = cfg.hidden_size, cfg.intermediate_size, cfg.vocab_size
    sd = {}

    def lin(prefix, dout, din):
        sd[f"{prefix}.weight"] = rng.normal(0, 0.08, (dout, din)).astype(np.float64)
        sd[f"{prefix}.bias"] = rng.normal(0, 0.02, dout).astype(np.float64)

    def ln(prefix):
        sd[f"{prefix}.weight"] = rng.uniform(0.7, 1.3, d).astype(np.float64)
        sd[f"{prefix}.bias"] = rng.normal(0, 0.02, d).astype(np.float64)

    sd["embeddings.word_embeddings.weight"] = rng.normal(0, 0.08, (vocab, d))
    sd["embeddings.position_embeddings.weight"] = rng.normal(
        0, 0.08, (cfg.max_position_embeddings, d))
    sd["embeddings.token_type_embeddings.weight"] = rng.normal(0, 0.08, (2, d))
    ln("embeddings.LayerNorm")
    lin("pooler.dense", d, d)
    for i in range(la_layers):
        p = f"lalayer.{i}"
        for n in ("query", "key", "value"):
            lin(f"{p}.attention.self.{n}", d, d)
        lin(f"{p}.attention.output.dense", d, d)
        ln(f"{p}.attention.output.LayerNorm")
        lin(f"{p}.intermediate.dense", inter, d)
        lin(f"{p}.output.dense", d, inter)
        ln(f"{p}.output.LayerNorm")
    for i in range(vl_layers):
        p = f"addlayer.{i}"
        for n in ("query", "key", "value"):
            lin(f"{p}.visual_attention.att.{n}", d, d)
            lin(f"{p}.visn_self_att.self.{n}", d, d)
            # unused language branch entries must be ignored by the remapper
            lin(f"{p}.lang_self_att.self.{n}", d, d)
        lin(f"{p}.visual_attention.output.dense", d, d)
        ln(f"{p}.visual_attention.output.LayerNorm")
        lin(f"{p}.visn_self_att.output.dense", d, d)
        ln(f"{p}.visn_self_att.output.LayerNorm")
        lin(f"{p}.visn_inter.dense", inter, d)
        lin(f"{p}.visn_output.dense", d, inter)
        ln(f"{p}.visn_output.LayerNorm")
    return sd


def test_prevalent_visual_parity_and_recurrence():
    cfg = dataclasses.replace(TINY, vocab_size=64)  # ids drawn below stay < 64
    la, vl = 2, 2
    rng = np.random.default_rng(7)
    sd = _random_torch_sd(rng, cfg, la, vl)
    tree = prevalent_to_tree(sd, la_layers=la, vl_layers=vl)

    model = RecurrentVLNBert(cfg, la_layers=la, vl_layers=vl)
    B, L, V = 2, 7, 4
    txt_ids = rng.integers(0, 64, (B, L)).astype(np.int32)
    txt_masks = np.ones((B, L), bool)
    txt_masks[1, 5:] = False
    h_t, lang_embeds = model.apply(
        {"params": tree}, "language", {"txt_ids": txt_ids, "txt_masks": txt_masks}
    )
    assert h_t.shape == (B, cfg.hidden_size)

    img_feats = rng.normal(0, 1, (B, V, cfg.hidden_size)).astype(np.float32)
    vis_masks = np.ones((B, V), bool)
    vis_masks[0, 3:] = False

    # recurrent step: substitute h_t into slot 0 (base_il_trainer.py:455-456)
    lang_np = np.array(lang_embeds)
    lang_np[:, 0] = np.asarray(h_t)
    h_t1, scores1 = model.apply(
        {"params": tree}, "visual",
        {"lang_embeds": lang_np, "txt_masks": txt_masks,
         "img_feats": img_feats, "vis_masks": vis_masks},
    )
    assert scores1.shape == (B, V)
    # masked candidates are strongly suppressed (additive -10000 bias)
    assert np.asarray(scores1)[0, 3:].max() < -100

    # numpy replica of the reference torch forward
    h_ref, scores_ref = _np_prevalent_visual(
        sd, lang_np.astype(np.float64), txt_masks.astype(np.float64),
        img_feats.astype(np.float64), vis_masks.astype(np.float64),
        vl, cfg.num_attention_heads,
    )
    np.testing.assert_allclose(np.asarray(h_t1), h_ref, atol=2e-4)
    np.testing.assert_allclose(np.asarray(scores1), scores_ref, atol=2e-3)

    # recurrence: a different state token changes the next action scores
    lang_np2 = lang_np.copy()
    lang_np2[:, 0] = np.asarray(h_t1)
    h_t2, scores2 = model.apply(
        {"params": tree}, "visual",
        {"lang_embeds": lang_np2, "txt_masks": txt_masks,
         "img_feats": img_feats, "vis_masks": vis_masks},
    )
    assert not np.allclose(np.asarray(scores2)[0, :3], np.asarray(scores1)[0, :3])
