"""Modality encoders: language, panorama, global topological map, local BEV.

Re-designs of /root/reference/pretrain_src/model/vilmodel.py:424-700 with
every ragged structure replaced by static slots + masks:

- panorama tokens live in fixed slots [0:V) views, [V:V+O) objects — valid
  because pano attention has no positional encoding (location features carry
  geometry), so token order is irrelevant under masking;
- the per-sample python dict aggregation of global-map node features
  (_aggregate_gmap_features, vilmodel.py:632-666) becomes a host-precomputed
  (nodes x trajectory-tokens) weight matrix contracted on the MXU.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.dropout import Dropout
from ..configs import ModelConfig
from ..ops.masking import attn_bias
from .bert import (
    BertLayer,
    BertXLayer,
    PanoEncoderLayer,
    _dt,
    dense,
    embed,
    layer_norm,
)


class LanguageEncoder(nn.Module):
    """num_l_layers post-norm BERT layers (vilmodel.py:424-444)."""

    cfg: ModelConfig

    @nn.compact
    def __call__(self, txt_embeds, txt_masks, *, deterministic: bool = True):
        bias = attn_bias(txt_masks)
        for i in range(self.cfg.num_l_layers):
            txt_embeds = BertLayer(self.cfg, name=f"layer_{i}")(
                txt_embeds, bias, deterministic=deterministic
            )
        if not self.cfg.update_lang_bert:
            txt_embeds = jax.lax.stop_gradient(txt_embeds)
        return txt_embeds


class ImageEmbeddings(nn.Module):
    """Panorama token embedding + 2-layer pre-norm encoder
    (vilmodel.py:465-536).

    Static-slot layout per step: ``[view_0..view_{V-1} | obj_0..obj_{O-1}]``.
    Inputs are flattened over (batch, step): shapes (R, V, Dimg) etc. where
    R = batch * max_steps. ``token_type_vis`` is the visual token-type vector
    (hidden,) taken from the shared BertEmbeddings table (type id 1).
    """

    cfg: ModelConfig

    def setup(self):
        cfg = self.cfg
        self.img_linear = dense(cfg, cfg.hidden_size, name="img_linear")
        self.img_ln = layer_norm(cfg, name="img_ln")
        self.loc_linear = dense(cfg, cfg.hidden_size, name="loc_linear")
        self.loc_ln = layer_norm(cfg, name="loc_ln")
        if cfg.obj_feat_size > 0 and cfg.obj_feat_size != cfg.image_feat_size:
            self.obj_linear = dense(cfg, cfg.hidden_size, name="obj_linear")
            self.obj_ln = layer_norm(cfg, name="obj_ln")
        else:
            self.obj_linear = None
        # 0: non-navigable view, 1: navigable view, 2: object
        self.nav_type_embedding = embed(cfg, 3, name="nav_type_embedding")
        if cfg.use_depth_embedding:
            # CE variant: 128-d DDPPO depth features added per token
            # (ref bevbert_ce/vlnce_baselines/models/bev/vilmodel_cmt.py:462-466)
            self.dep_linear = dense(cfg, cfg.hidden_size, name="dep_linear")
            self.dep_ln = layer_norm(cfg, name="dep_ln")
        else:
            self.dep_linear = None
        self.ln = layer_norm(cfg, name="ln")
        self.dropout = Dropout(cfg.hidden_dropout_prob)
        self.pano_layers = [
            PanoEncoderLayer(cfg, name=f"pano_layer_{i}")
            for i in range(cfg.num_pano_layers)
        ]
        self.pano_ln = layer_norm(cfg, name="pano_ln")

    def __call__(
        self,
        view_fts,          # (R, V, Dimg)
        loc_fts,           # (R, V+O, angle_feat+3)
        nav_types,         # (R, V+O) int
        view_lens,         # (R,)
        obj_fts=None,      # (R, O, Dobj)
        obj_lens=None,     # (R,)
        dep_fts=None,      # (R, V+O, Ddep) CE depth embedding input
        token_type_vis=None,  # (hidden,)
        *,
        deterministic: bool = True,
    ):
        cfg = self.cfg
        view_embeds = self.img_ln(self.img_linear(view_fts)).astype(_dt(cfg))
        if obj_fts is not None:
            if self.obj_linear is None:
                obj_embeds = self.img_ln(self.img_linear(obj_fts)).astype(_dt(cfg))
            else:
                obj_embeds = self.obj_ln(self.obj_linear(obj_fts)).astype(_dt(cfg))
            img_embeds = jnp.concatenate([view_embeds, obj_embeds], axis=1)
        else:
            img_embeds = view_embeds

        x = (
            img_embeds
            + self.loc_ln(self.loc_linear(loc_fts)).astype(_dt(cfg))
            + self.nav_type_embedding(nav_types)
        )
        if self.dep_linear is not None and dep_fts is not None:
            x = x + self.dep_ln(self.dep_linear(dep_fts)).astype(_dt(cfg))
        if token_type_vis is not None:
            x = x + token_type_vis.astype(_dt(cfg))[None, None, :]
        x = self.ln(x).astype(_dt(cfg))
        x = self.dropout(x, deterministic=deterministic)

        num_view = view_fts.shape[1]
        slot = jnp.arange(x.shape[1])[None, :]
        masks = slot < view_lens[:, None]
        if obj_fts is not None:
            masks = masks | (
                (slot >= num_view) & ((slot - num_view) < obj_lens[:, None])
            )

        bias = attn_bias(masks)
        for layer in self.pano_layers:
            x = layer(x, bias, deterministic=deterministic)
        x = self.pano_ln(x).astype(_dt(cfg))
        return x, masks


class GlobalMapEncoder(nn.Module):
    """Topological-map encoder: node features + step/pos embeddings, 4
    cross-modal layers with a learned pairwise-distance attention bias
    (vilmodel.py:617-700)."""

    cfg: ModelConfig

    def setup(self):
        cfg = self.cfg
        self.pos_linear = dense(cfg, cfg.hidden_size, name="pos_linear")
        self.pos_ln = layer_norm(cfg, name="pos_ln")
        self.step_embedding = embed(cfg, cfg.max_action_steps, name="step_embedding")
        self.x_layers = [
            BertXLayer(cfg, name=f"x_layer_{i}") for i in range(cfg.num_x_layers)
        ]
        if cfg.graph_sprels:
            # 1->1 linear on the pairwise distances (sprel_linear,
            # vilmodel.py:628-630,691-693)
            self.sprel_kernel = dense(cfg, 1, name="sprel_linear")
        else:
            self.sprel_kernel = None

    def input_embedding(self, gmap_img_fts, gmap_step_ids, gmap_pos_fts):
        cfg = self.cfg
        return (
            gmap_img_fts.astype(_dt(cfg))
            + self.step_embedding(gmap_step_ids)
            + self.pos_ln(self.pos_linear(gmap_pos_fts)).astype(_dt(cfg))
        )

    def sprel_bias(self, gmap_pair_dists):
        if self.sprel_kernel is None:
            return None
        b = self.sprel_kernel(gmap_pair_dists[..., None].astype(_dt(self.cfg)))
        return b[..., 0][:, None, :, :].astype(jnp.float32)  # (B, 1, N, N)

    def __call__(
        self,
        txt_embeds,
        txt_masks,
        gmap_img_fts,
        gmap_step_ids,
        gmap_pos_fts,
        gmap_masks,
        gmap_pair_dists=None,
        *,
        deterministic: bool = True,
    ):
        x = self.input_embedding(gmap_img_fts, gmap_step_ids, gmap_pos_fts)
        lang_bias = attn_bias(txt_masks)
        visn_bias = attn_bias(gmap_masks)
        sprel = self.sprel_bias(gmap_pair_dists)
        for layer in self.x_layers:
            x = layer(x, txt_embeds, lang_bias, visn_bias, sprel,
                      deterministic=deterministic)
        return x


class LocalBEVEncoder(nn.Module):
    """Metric-map encoder over bev_dim^2 cell tokens (+ optional object
    tokens appended), 4 cross-modal layers (vilmodel.py:572-615)."""

    cfg: ModelConfig

    def setup(self):
        cfg = self.cfg
        self.fts_linear = dense(cfg, cfg.hidden_size, name="fts_linear")
        self.fts_ln = layer_norm(cfg, name="fts_ln")
        self.pos_linear = dense(cfg, cfg.hidden_size, name="pos_linear")
        self.pos_ln = layer_norm(cfg, name="pos_ln")
        # 0: non-navigable cell, 1: candidate cell
        self.nav_type_embedding = embed(cfg, 2, name="nav_type_embedding")
        self.x_layers = [
            BertXLayer(cfg, name=f"x_layer_{i}") for i in range(cfg.num_x_layers)
        ]

    def input_embedding(self, bev_fts, bev_pos_fts, bev_nav_masks):
        cfg = self.cfg
        return (
            self.fts_ln(self.fts_linear(bev_fts.astype(_dt(cfg)))).astype(_dt(cfg))
            + self.pos_ln(self.pos_linear(bev_pos_fts)).astype(_dt(cfg))
            + self.nav_type_embedding(bev_nav_masks.astype(jnp.int32))
        )

    def __call__(
        self,
        txt_embeds,
        txt_masks,
        bev_fts,
        bev_pos_fts,
        bev_masks,
        bev_nav_masks,
        obj_embeds=None,
        obj_masks=None,
        *,
        deterministic: bool = True,
    ) -> Tuple[jnp.ndarray, Optional[jnp.ndarray]]:
        x = self.input_embedding(bev_fts, bev_pos_fts, bev_nav_masks)
        if obj_embeds is not None:
            x = jnp.concatenate([x, obj_embeds.astype(_dt(self.cfg))], axis=1)
            masks = jnp.concatenate([bev_masks, obj_masks], axis=1)
        else:
            masks = bev_masks

        lang_bias = attn_bias(txt_masks)
        visn_bias = attn_bias(masks)
        for layer in self.x_layers:
            x = layer(x, txt_embeds, lang_bias, visn_bias,
                      deterministic=deterministic)

        n_cells = self.cfg.num_bev_tokens
        bev_out = x[:, :n_cells]
        obj_out = x[:, n_cells:] if obj_embeds is not None else None
        return bev_out, obj_out
