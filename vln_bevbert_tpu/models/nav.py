"""Navigation-time model for discrete-environment fine-tuning.

Re-design of /root/reference/map_nav_src/models/vilmodel.py:705-912
(GlocalTextPathNavCMT): a mode-dispatched per-step model — 'language' once per
episode, 'panorama' and 'navigation' once per action step.

Unlike the reference (which flattens the pretrained ``bert.*`` namespace into
the nav model via checkpoint surgery, map_nav_src/models/vlnbert_init.py:20-46),
this model *contains* the pretraining backbone as the ``bert`` submodule, so
pretrain -> finetune weight transfer is the identity on the shared subtree and
only the task heads are new.

The fused-logits backtracking loop (vilmodel.py:852-871) is the same
host-precomputed ``fuse_map`` contraction used in pretraining.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.dropout import Dropout
from ..configs import ModelConfig
from ..ops.masking import masked_fill_neg
from .bert import TwoLayerHead, _dt
from .glocal import GlocalTextPathCMT, gather_tokens

Batch = Dict[str, Any]


class Critic(nn.Module):
    """State-value head (ref map_nav_src/models/model.py:41-55 — constructed
    by the reference agent for RL fine-tuning; unused under pure IL)."""

    cfg: ModelConfig
    dropout: float = 0.5

    @nn.compact
    def __call__(self, state, *, deterministic: bool = True):
        from .bert import dense

        x = Dropout(self.dropout)(state, deterministic=deterministic)
        x = nn.relu(dense(self.cfg, 512, name="fc1")(x))
        x = Dropout(self.dropout)(x, deterministic=deterministic)
        return dense(self.cfg, 1, name="fc2")(x)[..., 0]


class GlocalTextPathNavCMT(nn.Module):
    cfg: ModelConfig

    def setup(self):
        cfg = self.cfg
        self.bert = GlocalTextPathCMT(cfg, name="bert")
        self.global_sap_head = TwoLayerHead(cfg, 1, name="global_sap_head")
        self.local_sap_head = TwoLayerHead(cfg, 1, name="local_sap_head")
        if cfg.glocal_fuse:
            self.sap_fuse_linear = TwoLayerHead(cfg, 1, name="sap_fuse_linear")
        else:
            self.sap_fuse_linear = None
        if cfg.obj_feat_size > 0:
            self.og_head = TwoLayerHead(cfg, 1, name="og_head")

    # ---------------------------------------------------------------- modes
    def forward_text(self, txt_ids, txt_masks, *, deterministic=True):
        return self.bert.encode_text(txt_ids, txt_masks, deterministic=deterministic)

    def forward_panorama_per_step(
        self, view_fts, loc_fts, nav_types, view_lens,
        obj_fts=None, obj_lens=None, dep_fts=None, *, deterministic=True,
    ):
        """Single-step pano encoding (B, V/P, ...) -> (pano_embeds, pano_masks)
        (ref vilmodel.py:750-794; CE adds the depth embedding,
        vilmodel_cmt.py:737-743)."""
        return self.bert.img_embeddings(
            view_fts, loc_fts, nav_types, view_lens,
            obj_fts=obj_fts, obj_lens=obj_lens, dep_fts=dep_fts,
            token_type_vis=self.bert.embeddings.token_type_embeddings.embedding[1],
            deterministic=deterministic,
        )

    def forward_navigation_per_step(self, batch: Batch, *, deterministic=True):
        """(ref vilmodel.py:803-887). Batch keys:

        txt_embeds (B,L,D), txt_masks, gmap_img_embeds (B,N,D), gmap_step_ids,
        gmap_pos_fts, gmap_masks, gmap_pair_dists, gmap_visited_masks,
        bev_fts (B,C,768), bev_pos_fts, bev_masks, bev_nav_masks,
        bev_cand_idxs (B,K), local_masks (B,K), fuse_map (B,N,K),
        obj_embeds (B,O,D)?, obj_masks?
        """
        cfg = self.cfg
        txt_embeds = batch["txt_embeds"]
        txt_masks = batch["txt_masks"]

        gmap_embeds = self.bert.global_encoder(
            txt_embeds, txt_masks,
            batch["gmap_img_embeds"], batch["gmap_step_ids"],
            batch["gmap_pos_fts"], batch["gmap_masks"],
            batch["gmap_pair_dists"], deterministic=deterministic,
        )

        if not cfg.use_bev:
            # topo-only ETP navigation (etp/vilmodel_cmt.py:721-751): global
            # branch only; no local encoder, no fusion weight, logits are the
            # global SAP head with visited/padding fills
            global_logits = self.global_sap_head(gmap_embeds)[..., 0]
            global_logits = masked_fill_neg(
                global_logits, batch["gmap_visited_masks"]
            )
            global_logits = masked_fill_neg(global_logits, ~batch["gmap_masks"])
            return {
                "gmap_embeds": gmap_embeds,
                "global_logits": global_logits,
                "fused_logits": global_logits,
                "local_logits": None,
                "bev_embeds": None,
                "obj_logits": None,
                "fuse_weights": 1.0,
            }

        bev_embeds, obj_embeds = self.bert.local_encoder(
            txt_embeds, txt_masks,
            batch["bev_fts"], batch["bev_pos_fts"],
            batch["bev_masks"], batch["bev_nav_masks"],
            batch.get("obj_embeds"), batch.get("obj_masks"),
            deterministic=deterministic,
        )

        if self.sap_fuse_linear is None:
            fuse_weights = 0.5
        else:
            fuse_weights = jax.nn.sigmoid(
                self.sap_fuse_linear(
                    jnp.concatenate(
                        [gmap_embeds[:, 0], bev_embeds[:, cfg.bev_center]], -1
                    )
                )
            )

        global_logits = self.global_sap_head(gmap_embeds)[..., 0] * fuse_weights
        global_logits = masked_fill_neg(global_logits, batch["gmap_visited_masks"])
        global_logits = masked_fill_neg(global_logits, ~batch["gmap_masks"])

        cand_embeds = gather_tokens(bev_embeds, batch["bev_cand_idxs"])
        local_logits = self.local_sap_head(cand_embeds)[..., 0] * (1.0 - fuse_weights)
        local_logits = masked_fill_neg(local_logits, ~batch["local_masks"])

        local_safe = jnp.where(batch["local_masks"], local_logits, 0.0)
        fused_logits = global_logits + jnp.einsum(
            "bnk,bk->bn", batch["fuse_map"].astype(jnp.float32), local_safe
        )

        obj_logits = None
        if obj_embeds is not None and self.cfg.obj_feat_size > 0:
            obj_logits = self.og_head(obj_embeds)[..., 0]
            obj_logits = masked_fill_neg(obj_logits, ~batch["obj_masks"])

        return {
            "gmap_embeds": gmap_embeds,
            "bev_embeds": bev_embeds,
            "global_logits": global_logits,
            "local_logits": local_logits,
            "fused_logits": fused_logits,
            "obj_logits": obj_logits,
            "fuse_weights": fuse_weights,
        }

    def __call__(self, mode: str, batch: Batch, *, deterministic=True):
        if mode == "language":
            return self.forward_text(
                batch["txt_ids"], batch["txt_masks"], deterministic=deterministic
            )
        if mode == "panorama":
            return self.forward_panorama_per_step(
                batch["view_fts"], batch["loc_fts"], batch["nav_types"],
                batch["view_lens"], batch.get("obj_fts"), batch.get("obj_lens"),
                batch.get("dep_fts"), deterministic=deterministic,
            )
        if mode == "navigation":
            return self.forward_navigation_per_step(batch, deterministic=deterministic)
        raise ValueError(f"unknown mode: {mode}")
