"""The glocal (global topo-map + local BEV-map) cross-modal model and its
pretraining heads.

Re-design of /root/reference/pretrain_src/model/vilmodel.py:703-882 and
pretrain_src/model/pretrain_cmt.py:73-441 with every per-sample Python loop
replaced by a host-precomputed index/weight tensor:

- global-map node aggregation -> ``gmap_agg`` (B, N, T*P) weight matrix;
- the SAP fused-logits backtracking loop (pretrain_cmt.py:339-356) ->
  ``fuse_map`` (B, N, K) 0/1 matrix mapping local candidate logits onto
  global nodes (row 0 maps local [stop] onto global [stop]; unvisited rows
  select their candidate column; rows for nodes not among the current
  candidates carry 1s on every *visited* candidate column — the "backtrack"
  sum);
- MLM's dynamic masked-position gather -> fixed-width ``mlm_pos/mlm_valid``.

Batch key contract (all static shapes; built by data/tasks.py):

  txt_ids (B,L) i32         txt_masks (B,L) bool
  traj_view_fts (B,T,V,Di)  traj_loc_fts (B,T,P,A+3)   traj_nav_types (B,T,P)
  traj_view_lens (B,T)      traj_obj_fts (B,T,O,Do)?   traj_obj_lens (B,T)?
  traj_last_step (B,) i32   gmap_agg (B,N,T*P)
  gmap_step_ids (B,N)       gmap_pos_fts (B,N,A+3)     gmap_masks (B,N) bool
  gmap_visited_masks (B,N)  gmap_pair_dists (B,N,N)
  bev_fts (B,C,768)         bev_pos_fts (B,C,A+3+3)    bev_masks (B,C) bool
  bev_nav_masks (B,C) bool  bev_cand_idxs (B,K) i32    local_masks (B,K) bool
  fuse_map (B,N,K)
  + per-task labels (mlm_pos/mlm_valid/mlm_tgt, global_act_labels,
    local_act_labels, bev_sems, bev_sem_masks, bev_mrc_masks,
    obj_mrc_masks, obj_probs, obj_labels)

where P = V + O (object slots appended to view slots; O may be 0).
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.dropout import Dropout
from ..configs import ModelConfig
from ..ops.masking import attn_bias, masked_fill_neg
from .bert import BertEmbeddings, MlmHead, TwoLayerHead, _dt
from .encoders import (
    GlobalMapEncoder,
    ImageEmbeddings,
    LanguageEncoder,
    LocalBEVEncoder,
)

Batch = Dict[str, Any]


def gather_tokens(x: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """x: (B, L, D), idx: (B, M) -> (B, M, D)."""
    return jnp.take_along_axis(x, idx[:, :, None], axis=1)


class GlocalTextPathCMT(nn.Module):
    """Backbone: text encoder + pano encoder + global/local map encoders
    (ref vilmodel.py:703-765)."""

    cfg: ModelConfig

    def setup(self):
        cfg = self.cfg
        self.embeddings = BertEmbeddings(cfg, name="embeddings")
        self.lang_encoder = LanguageEncoder(cfg, name="lang_encoder")
        self.img_embeddings = ImageEmbeddings(cfg, name="img_embeddings")
        self.local_encoder = LocalBEVEncoder(cfg, name="local_encoder")
        self.global_encoder = GlobalMapEncoder(cfg, name="global_encoder")

    # --------------------------------------------------------------- language
    def encode_text(self, txt_ids, txt_masks, *, deterministic=True):
        x = self.embeddings(txt_ids, deterministic=deterministic)
        return self.lang_encoder(x, txt_masks, deterministic=deterministic)

    # --------------------------------------------------------------- panorama
    def encode_pano(self, batch: Batch, *, deterministic=True):
        """Returns (pano_embeds (B, T, P, D), pano_masks (B, T, P))."""
        vf = batch["traj_view_fts"]
        b, t = vf.shape[:2]
        flat = lambda x: x.reshape(b * t, *x.shape[2:])
        obj_fts = batch.get("traj_obj_fts")
        x, masks = self.img_embeddings(
            flat(vf),
            flat(batch["traj_loc_fts"]),
            flat(batch["traj_nav_types"]),
            flat(batch["traj_view_lens"]),
            obj_fts=flat(obj_fts) if obj_fts is not None else None,
            obj_lens=flat(batch["traj_obj_lens"]) if obj_fts is not None else None,
            token_type_vis=self.embeddings.token_type_embeddings.embedding[1],
            deterministic=deterministic,
        )
        p = x.shape[1]
        return x.reshape(b, t, p, -1), masks.reshape(b, t, p)

    # ------------------------------------------------------------- aggregation
    def aggregate_gmap(self, pano_embeds, pano_masks, gmap_agg):
        """Node features = host-weighted sums of trajectory tokens.
        pano_embeds: (B, T, P, D); gmap_agg: (B, N, T*P). The weight matrix
        already encodes visited-node means / unvisited-sighting means and a
        zero row for [stop] (ref _aggregate_gmap_features vilmodel.py:632-666).
        """
        b, t, p, d = pano_embeds.shape
        tokens = (pano_embeds * pano_masks[..., None]).reshape(b, t * p, d)
        return jnp.einsum(
            "bnm,bmd->bnd", gmap_agg.astype(_dt(self.cfg)), tokens,
            preferred_element_type=jnp.float32,
        ).astype(_dt(self.cfg))

    # ------------------------------------------------------------ obj tokens
    def extract_obj_embeds(self, pano_embeds, batch: Batch):
        """Object tokens of the final step: fixed slots [V:V+O) at step
        traj_last_step (ref vilmodel.py:748-756, simplified by static slots).
        """
        if batch.get("traj_obj_fts") is None:
            return None, None
        b, t, p, d = pano_embeds.shape
        num_view = batch["traj_view_fts"].shape[2]
        last = batch["traj_last_step"][:, None, None, None]
        last_step = jnp.take_along_axis(
            pano_embeds, jnp.broadcast_to(last, (b, 1, p, d)), axis=1
        )[:, 0]  # (B, P, D)
        obj_embeds = last_step[:, num_view:]
        obj_lens = jnp.take_along_axis(
            batch["traj_obj_lens"], batch["traj_last_step"][:, None], axis=1
        )[:, 0]
        obj_masks = jnp.arange(obj_embeds.shape[1])[None, :] < obj_lens[:, None]
        return obj_embeds, obj_masks

    # ---------------------------------------------------------------- forward
    def __call__(self, batch: Batch, *, return_gmap_embeds=True, deterministic=True):
        txt_embeds = self.encode_text(
            batch["txt_ids"], batch["txt_masks"], deterministic=deterministic
        )
        pano_embeds, pano_masks = self.encode_pano(batch, deterministic=deterministic)

        gmap_embeds = None
        if return_gmap_embeds:
            gmap_img_fts = self.aggregate_gmap(pano_embeds, pano_masks, batch["gmap_agg"])
            gmap_embeds = self.global_encoder(
                txt_embeds,
                batch["txt_masks"],
                gmap_img_fts,
                batch["gmap_step_ids"],
                batch["gmap_pos_fts"],
                batch["gmap_masks"],
                batch["gmap_pair_dists"],
                deterministic=deterministic,
            )

        obj_embeds, obj_masks = self.extract_obj_embeds(pano_embeds, batch)
        bev_embeds, obj_embeds = self.local_encoder(
            txt_embeds,
            batch["txt_masks"],
            batch["bev_fts"],
            batch["bev_pos_fts"],
            batch["bev_masks"],
            batch["bev_nav_masks"],
            obj_embeds,
            obj_masks,
            deterministic=deterministic,
        )
        return gmap_embeds, bev_embeds, obj_embeds, obj_masks

    # ------------------------------------------------------------------- MLM
    def forward_mlm(self, batch: Batch, *, deterministic=True):
        """Language stream attends to both map branches; branch outputs are
        summed (ref vilmodel.py:768-830)."""
        txt_embeds = self.encode_text(
            batch["txt_ids"], batch["txt_masks"], deterministic=deterministic
        )
        pano_embeds, pano_masks = self.encode_pano(batch, deterministic=deterministic)
        lang_bias = attn_bias(batch["txt_masks"])

        # global branch input embedding (no cross-modal forward)
        gmap_img_fts = self.aggregate_gmap(pano_embeds, pano_masks, batch["gmap_agg"])
        gmap_inputs = self.global_encoder.input_embedding(
            gmap_img_fts, batch["gmap_step_ids"], batch["gmap_pos_fts"]
        )
        gmap_bias = attn_bias(batch["gmap_masks"])
        gmap_txt = txt_embeds
        for layer in self.global_encoder.x_layers:
            gmap_txt = layer.lang2visn(
                gmap_txt, gmap_inputs, gmap_bias, lang_bias,
                deterministic=deterministic,
            )

        # local branch input embedding (+ object tokens)
        obj_embeds, obj_masks = self.extract_obj_embeds(pano_embeds, batch)
        bev_inputs = self.local_encoder.input_embedding(
            batch["bev_fts"], batch["bev_pos_fts"], batch["bev_nav_masks"]
        )
        if obj_embeds is not None:
            bev_inputs = jnp.concatenate(
                [bev_inputs, obj_embeds.astype(_dt(self.cfg))], axis=1
            )
            bev_key_masks = jnp.concatenate([batch["bev_masks"], obj_masks], axis=1)
        else:
            bev_key_masks = batch["bev_masks"]
        bev_bias = attn_bias(bev_key_masks)
        bev_txt = txt_embeds
        for layer in self.local_encoder.x_layers:
            bev_txt = layer.lang2visn(
                bev_txt, bev_inputs, bev_bias, lang_bias,
                deterministic=deterministic,
            )

        return gmap_txt + bev_txt

    # ------------------------------------------------------------------- SEM
    def forward_sem(self, batch: Batch, sem_pred_token: str, *, deterministic=True):
        """BEV embeddings for semantic prediction, at three depths
        (ref vilmodel.py:833-882): 'cattn' full cross-modal local branch,
        'sattn' self-attention only, 'embed' input embeddings only."""
        if sem_pred_token == "cattn":
            txt_embeds = self.encode_text(
                batch["txt_ids"], batch["txt_masks"], deterministic=deterministic
            )
            pano_embeds, pano_masks = self.encode_pano(batch, deterministic=deterministic)
            obj_embeds, obj_masks = self.extract_obj_embeds(pano_embeds, batch)
            bev_embeds, _ = self.local_encoder(
                txt_embeds,
                batch["txt_masks"],
                batch["bev_fts"],
                batch["bev_pos_fts"],
                batch["bev_masks"],
                batch["bev_nav_masks"],
                obj_embeds,
                obj_masks,
                deterministic=deterministic,
            )
            return bev_embeds
        if sem_pred_token == "sattn":
            x = self.local_encoder.input_embedding(
                batch["bev_fts"], batch["bev_pos_fts"], batch["bev_nav_masks"]
            )
            bias = attn_bias(batch["bev_masks"])
            for layer in self.local_encoder.x_layers:
                x = layer.visn2visn(x, bias, deterministic=deterministic)
            return x
        if sem_pred_token == "embed":
            return self.local_encoder.input_embedding(
                batch["bev_fts"], batch["bev_pos_fts"], batch["bev_nav_masks"]
            )
        raise ValueError(f"unknown sem_pred_token: {sem_pred_token}")


def cross_entropy(logits, labels, ignore_index=-100):
    """Per-example CE with ignore label (torch F.cross_entropy parity).
    logits: (B, C) f32; labels: (B,) int. Returns (loss (B,), valid (B,))."""
    valid = labels != ignore_index
    safe = jnp.where(valid, labels, 0)
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    nll = -jnp.take_along_axis(logp, safe[:, None], axis=-1)[:, 0]
    return jnp.where(valid, nll, 0.0), valid


class GlocalTextPathCMTPreTraining(nn.Module):
    """Backbone + proxy-task heads + per-task losses
    (ref pretrain_cmt.py:73-441). ``__call__(batch, task)`` returns
    (scalar loss, metrics dict)."""

    cfg: ModelConfig
    tasks: Tuple[str, ...] = ("mlm", "sap", "masksem")
    sem_pred_token: str = "cattn"

    def setup(self):
        cfg = self.cfg
        self.bert = GlocalTextPathCMT(cfg, name="bert")
        self.feat_dropout = Dropout(cfg.feat_dropout)
        if "mlm" in self.tasks:
            self.mlm_head = MlmHead(cfg, name="mlm_head")
        if "mrc" in self.tasks:
            self.obj_classifier = TwoLayerHead(
                cfg, cfg.obj_prob_size, name="obj_classifier"
            )
        if "sap" in self.tasks:
            self.global_sap_head = TwoLayerHead(cfg, 1, name="global_sap_head")
            self.local_sap_head = TwoLayerHead(cfg, 1, name="local_sap_head")
            if cfg.glocal_fuse:
                self.sap_fuse_linear = TwoLayerHead(cfg, 1, name="sap_fuse_linear")
            else:
                self.sap_fuse_linear = None
        if "og" in self.tasks:
            self.og_head = TwoLayerHead(cfg, 1, name="og_head")
        if "sem" in self.tasks or "masksem" in self.tasks:
            self.local_sem_head = TwoLayerHead(
                cfg, cfg.num_sem_classes, name="local_sem_head"
            )

    def drop_feats(self, batch: Batch, deterministic: bool) -> Batch:
        """Env-feature dropout (ref pretrain_cmt.py:102-106)."""
        out = dict(batch)
        for key in ("traj_view_fts", "traj_obj_fts", "bev_fts"):
            if out.get(key) is not None:
                out[key] = self.feat_dropout(out[key], deterministic=deterministic)
        return out

    def __call__(self, batch: Batch, task: str, *, deterministic: bool = True):
        batch = self.drop_feats(batch, deterministic)
        fn = {
            "mlm": self.forward_mlm,
            "mrc": self.forward_mrc,
            "sap": self.forward_sap,
            "og": self.forward_og,
            "sem": self.forward_sem,
            "masksem": self.forward_masksem,
        }[task.split("_")[0]]
        return fn(batch, deterministic=deterministic)

    def init_all(self, batch: Batch):
        """Touch every task branch once so flax creates all head params."""
        out = None
        for task in self.tasks:
            out = self(batch, task)
        return out

    # ------------------------------------------------------------------- MLM
    def forward_mlm(self, batch: Batch, *, deterministic=True):
        txt_embeds = self.bert.forward_mlm(batch, deterministic=deterministic)
        hidden = gather_tokens(txt_embeds, batch["mlm_pos"])  # (B, M, D)
        logits = self.mlm_head(
            hidden, self.bert.embeddings.word_embeddings.embedding
        )  # (B, M, vocab) f32
        b, m, v = logits.shape
        loss, valid = cross_entropy(
            logits.reshape(b * m, v),
            jnp.where(
                batch["mlm_valid"].reshape(-1), batch["mlm_tgt"].reshape(-1), -100
            ),
        )
        n = jnp.maximum(valid.sum(), 1)
        acc = (
            ((logits.argmax(-1).reshape(-1) == batch["mlm_tgt"].reshape(-1)) & valid)
            .sum() / n
        )
        return loss.sum() / n, {"mlm_acc": acc, "mlm_n": n}

    # ------------------------------------------------------------------- SAP
    def sap_logits(self, batch: Batch, *, deterministic=True):
        gmap_embeds, bev_embeds, _, _ = self.bert(batch, deterministic=deterministic)

        if self.sap_fuse_linear is None:
            fuse_weights = 0.5
        else:
            centre = self.cfg.bev_center
            fuse_weights = jax.nn.sigmoid(
                self.sap_fuse_linear(
                    jnp.concatenate([gmap_embeds[:, 0], bev_embeds[:, centre]], -1)
                )
            )  # (B, 1)

        global_logits = self.global_sap_head(gmap_embeds)[..., 0] * fuse_weights
        global_logits = masked_fill_neg(global_logits, batch["gmap_visited_masks"])
        global_logits = masked_fill_neg(global_logits, ~batch["gmap_masks"])

        cand_embeds = gather_tokens(bev_embeds, batch["bev_cand_idxs"])
        local_logits = self.local_sap_head(cand_embeds)[..., 0] * (1.0 - fuse_weights)
        local_logits = masked_fill_neg(local_logits, ~batch["local_masks"])

        # fused: host fuse_map scatters local candidate logits onto global
        # nodes (replaces the backtracking loop, pretrain_cmt.py:339-356)
        local_safe = jnp.where(batch["local_masks"], local_logits, 0.0)
        fused_logits = global_logits + jnp.einsum(
            "bnk,bk->bn", batch["fuse_map"].astype(jnp.float32), local_safe
        )
        return global_logits, local_logits, fused_logits

    def forward_sap(self, batch: Batch, *, deterministic=True):
        global_logits, local_logits, fused_logits = self.sap_logits(
            batch, deterministic=deterministic
        )
        g_loss, g_valid = cross_entropy(global_logits, batch["global_act_labels"])
        l_loss, l_valid = cross_entropy(local_logits, batch["local_act_labels"])
        f_loss, _ = cross_entropy(fused_logits, batch["global_act_labels"])
        n = jnp.maximum(g_valid.sum(), 1)  # -100 rows drop out of all three
        loss = (g_loss + l_loss + f_loss).sum() / jnp.maximum(
            jnp.asarray(batch["global_act_labels"].shape[0]), 1
        )
        metrics = {
            "sap_gacc": ((global_logits.argmax(-1) == batch["global_act_labels"]) & g_valid).sum() / n,
            "sap_lacc": ((local_logits.argmax(-1) == batch["local_act_labels"]) & l_valid).sum() / n,
            "sap_facc": ((fused_logits.argmax(-1) == batch["global_act_labels"]) & g_valid).sum() / n,
            "sap_n": n,
        }
        return loss, metrics

    # -------------------------------------------------------------------- OG
    def forward_og(self, batch: Batch, *, deterministic=True):
        _, _, obj_embeds, obj_masks = self.bert(
            batch, return_gmap_embeds=False, deterministic=deterministic
        )
        logits = self.og_head(obj_embeds)[..., 0]
        logits = masked_fill_neg(logits, ~obj_masks)
        loss, valid = cross_entropy(logits, batch["obj_labels"])
        n = jnp.maximum(valid.sum(), 1)
        acc = ((logits.argmax(-1) == batch["obj_labels"]) & valid).sum() / n
        return loss.sum() / n, {"og_acc": acc, "og_n": n}

    # ------------------------------------------------------------------- MRC
    def forward_mrc(self, batch: Batch, *, deterministic=True):
        _, _, obj_embeds, obj_masks = self.bert(
            batch, return_gmap_embeds=False, deterministic=deterministic
        )
        logits = self.obj_classifier(obj_embeds)  # (B, O, obj_prob_size)
        logp = jax.nn.log_softmax(logits, axis=-1)
        targets = batch["obj_probs"].astype(jnp.float32)
        # KL(target || pred) summed over classes (ref pretrain_cmt.py:291-295)
        kl = jnp.sum(
            targets * (jnp.log(jnp.clip(targets, 1e-12)) - logp), axis=-1
        )
        sel = batch["obj_mrc_masks"] & obj_masks
        n = jnp.maximum(sel.sum(), 1)
        return jnp.where(sel, kl, 0.0).sum() / n, {"mrc_n": n}

    # ------------------------------------------------------------------- SEM
    def _sem_loss(self, bev_embeds, batch: Batch, sel):
        logits = self.local_sem_head(bev_embeds)  # (B, C, num_sem)
        labels = batch["bev_sems"].astype(jnp.float32)
        bce = (
            jnp.clip(logits, 0)
            - logits * labels
            + jnp.log1p(jnp.exp(-jnp.abs(logits)))
        )
        n = jnp.maximum(sel.sum(), 1)
        loss = jnp.where(sel[..., None], bce, 0.0).sum() / (n * labels.shape[-1])
        return loss, {"sem_n": n, "sem_logits_mean": logits.mean()}

    def forward_sem(self, batch: Batch, *, deterministic=True):
        bev_embeds = self.bert.forward_sem(
            batch, self.sem_pred_token, deterministic=deterministic
        )
        return self._sem_loss(bev_embeds, batch, batch["bev_sem_masks"])

    def forward_masksem(self, batch: Batch, *, deterministic=True):
        masked = dict(batch)
        masked["bev_fts"] = jnp.where(
            batch["bev_mrc_masks"][..., None], 0.0, batch["bev_fts"]
        )
        bev_embeds = self.bert.forward_sem(
            masked, self.sem_pred_token, deterministic=deterministic
        )
        sel = batch["bev_sem_masks"] & batch["bev_mrc_masks"]
        return self._sem_loss(bev_embeds, batch, sel)
