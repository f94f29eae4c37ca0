"""Legacy CE baseline policy: Recurrent VLN-BERT (PREVALENT).

Flax re-design of /root/reference/bevbert_ce/vlnce_baselines/models/vlnbert/
vlnbert_PREVALENT.py:362-447 — the CMA/Seq2Seq-era policy the reference's
"dagger" legacy trainer drives through BaseVLNCETrainer's 'VLNBERT' branch
(common/base_il_trainer.py:350-470):

- ``language`` mode: BERT embeddings -> ``la_layers`` self-attention layers
  -> pooler; returns (pooled state h_t, sequence embeddings).
- ``visual`` mode: the recurrent step. The state token (slot 0 of the text
  sequence, carried across steps) is concatenated with the candidate visual
  tokens; [state; vision] cross-attends into the remaining language tokens,
  then self-attends; action logits are the pre-softmax self-attention scores
  from the state row to the vision keys, averaged over heads
  (vlnbert_PREVALENT.py:322-341,446).

The reference also constructs per-layer language self-attention/FFN modules
(lang_self_att/lang_inter/lang_output) that its forward never invokes
(LXRTXLayer.forward touches only the [state; vision] branch); they are
omitted here, so ``prevalent_to_tree`` drops their checkpoint entries.
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..ops.dropout import Dropout
from ..configs import ModelConfig
from .bert import BertEmbeddings, BertLayer, _dt, dense, layer_norm


class ScoredAttention(nn.Module):
    """Multi-head attention that also returns the pre-softmax scores
    (post-mask), the quantity Recurrent VLN-BERT reads out as logits."""

    cfg: ModelConfig

    @nn.compact
    def __call__(self, q_in, kv_in, bias=None, *, deterministic: bool = True):
        cfg = self.cfg
        h = cfg.num_attention_heads
        hd = cfg.hidden_size // h

        def heads(y):
            return y.reshape(*y.shape[:-1], h, hd)

        q = heads(dense(cfg, cfg.hidden_size, name="query")(q_in))
        kv = dense(cfg, 2 * cfg.hidden_size, name="kv")(kv_in)
        k, v = jnp.split(kv, 2, axis=-1)
        k, v = heads(k), heads(v)
        scores = jnp.einsum(
            "bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32
        ) / jnp.sqrt(jnp.float32(hd))
        if bias is not None:
            scores = scores + bias.astype(jnp.float32)
        probs = jax.nn.softmax(scores, axis=-1).astype(_dt(cfg))
        probs = Dropout(cfg.attention_probs_dropout_prob)(
            probs, deterministic=deterministic
        )
        ctx = jnp.einsum("bhqk,bkhd->bqhd", probs, v)
        ctx = ctx.reshape(*ctx.shape[:-2], cfg.hidden_size)
        return ctx, scores


class ScoredAttentionBlock(nn.Module):
    """attention + output dense + residual LayerNorm, returning scores."""

    cfg: ModelConfig

    @nn.compact
    def __call__(self, q_in, kv_in, bias=None, *, deterministic: bool = True):
        cfg = self.cfg
        ctx, scores = ScoredAttention(cfg, name="att")(
            q_in, kv_in, bias, deterministic=deterministic
        )
        out = dense(cfg, cfg.hidden_size, name="out_dense")(ctx)
        out = Dropout(cfg.hidden_dropout_prob)(out, deterministic=deterministic)
        out = layer_norm(cfg, name="out_ln")(out + q_in).astype(_dt(cfg))
        return out, scores


class PrevalentXLayer(nn.Module):
    """LXRTXLayer's live branch (vlnbert_PREVALENT.py:291-341): the
    [state; vision] stream cross-attends to language, self-attends, FFN."""

    cfg: ModelConfig

    @nn.compact
    def __call__(self, lang, lang_bias, visn, visn_bias, *,
                 deterministic: bool = True):
        cfg = self.cfg
        state = lang[:, :1]
        state_vis = jnp.concatenate([state, visn], axis=1)
        # state+vision bias on the key axis: [state ok; vision mask]
        sv_bias = jnp.concatenate([lang_bias[..., :1], visn_bias], axis=-1)

        x, cross_scores = ScoredAttentionBlock(cfg, name="cross")(
            state_vis, lang[:, 1:], lang_bias[..., 1:],
            deterministic=deterministic,
        )
        lang_scores = cross_scores[:, :, 0, :]
        x, self_scores = ScoredAttentionBlock(cfg, name="self_attn")(
            x, x, sv_bias, deterministic=deterministic,
        )
        # FFN (visn_inter/visn_output applied to the whole [state; vision])
        y = dense(cfg, cfg.intermediate_size, name="inter")(x)
        y = nn.gelu(y, approximate=False)
        y = dense(cfg, cfg.hidden_size, name="out_dense")(y)
        y = Dropout(cfg.hidden_dropout_prob)(y, deterministic=deterministic)
        x = layer_norm(cfg, name="out_ln")(y + x).astype(_dt(cfg))

        new_lang = jnp.concatenate([x[:, :1], lang[:, 1:]], axis=1)
        visual_scores = self_scores[:, :, 0, 1:]
        return new_lang, x[:, 1:], lang_scores, visual_scores


def _mask_bias(mask: jnp.ndarray) -> jnp.ndarray:
    """(B, L) bool -> (B, 1, 1, L) additive -10000 bias (ref fp16 mask)."""
    return ((1.0 - mask.astype(jnp.float32)) * -10000.0)[:, None, None, :]


class RecurrentVLNBert(nn.Module):
    """Mode-dispatched PREVALENT policy core."""

    cfg: ModelConfig
    la_layers: int = 9
    vl_layers: int = 4

    def setup(self):
        cfg = self.cfg
        self.embeddings = BertEmbeddings(cfg, name="embeddings")
        self.lalayer = [
            BertLayer(cfg, name=f"lalayer_{i}") for i in range(self.la_layers)
        ]
        self.addlayer = [
            PrevalentXLayer(cfg, name=f"addlayer_{i}")
            for i in range(self.vl_layers)
        ]
        self.pooler_dense = dense(cfg, cfg.hidden_size, name="pooler")

    def pooler(self, seq):
        return jnp.tanh(self.pooler_dense(seq[:, 0]))

    def language(self, txt_ids, txt_masks, *, deterministic=True):
        x = self.embeddings(txt_ids, deterministic=deterministic)
        bias = _mask_bias(txt_masks)
        for layer in self.lalayer:
            x = layer(x, bias, deterministic=deterministic)
        return self.pooler(x), x

    def visual(self, lang_embeds, txt_masks, img_feats, vis_masks, *,
               deterministic=True):
        """lang_embeds carries h_t in slot 0 (the caller substitutes it each
        step, base_il_trainer.py:455-456). Returns (h_t_new, action_scores)."""
        lang_bias = _mask_bias(txt_masks)
        visn_bias = _mask_bias(vis_masks)
        lang, visn = lang_embeds, img_feats
        for layer in self.addlayer:
            lang, visn, _, visual_scores = layer(
                lang, lang_bias, visn, visn_bias, deterministic=deterministic
            )
        h_t = self.pooler(lang)
        action_scores = visual_scores.mean(axis=1)
        return h_t, action_scores

    def __call__(self, mode: str, batch: Dict[str, Any], *,
                 deterministic: bool = True):
        if mode == "init":
            # touch both branches so a single init materialises every param
            # (linen creates params lazily per called submodule)
            h_t, seq = self.language(
                batch["txt_ids"], batch["txt_masks"], deterministic=deterministic
            )
            return self.visual(
                seq, batch["txt_masks"], batch["img_feats"],
                batch["vis_masks"], deterministic=deterministic,
            )
        if mode == "language":
            return self.language(
                batch["txt_ids"], batch["txt_masks"], deterministic=deterministic
            )
        if mode == "visual":
            return self.visual(
                batch["lang_embeds"], batch["txt_masks"],
                batch["img_feats"], batch["vis_masks"],
                deterministic=deterministic,
            )
        raise ValueError(f"unknown mode: {mode}")


def prevalent_to_tree(state_dict: Dict[str, Any], la_layers: int = 9,
                      vl_layers: int = 4) -> Dict[str, Any]:
    """Map a torch PREVALENT VLNBert state dict onto RecurrentVLNBert params.

    Handles the ``vln_bert.`` / ``module.`` prefixes the reference's loaders
    strip; unused lang_self_att/lang_inter/lang_output entries are dropped
    (never exercised by the reference forward)."""
    sd = {}
    for k, v in state_dict.items():
        for prefix in ("module.", "vln_bert.", "bert."):
            if k.startswith(prefix):
                k = k[len(prefix):]
        sd[k] = np.asarray(v)

    def lin(prefix):
        return {"kernel": sd[f"{prefix}.weight"].T, "bias": sd[f"{prefix}.bias"]}

    def ln(prefix):
        return {"scale": sd[f"{prefix}.weight"], "bias": sd[f"{prefix}.bias"]}

    def self_attn_block(prefix):
        q = lin(f"{prefix}.self.query")
        k = lin(f"{prefix}.self.key")
        v = lin(f"{prefix}.self.value")
        return {
            "att": {
                "query": q,
                "kv": {
                    "kernel": np.concatenate([k["kernel"], v["kernel"]], 1),
                    "bias": np.concatenate([k["bias"], v["bias"]]),
                },
            },
            "out_dense": lin(f"{prefix}.output.dense"),
            "out_ln": ln(f"{prefix}.output.LayerNorm"),
        }

    tree: Dict[str, Any] = {
        "embeddings": {
            "word_embeddings": {"embedding": sd["embeddings.word_embeddings.weight"]},
            "position_embeddings": {
                "embedding": sd["embeddings.position_embeddings.weight"]
            },
            "token_type_embeddings": {
                "embedding": sd["embeddings.token_type_embeddings.weight"]
            },
            "ln": ln("embeddings.LayerNorm"),
        },
        "pooler": lin("pooler.dense"),
    }
    for i in range(la_layers):
        p = f"lalayer.{i}"
        blk = self_attn_block(f"{p}.attention")
        # our BertLayer fuses qkv: rebuild the fused projection
        q = lin(f"{p}.attention.self.query")
        k = lin(f"{p}.attention.self.key")
        v = lin(f"{p}.attention.self.value")
        tree[f"lalayer_{i}"] = {
            "attn": {
                "att": {"qkv": {
                    "kernel": np.concatenate(
                        [q["kernel"], k["kernel"], v["kernel"]], 1),
                    "bias": np.concatenate([q["bias"], k["bias"], v["bias"]]),
                }},
                "out_dense": blk["out_dense"],
                "out_ln": blk["out_ln"],
            },
            "ffn": {
                "inter": lin(f"{p}.intermediate.dense"),
                "out_dense": lin(f"{p}.output.dense"),
                "out_ln": ln(f"{p}.output.LayerNorm"),
            },
        }
    for i in range(vl_layers):
        p = f"addlayer.{i}"
        xq = lin(f"{p}.visual_attention.att.query")
        xk = lin(f"{p}.visual_attention.att.key")
        xv = lin(f"{p}.visual_attention.att.value")
        tree[f"addlayer_{i}"] = {
            "cross": {
                "att": {
                    "query": xq,
                    "kv": {
                        "kernel": np.concatenate([xk["kernel"], xv["kernel"]], 1),
                        "bias": np.concatenate([xk["bias"], xv["bias"]]),
                    },
                },
                "out_dense": lin(f"{p}.visual_attention.output.dense"),
                "out_ln": ln(f"{p}.visual_attention.output.LayerNorm"),
            },
            "self_attn": self_attn_block(f"{p}.visn_self_att"),
            "inter": lin(f"{p}.visn_inter.dense"),
            "out_dense": lin(f"{p}.visn_output.dense"),
            "out_ln": ln(f"{p}.visn_output.LayerNorm"),
        }
    return tree
