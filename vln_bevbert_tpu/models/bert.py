"""BERT-family building blocks (flax.linen).

Functional re-design of the reference's torch modules
(/root/reference/pretrain_src/model/vilmodel.py:48-421 and the pre-norm pano
encoder in pretrain_src/model/transformer.py):

- post-norm BERT layers for the language / cross-modal stacks,
- pre-norm encoder layers for the panorama encoder,
- one attention primitive covering self- and cross-attention with an
  additive bias (mask and/or the global-map distance bias), scores in f32.

Activations default to bfloat16 with float32 parameters; attention softmax
and layer-norm statistics are computed in float32.
"""

from __future__ import annotations

import math
import os
from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.dropout import Dropout, fused_dropout
from ..configs import ModelConfig


def _attn_remat_mode() -> str:
    """VLN_BEVBERT_REMAT_ATTN: '' (off, default) | 'dots' | 'full'.

    Rematerialisation knob for the attention primitive, aimed at the
    timeline's #2 sink (benchmarks/TRACE_SUMMARY.md): the saved-for-backward
    attention-dropout masks whose u32[B,H,441,441] rng bits get relayout-
    copied (~11% of the step) so the residual matches the backward matmul's
    layout. Under remat the backward RE-DRAWS the bits in the layout its
    consumer wants — no residual, no relayout — at the cost of recomputing
    part of the score/softmax/dropout/context region (Attention's ``core``):
    'dots' keeps the einsum outputs saved (jax.checkpoint_policies.
    dots_saveable — only softmax + mask are recomputed), 'full' saves
    nothing past q/k/v (max HBM savings; re-runs both big matmuls in bwd).
    Read at trace time, like the fused-dropout knobs (ops/dropout.py).
    """
    return os.environ.get("VLN_BEVBERT_REMAT_ATTN", "")


def _dt(cfg: ModelConfig):
    return jnp.dtype(cfg.dtype)


def _pdt(cfg: ModelConfig):
    return jnp.dtype(cfg.param_dtype)


def dense(cfg: ModelConfig, features: int, name: Optional[str] = None) -> nn.Dense:
    return nn.Dense(
        features,
        dtype=_dt(cfg),
        param_dtype=_pdt(cfg),
        kernel_init=nn.initializers.normal(cfg.initializer_range),
        name=name,
    )


def layer_norm(cfg: ModelConfig, name: Optional[str] = None) -> nn.LayerNorm:
    # stats in f32 regardless of activation dtype
    return nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=jnp.float32,
                        param_dtype=_pdt(cfg), name=name)


def embed(cfg: ModelConfig, num: int, name: Optional[str] = None) -> nn.Embed:
    return nn.Embed(
        num, cfg.hidden_size, dtype=_dt(cfg), param_dtype=_pdt(cfg),
        embedding_init=nn.initializers.normal(cfg.initializer_range), name=name,
    )


class Attention(nn.Module):
    """Multi-head attention with additive bias; covers BertSelfAttention
    (vilmodel.py:79-141) and BertOutAttention/cross (vilmodel.py:301-352).

    The score/softmax/dropout/context region is a pure inner function of
    (q, k, v, bias, dropout key) so VLN_BEVBERT_REMAT_ATTN can wrap it in
    jax.checkpoint without touching the module's parameter scope — the
    dropout key is drawn OUTSIDE the region and passed in, so the remat'd
    backward re-draws identical masks from the same key."""

    cfg: ModelConfig

    @nn.compact
    def __call__(self, q_in, kv_in, bias=None, *, deterministic: bool = True):
        cfg = self.cfg
        h, d = cfg.num_attention_heads, cfg.head_dim

        def heads(y):
            return y.reshape(*y.shape[:-1], h, d)

        # fused projections: one matmul for self-attention QKV, Q + fused KV
        # for cross-attention (identical numerics, fewer small MXU launches)
        if q_in is kv_in:
            qkv = dense(cfg, 3 * cfg.hidden_size, name="qkv")(q_in)
            q, k, v = (heads(t) for t in jnp.split(qkv, 3, axis=-1))
        else:
            q = heads(dense(cfg, cfg.hidden_size, name="query")(q_in))
            kv = dense(cfg, 2 * cfg.hidden_size, name="kv")(kv_in)
            k, v = (heads(t) for t in jnp.split(kv, 2, axis=-1))

        scale = 1.0 / math.sqrt(d)
        rate = cfg.attention_probs_dropout_prob
        drop_key = (self.make_rng("dropout")
                    if (not deterministic and rate > 0.0) else None)

        def core(q, k, v, bias, drop_key):
            # scores materialise in the activation dtype (bf16): the (B,H,Q,K)
            # tensor is the attention bandwidth hot spot (441-token BEV
            # branch); MXU still accumulates in f32, softmax statistics are
            # computed in f32 after an upcast XLA fuses into the reduction
            # passes. The reference trains under AMP fp16 where these scores
            # are half precision too. Measured: -16% per 441-token attention.
            scores = jnp.einsum("bqhd,bkhd->bhqk",
                                q * jnp.asarray(scale, q.dtype), k,
                                preferred_element_type=_dt(cfg))
            if bias is not None:
                scores = scores + bias.astype(_dt(cfg))
            probs = nn.softmax(scores.astype(jnp.float32), axis=-1)
            probs = probs.astype(_dt(cfg))
            if drop_key is not None:
                probs = fused_dropout(probs, rate, drop_key, site="attn_probs")
            ctx = jnp.einsum("bhqk,bkhd->bqhd", probs, v,
                             preferred_element_type=jnp.float32).astype(_dt(cfg))
            return ctx.reshape(*ctx.shape[:-2], h * d)

        mode = _attn_remat_mode()
        if mode and not deterministic:  # remat only pays where a bwd exists
            policy = (jax.checkpoint_policies.dots_saveable
                      if mode == "dots" else None)
            # prevent_cse=False: every gradient path here executes inside a
            # lax.scan body (pretrain block step, ft replay block), where the
            # fwd and the recompute live in separate while-loop bodies that
            # XLA cannot CSE — the optimization-barrier overhead
            # prevent_cse=True inserts buys nothing
            core = jax.checkpoint(core, policy=policy, prevent_cse=False)
        return core(q, k, v, bias, drop_key)


class AttentionBlock(nn.Module):
    """Attention + output projection + residual layer-norm
    (BertAttention / BertXAttention, vilmodel.py:156-166,354-363)."""

    cfg: ModelConfig

    @nn.compact
    def __call__(self, q_in, kv_in, bias=None, *, deterministic: bool = True):
        cfg = self.cfg
        ctx = Attention(cfg, name="att")(q_in, kv_in, bias,
                                         deterministic=deterministic)
        out = dense(cfg, cfg.hidden_size, name="out_dense")(ctx)
        out = Dropout(cfg.hidden_dropout_prob)(out, deterministic=deterministic)
        out = layer_norm(cfg, name="out_ln")(out + q_in).astype(_dt(cfg))
        return out


class Ffn(nn.Module):
    """Intermediate + output FFN with residual layer-norm
    (BertIntermediate/BertOutput, vilmodel.py:168-193)."""

    cfg: ModelConfig

    @nn.compact
    def __call__(self, x, *, deterministic: bool = True):
        cfg = self.cfg
        y = dense(cfg, cfg.intermediate_size, name="inter")(x)
        y = nn.gelu(y, approximate=False)
        y = dense(cfg, cfg.hidden_size, name="out_dense")(y)
        y = Dropout(cfg.hidden_dropout_prob)(y, deterministic=deterministic)
        return layer_norm(cfg, name="out_ln")(y + x).astype(_dt(cfg))


class BertLayer(nn.Module):
    """Post-norm self-attention transformer layer (vilmodel.py:195-208)."""

    cfg: ModelConfig

    @nn.compact
    def __call__(self, x, bias=None, *, deterministic: bool = True):
        x = AttentionBlock(self.cfg, name="attn")(x, x, bias, deterministic=deterministic)
        return Ffn(self.cfg, name="ffn")(x, deterministic=deterministic)


class BertXLayer(nn.Module):
    """Cross-modal layer (GraphLXRTXLayer, vilmodel.py:365-421).

    ``__call__``      : visual stream cross-attends to language, then
                        self-attends (optionally with the distance bias added
                        to the self-attention mask), then FFN.
    ``lang2visn``     : language stream cross-attends to the visual stream
                        (used by the MLM forward).
    ``visn2visn``     : self-attention only (SEM 'sattn' mode).
    """

    cfg: ModelConfig

    def setup(self):
        cfg = self.cfg
        self.cross = AttentionBlock(cfg, name="cross")
        self.self_attn = AttentionBlock(cfg, name="self_attn")
        self.ffn = Ffn(cfg, name="ffn")
        if cfg.use_lang2visn_attn:
            self.lang_self_attn = AttentionBlock(cfg, name="lang_self_attn")
            self.lang_ffn = Ffn(cfg, name="lang_ffn")

    def __call__(self, visn, lang, lang_bias, visn_bias, sprel_bias=None,
                 *, deterministic: bool = True):
        x = self.cross(visn, lang, lang_bias, deterministic=deterministic)
        bias = visn_bias if sprel_bias is None else visn_bias + sprel_bias
        x = self.self_attn(x, x, bias, deterministic=deterministic)
        return self.ffn(x, deterministic=deterministic)

    def lang2visn(self, lang, visn, visn_bias, lang_bias, *, deterministic: bool = True):
        x = self.cross(lang, visn, visn_bias, deterministic=deterministic)
        x = self.lang_self_attn(x, x, lang_bias, deterministic=deterministic)
        return self.lang_ffn(x, deterministic=deterministic)

    def visn2visn(self, visn, visn_bias, *, deterministic: bool = True):
        x = self.self_attn(visn, visn, visn_bias, deterministic=deterministic)
        return self.ffn(x, deterministic=deterministic)


class BertEmbeddings(nn.Module):
    """Word + position + token-type embeddings (vilmodel.py:48-77)."""

    cfg: ModelConfig

    def setup(self):
        cfg = self.cfg
        self.word_embeddings = embed(cfg, cfg.vocab_size, name="word_embeddings")
        self.position_embeddings = embed(
            cfg, cfg.max_position_embeddings, name="position_embeddings"
        )
        self.token_type_embeddings = embed(
            cfg, cfg.type_vocab_size, name="token_type_embeddings"
        )
        self.ln = layer_norm(cfg, name="ln")
        self.dropout = Dropout(cfg.hidden_dropout_prob)

    def __call__(self, input_ids, token_type_ids=None, *, deterministic: bool = True):
        seq = input_ids.shape[-1]
        pos = jnp.arange(seq)[None, :]
        x = self.word_embeddings(input_ids) + self.position_embeddings(pos)
        if token_type_ids is None:
            token_type_ids = jnp.zeros_like(input_ids)
        x = x + self.token_type_embeddings(token_type_ids)
        x = self.ln(x).astype(_dt(self.cfg))
        return self.dropout(x, deterministic=deterministic)


class PanoEncoderLayer(nn.Module):
    """Pre-norm transformer encoder layer for the panorama encoder
    (ref pretrain_src/model/transformer.py TransformerEncoderLayer with
    normalize_before=True)."""

    cfg: ModelConfig

    @nn.compact
    def __call__(self, x, bias=None, *, deterministic: bool = True):
        cfg = self.cfg
        y = layer_norm(cfg, name="ln1")(x).astype(_dt(cfg))
        y = Attention(cfg, name="att")(y, y, bias, deterministic=deterministic)
        y = dense(cfg, cfg.hidden_size, name="att_out")(y)
        y = Dropout(cfg.hidden_dropout_prob)(y, deterministic=deterministic)
        x = x + y
        y = layer_norm(cfg, name="ln2")(x).astype(_dt(cfg))
        y = dense(cfg, cfg.intermediate_size, name="inter")(y)
        y = nn.gelu(y, approximate=False)
        y = Dropout(cfg.hidden_dropout_prob)(y, deterministic=deterministic)
        y = dense(cfg, cfg.hidden_size, name="out_dense")(y)
        y = Dropout(cfg.hidden_dropout_prob)(y, deterministic=deterministic)
        return x + y


class MlmHead(nn.Module):
    """Masked-LM head: transform + decoder tied to the word embeddings
    (BertLMPredictionHead, vilmodel.py:274-290). ``tied_embedding`` is the
    (vocab, hidden) word-embedding table."""

    cfg: ModelConfig

    @nn.compact
    def __call__(self, hidden, tied_embedding):
        cfg = self.cfg
        x = dense(cfg, cfg.hidden_size, name="transform")(hidden)
        x = nn.gelu(x, approximate=False)
        x = layer_norm(cfg, name="transform_ln")(x).astype(_dt(cfg))
        logits = jnp.einsum(
            "...d,vd->...v", x, tied_embedding.astype(_dt(cfg)),
            preferred_element_type=jnp.float32,
        )
        bias = self.param("bias", nn.initializers.zeros, (cfg.vocab_size,), _pdt(cfg))
        return logits + bias


class TwoLayerHead(nn.Module):
    """Linear-ReLU-LN-Linear prediction head (ClsPrediction /
    RegionClassification / MulClsPrediction, pretrain_cmt.py:34-71)."""

    cfg: ModelConfig
    out_dim: int = 1

    @nn.compact
    def __call__(self, x):
        cfg = self.cfg
        y = dense(cfg, cfg.hidden_size, name="fc1")(x)
        y = nn.relu(y)
        y = layer_norm(cfg, name="ln")(y).astype(_dt(cfg))
        return dense(cfg, self.out_dim, name="fc2")(y).astype(jnp.float32)
