"""Mask / additive-bias helpers (device side).

Parity notes: the reference builds boolean key masks with gen_seq_masks and
converts them to additive biases of -10000 with extend_neg_masks
(/root/reference/pretrain_src/model/ops.py:25-45). We keep the -10000 value so
softmax behaviour matches under bf16 (where -inf would produce NaNs through
fully-masked rows).
"""

from __future__ import annotations

import jax.numpy as jnp

# Additive bias for masked attention keys; -10000 matches the reference and is
# representable in bfloat16.
NEG_INF = -10000.0


def seq_mask(lens: jnp.ndarray, max_len: int) -> jnp.ndarray:
    """(B,) int lengths -> (B, max_len) bool validity mask."""
    return jnp.arange(max_len)[None, :] < lens[:, None]


def attn_bias(mask: jnp.ndarray, dtype=jnp.float32) -> jnp.ndarray:
    """(B, L) bool key mask -> (B, 1, 1, L) additive bias (0 valid / NEG_INF pad)."""
    return ((1.0 - mask.astype(dtype)) * NEG_INF)[:, None, None, :]


def masked_fill_neg(x: jnp.ndarray, invalid: jnp.ndarray) -> jnp.ndarray:
    """Set logits at invalid positions to NEG_INF (reference masked_fill_(-inf))."""
    return jnp.where(invalid, jnp.asarray(NEG_INF, x.dtype), x)
