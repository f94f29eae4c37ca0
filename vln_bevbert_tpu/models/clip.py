"""Frozen CLIP ViT vision tower (flax) — the TPU-side image encoder.

The reference vendors OpenAI CLIP twice (precompute_features/clip/model.py and
bevbert_ce/vlnce_baselines/models/encoders/clip/) and runs it frozen on GPU
for both the offline feature pipeline and the live CE policy
(resnet_encoders.py:280-, CLIPEncoderB16). This is the same ViT architecture
in flax — patch conv, class token, learned positions, pre-LN transformer,
quick-GELU MLP — plus a remapper from HuggingFace CLIPVisionModel state dicts
(surgery-style, so cached openai/clip-vit-* weights drop in). Forward parity
against transformers' torch implementation is pinned in tests/test_clip.py.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

# CLIP image normalisation constants (OpenAI)
CLIP_MEAN = np.array([0.48145466, 0.4578275, 0.40821073], np.float32)
CLIP_STD = np.array([0.26862954, 0.26130258, 0.27577711], np.float32)


def quick_gelu(x):
    return x * jax.nn.sigmoid(1.702 * x)


class ClipVisionTower(nn.Module):
    """Input: (B, H, W, 3) normalised images. Outputs dict with
    ``pooled`` (B, D) — post-LN class token — and ``grid`` (B, P, D) —
    final-layer patch tokens (pre pooling LN), the reference's 14x14 grid
    features when H=W=224, patch 16."""

    hidden_size: int = 768
    intermediate_size: int = 3072
    num_layers: int = 12
    num_heads: int = 12
    patch_size: int = 16
    dtype: str = "float32"

    @nn.compact
    def __call__(self, images: jnp.ndarray) -> Dict[str, jnp.ndarray]:
        dt = jnp.dtype(self.dtype)
        d = self.hidden_size
        b, h, w, _ = images.shape
        x = nn.Conv(
            d, (self.patch_size, self.patch_size),
            strides=(self.patch_size, self.patch_size),
            use_bias=False, dtype=dt, name="patch_embedding",
        )(images.astype(dt))
        x = x.reshape(b, -1, d)
        n_patches = x.shape[1]
        cls = self.param(
            "class_embedding", nn.initializers.normal(0.02), (d,), jnp.float32
        )
        x = jnp.concatenate(
            [jnp.broadcast_to(cls.astype(dt), (b, 1, d)), x], axis=1
        )
        pos = self.param(
            "position_embedding", nn.initializers.normal(0.02),
            (n_patches + 1, d), jnp.float32,
        )
        x = x + pos.astype(dt)[None]
        x = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="pre_ln")(x).astype(dt)

        for i in range(self.num_layers):
            x = self._layer(x, i, dt)

        grid = x[:, 1:, :]
        pooled = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="post_ln")(
            x[:, 0, :]
        ).astype(dt)
        return {"pooled": pooled, "grid": grid}

    def _layer(self, x, i, dt):
        d, heads = self.hidden_size, self.num_heads
        hd = d // heads
        y = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name=f"ln1_{i}")(x).astype(dt)
        qkv = nn.Dense(3 * d, dtype=dt, name=f"qkv_{i}")(y)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q = q.reshape(*q.shape[:-1], heads, hd)
        k = k.reshape(*k.shape[:-1], heads, hd)
        v = v.reshape(*v.shape[:-1], heads, hd)
        scores = jnp.einsum(
            "bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32
        ) / jnp.sqrt(jnp.float32(hd))
        probs = jax.nn.softmax(scores, axis=-1).astype(dt)
        ctx = jnp.einsum("bhqk,bkhd->bqhd", probs, v).reshape(*x.shape)
        x = x + nn.Dense(d, dtype=dt, name=f"attn_out_{i}")(ctx)
        y = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name=f"ln2_{i}")(x).astype(dt)
        y = nn.Dense(self.intermediate_size, dtype=dt, name=f"fc1_{i}")(y)
        y = quick_gelu(y)
        y = nn.Dense(d, dtype=dt, name=f"fc2_{i}")(y)
        return x + y


def hf_clip_to_tree(state_dict: Dict[str, Any], num_layers: int = 12) -> Dict[str, Any]:
    """Map a HuggingFace CLIPVisionModel torch state dict onto the
    ClipVisionTower param tree (fused QKV, NHWC conv kernel)."""
    sd = {
        k.replace("vision_model.", ""): np.asarray(v)
        for k, v in state_dict.items()
    }
    tree: Dict[str, Any] = {}
    # torch conv weight (D, 3, P, P) -> flax (P, P, 3, D)
    tree["patch_embedding"] = {
        "kernel": sd["embeddings.patch_embedding.weight"].transpose(2, 3, 1, 0)
    }
    tree["class_embedding"] = sd["embeddings.class_embedding"]
    tree["position_embedding"] = sd["embeddings.position_embedding.weight"]

    def ln(prefix):
        return {"scale": sd[f"{prefix}.weight"], "bias": sd[f"{prefix}.bias"]}

    def lin(prefix):
        return {"kernel": sd[f"{prefix}.weight"].T, "bias": sd[f"{prefix}.bias"]}

    tree["pre_ln"] = ln("pre_layrnorm")  # sic: HF's typo'd key
    tree["post_ln"] = ln("post_layernorm")
    for i in range(num_layers):
        p = f"encoder.layers.{i}"
        q, k, v = (lin(f"{p}.self_attn.{n}_proj") for n in ("q", "k", "v"))
        tree[f"qkv_{i}"] = {
            "kernel": np.concatenate([q["kernel"], k["kernel"], v["kernel"]], 1),
            "bias": np.concatenate([q["bias"], k["bias"], v["bias"]]),
        }
        tree[f"attn_out_{i}"] = lin(f"{p}.self_attn.out_proj")
        tree[f"ln1_{i}"] = ln(f"{p}.layer_norm1")
        tree[f"ln2_{i}"] = ln(f"{p}.layer_norm2")
        tree[f"fc1_{i}"] = lin(f"{p}.mlp.fc1")
        tree[f"fc2_{i}"] = lin(f"{p}.mlp.fc2")
    return tree


def preprocess(images_uint8: np.ndarray) -> np.ndarray:
    """(B, H, W, 3) uint8 -> normalised float32."""
    x = images_uint8.astype(np.float32) / 255.0
    return (x - CLIP_MEAN) / CLIP_STD
