"""Probe: BEV-branch (441-token) self-attention implementations on TPU.

The local-BEV branch (441 tokens x 4 cross-modal layers) is ~50% of the
pretrain forward (ROADMAP perf item 1). Candidates:
  a) current: einsum scores (f32) + softmax + einsum ctx
  b) pallas flash_attention, sequence padded 441 -> 512
  c) same as (a) with bf16 scores (accuracy delta — measure only)

Run: python benchmarks/bev_attn_probe.py  (real chip; forces host readback
for timing — block_until_ready is unreliable through the tunnel).
"""

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np

B, L, H, D = 16, 441, 12, 64
LP = 512  # padded length for flash


def time_fn(f, *args, iters=30):
    out = f(*args)
    float(jnp.sum(out[0] if isinstance(out, tuple) else out).astype(jnp.float32))
    t0 = time.time()
    for _ in range(iters):
        out = f(*args)
    float(jnp.sum(out[0] if isinstance(out, tuple) else out).astype(jnp.float32))
    return (time.time() - t0) / iters


@jax.jit
def attn_current(q, k, v):
    scores = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                        preferred_element_type=jnp.float32)
    scores = scores / jnp.sqrt(jnp.float32(D))
    probs = jax.nn.softmax(scores, axis=-1)
    return jnp.einsum("bhqk,bkhd->bqhd", probs.astype(jnp.bfloat16), v,
                      preferred_element_type=jnp.float32).astype(jnp.bfloat16)


@jax.jit
def attn_bf16_scores(q, k, v):
    scores = jnp.einsum("bqhd,bkhd->bhqk", q, k)  # bf16 accumulate? no: dot in bf16->f32 default
    scores = (scores / jnp.sqrt(jnp.float32(D))).astype(jnp.bfloat16)
    probs = jax.nn.softmax(scores.astype(jnp.float32), axis=-1).astype(jnp.bfloat16)
    return jnp.einsum("bhqk,bkhd->bqhd", probs, v).astype(jnp.bfloat16)


@jax.jit
def attn_flash(qp, kp, vp):
    from jax.experimental.pallas.ops.tpu.flash_attention import (
        BlockSizes,
        flash_attention,
    )

    bs = BlockSizes(
        block_q=256, block_k_major=256, block_k=256, block_b=1,
        block_q_major_dkv=256, block_k_major_dkv=256, block_k_dkv=256,
        block_q_dkv=256, block_k_major_dq=256, block_k_dq=256, block_q_dq=256,
    )
    # layout (B, H, L, D)
    return flash_attention(qp, kp, vp, causal=False,
                           sm_scale=1.0 / np.sqrt(D), block_sizes=bs)


def main():
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.normal(size=(B, L, H, D)), jnp.bfloat16)
    k = jnp.asarray(rng.normal(size=(B, L, H, D)), jnp.bfloat16)
    v = jnp.asarray(rng.normal(size=(B, L, H, D)), jnp.bfloat16)

    t_cur = time_fn(attn_current, q, k, v)
    print(f"current f32-scores:  {t_cur * 1e3:8.3f} ms")

    t_bf = time_fn(attn_bf16_scores, q, k, v)
    print(f"bf16 scores:         {t_bf * 1e3:8.3f} ms")

    pad = [(0, 0), (0, LP - L), (0, 0), (0, 0)]
    qp = jnp.transpose(jnp.pad(q, pad), (0, 2, 1, 3))
    kp = jnp.transpose(jnp.pad(k, pad), (0, 2, 1, 3))
    vp = jnp.transpose(jnp.pad(v, pad), (0, 2, 1, 3))
    try:
        t_fl = time_fn(attn_flash, qp, kp, vp)
        print(f"pallas flash (512):  {t_fl * 1e3:8.3f} ms")
    except Exception as e:
        print("flash failed:", e)

    # correctness: padded-key flash vs current (pad keys get ~0 weight only
    # with masking — here just compare the unpadded-query slice magnitude)
    o1 = np.asarray(attn_current(q, k, v), np.float32)
    print("current out norm", float(np.linalg.norm(o1)))


if __name__ == "__main__":
    main()
