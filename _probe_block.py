import time, jax, jax.numpy as jnp, numpy as np
print("backend:", jax.default_backend(), flush=True)

# 1) bare scan on tpu
@jax.jit
def f(x):
    def body(c, _):
        return c @ w + 0.01 * c, c.sum()
    c, s = jax.lax.scan(body, x, None, length=15)
    return c, s
w = jnp.eye(256) * 0.99
x = jnp.ones((256, 256))
t0 = time.time(); c, s = f(x); print("scan readback:", float(s[-1]), f"{time.time()-t0:.1f}s", flush=True)

# 2) rbg key fold_in inside scan
from vln_bevbert_tpu.utils.rng import train_key
key = train_key(0)
@jax.jit
def g(x, key):
    def body(c, _):
        k = jax.random.fold_in(key, c[0, 0].astype(jnp.int32) % 7)
        return c + jax.random.normal(k, c.shape) * 0.01, c.mean()
    c, s = jax.lax.scan(body, x, None, length=15)
    return s
t0 = time.time(); s = g(x, key); print("rbg-scan readback:", float(s[-1]), f"{time.time()-t0:.1f}s", flush=True)

# 3) tiny block train step (the real code path)
from vln_bevbert_tpu.configs import ModelConfig, OptimConfig, PretrainConfig, ShapeConfig
from vln_bevbert_tpu.data.synthetic import synthetic_pretrain_batch
from vln_bevbert_tpu.parallel import init_pretrain_state
from vln_bevbert_tpu.parallel.train_step import make_pretrain_block_step
TINY = ModelConfig(vocab_size=400, hidden_size=32, num_attention_heads=2,
                   intermediate_size=64, num_l_layers=1, num_pano_layers=1,
                   num_x_layers=1, image_feat_size=24, obj_feat_size=0,
                   bev_grid_feat_size=20, bev_dim=5, dtype="float32",
                   max_position_embeddings=64)
SHAPES = ShapeConfig(max_txt_len=16, max_steps=3, max_pano_len=8, max_gmap_len=10,
                     max_local_len=6, max_objects=0, num_views=2, grid_hw=4,
                     max_masked_tokens=4)
cfg = PretrainConfig(model=TINY, shapes=SHAPES,
                     optim=OptimConfig(warmup_steps=2, num_train_steps=10),
                     tasks=("mlm", "sap", "masksem"), train_batch_size=8)
rng = np.random.default_rng(0)
b = synthetic_pretrain_batch(rng, 8, SHAPES, TINY, raw_bev=True)
b["txt_ids"] = (b["txt_ids"] % 300).astype(np.int32)
b["mlm_tgt"] = (b["mlm_tgt"] % 300).astype(np.int32)
b["mlm_ids"] = (b["mlm_ids"] % 300).astype(np.int32)
model, projector, state = init_pretrain_state(cfg, b)
block = make_pretrain_block_step(model, projector, None)
t0 = time.time()
state, m = block(state, b, key, task="sap", length=15)
print("tiny block loss:", float(m["loss"]), f"{time.time()-t0:.1f}s", flush=True)
print("PROBE OK", flush=True)
