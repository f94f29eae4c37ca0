"""Checkpoint-surgery golden tests: a HuggingFace torch BERT (randomly
initialised — no downloads) remapped onto our flax tree must produce the same
hidden states. This validates both the remapper and the numerical semantics
of the whole BERT stack (embeddings, attention, LN placement, GELU)."""

import numpy as np
import pytest

from vln_bevbert_tpu.configs import ModelConfig
from vln_bevbert_tpu.models.surgery import (
    count_transferred,
    hf_bert_to_tree,
    transfer_pretrained,
)

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")


@pytest.fixture(scope="module")
def hf_model_and_cfg():
    from transformers import BertConfig, BertModel

    hf_cfg = BertConfig(
        vocab_size=500,
        hidden_size=48,
        num_hidden_layers=3,
        num_attention_heads=4,
        intermediate_size=96,
        max_position_embeddings=64,
        hidden_dropout_prob=0.0,
        attention_probs_dropout_prob=0.0,
    )
    torch.manual_seed(0)
    model = BertModel(hf_cfg).eval()
    cfg = ModelConfig(
        vocab_size=500, hidden_size=48, num_attention_heads=4,
        intermediate_size=96, num_l_layers=3, num_pano_layers=1,
        num_x_layers=1, image_feat_size=8, bev_grid_feat_size=8,
        bev_dim=3, max_position_embeddings=64, dtype="float32",
        hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
    )
    return model, cfg


def test_hf_bert_forward_parity(hf_model_and_cfg):
    import jax

    from vln_bevbert_tpu.models.bert import BertEmbeddings
    from vln_bevbert_tpu.models.encoders import LanguageEncoder
    from flax import linen as nn

    hf, cfg = hf_model_and_cfg

    class TextStack(nn.Module):
        cfg: ModelConfig

        @nn.compact
        def __call__(self, ids, masks):
            x = BertEmbeddings(self.cfg, name="embeddings")(ids)
            return LanguageEncoder(self.cfg, name="lang_encoder")(x, masks)

    model = TextStack(cfg)
    rng = np.random.default_rng(0)
    ids = rng.integers(1, 500, (2, 12)).astype(np.int32)
    lens = np.array([12, 7])
    masks = np.arange(12)[None, :] < lens[:, None]
    params = model.init(jax.random.key(0), ids, masks)["params"]

    sd = {f"bert.{k}": v.detach().numpy() for k, v in hf.state_dict().items()}
    tree = hf_bert_to_tree(sd, num_l_layers=3)
    n_before = count_transferred(tree, params)
    merged = transfer_pretrained(tree, params)
    # 5 embedding leaves + 12 leaves per layer (fused qkv) x 3 layers
    assert n_before == 5 + 3 * 12, n_before

    ours = np.asarray(model.apply({"params": merged}, ids, masks))

    with torch.no_grad():
        theirs = hf(
            input_ids=torch.from_numpy(ids.astype(np.int64)),
            attention_mask=torch.from_numpy(masks.astype(np.int64)),
        ).last_hidden_state.numpy()

    # compare on valid positions only
    np.testing.assert_allclose(ours[masks], theirs[masks], atol=2e-4)


def test_transfer_keeps_fresh_on_mismatch():
    dst = {"a": {"w": np.zeros((2, 2))}, "b": np.ones(3)}
    src = {"a": {"w": np.full((4, 4), 7.0)}, "c": np.zeros(1)}
    out = transfer_pretrained(src, dst)
    np.testing.assert_array_equal(out["a"]["w"], np.zeros((2, 2)))  # mismatch
    np.testing.assert_array_equal(out["b"], np.ones(3))             # missing


@pytest.mark.slow
def test_pretrain_to_nav_transfer_is_identity_on_bert():
    import jax

    from vln_bevbert_tpu.configs import ShapeConfig
    from vln_bevbert_tpu.data.synthetic import synthetic_pretrain_batch
    from vln_bevbert_tpu.models import (
        GlocalTextPathCMTPreTraining,
        GlocalTextPathNavCMT,
    )

    cfg = ModelConfig(
        vocab_size=300, hidden_size=16, num_attention_heads=2,
        intermediate_size=32, num_l_layers=1, num_pano_layers=1,
        num_x_layers=1, image_feat_size=8, bev_grid_feat_size=8,
        bev_dim=3, dtype="float32", max_position_embeddings=32,
    )
    shapes = ShapeConfig(max_txt_len=12, max_steps=2, max_pano_len=6,
                         max_gmap_len=6, max_local_len=4, max_objects=0,
                         num_views=2, grid_hw=2, max_masked_tokens=3)
    batch = synthetic_pretrain_batch(
        np.random.default_rng(0), 2, shapes, cfg, raw_bev=False
    )
    batch["txt_ids"] %= 300
    batch["mlm_tgt"] %= 300
    batch["mlm_ids"] %= 300
    pre = GlocalTextPathCMTPreTraining(cfg, tasks=("sap",))
    pre_params = pre.init(jax.random.key(0), batch, "sap")["params"]

    nav = GlocalTextPathNavCMT(cfg)
    lang_in = {"txt_ids": batch["txt_ids"], "txt_masks": batch["txt_masks"]}
    nav_params = nav.init(jax.random.key(1), "language", lang_in)["params"]
    merged = transfer_pretrained(pre_params, nav_params)
    # the shared bert subtree transfers leaf-for-leaf
    for a, b in zip(
        jax.tree.leaves(merged["bert"]["embeddings"]),
        jax.tree.leaves(pre_params["bert"]["embeddings"]),
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # and the nav model produces identical text encodings to the pretrainer
    out_nav = nav.apply({"params": merged}, "language", lang_in)
    out_pre = pre.apply(
        {"params": pre_params},
        batch["txt_ids"], batch["txt_masks"],
        method=lambda m, i, k: m.bert.encode_text(i, k),
    )
    np.testing.assert_allclose(
        np.asarray(out_nav), np.asarray(out_pre), atol=1e-6
    )


def test_roberta_position_offset():
    """XLM-R position tables carry a +2 pad offset (positions start at
    padding_idx+1=2); hf_bert_to_tree must drop the first two rows for
    roberta-prefixed state dicts and not for bert ones (VERDICT r1 item 9;
    the reference maps them naively, train_r2r.py:131-148)."""
    rng = np.random.default_rng(0)
    d = 8
    pos = rng.normal(size=(514, d)).astype(np.float32)

    def make_sd(prefix):
        return {
            f"{prefix}embeddings.word_embeddings.weight": rng.normal(size=(32, d)),
            f"{prefix}embeddings.position_embeddings.weight": pos,
            f"{prefix}embeddings.token_type_embeddings.weight": rng.normal(size=(1, d)),
            f"{prefix}embeddings.LayerNorm.weight": np.ones(d),
            f"{prefix}embeddings.LayerNorm.bias": np.zeros(d),
        }

    tree_rob = hf_bert_to_tree(make_sd("roberta."), num_l_layers=0)
    got = tree_rob["embeddings"]["position_embeddings"]["embedding"]
    assert got.shape == (512, d)
    np.testing.assert_array_equal(got, pos[2:])

    tree_bert = hf_bert_to_tree(make_sd("bert."), num_l_layers=0)
    got_b = tree_bert["embeddings"]["position_embeddings"]["embedding"]
    np.testing.assert_array_equal(got_b, pos)
