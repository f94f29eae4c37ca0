"""Checkpoint surgery: parameter-tree remapping between training stages.

The reference does string surgery on torch state dicts — LXMERT/RoBERTa
checkpoints into the ``bert.*`` namespace (pretrain_src/train_r2r.py:115-148)
and pretrained weights into the nav model (map_nav_src/models/vlnbert_init.py:
13-83). Here the nav model *contains* the pretrain backbone as the same
``bert`` subtree, so stage transfer is structural: copy every matching subtree.

``load_hf_bert`` maps a HuggingFace bert-base-uncased torch checkpoint onto
our flax tree (embeddings + the first num_l_layers encoder layers), covering
the reference's init_pretrained=bert path.
"""

from __future__ import annotations

from typing import Any, Dict

import numpy as np


def _is_leaf(x) -> bool:
    return not isinstance(x, dict)


def transfer_pretrained(src: Dict[str, Any], dst: Dict[str, Any]) -> Dict[str, Any]:
    """Copy every leaf of ``src`` whose path exists in ``dst`` (shapes must
    match); leaves missing from src keep dst's (fresh) values. Returns a new
    tree shaped like dst."""
    out = {}
    for k, v in dst.items():
        if k in src:
            if _is_leaf(v) or _is_leaf(src[k]):
                sv = src[k]
                if hasattr(sv, "shape") and hasattr(v, "shape") and sv.shape != v.shape:
                    out[k] = v  # shape mismatch: keep fresh init
                else:
                    out[k] = sv
            else:
                out[k] = transfer_pretrained(src[k], v)
        else:
            out[k] = v
    return out


def count_transferred(src: Dict[str, Any], dst: Dict[str, Any]) -> int:
    n = 0
    for k, v in dst.items():
        if k in src:
            if _is_leaf(v) or _is_leaf(src[k]):
                if not (hasattr(src[k], "shape") and src[k].shape != v.shape):
                    n += 1
            else:
                n += count_transferred(src[k], v)
    return n


def _set(tree: Dict[str, Any], path, value):
    node = tree
    for p in path[:-1]:
        node = node.setdefault(p, {})
    node[path[-1]] = value


def hf_bert_to_tree(state_dict: Dict[str, "np.ndarray"], num_l_layers: int = 9,
                    hidden: int = 768) -> Dict[str, Any]:
    """Map a HuggingFace bert-base torch state dict (numpy-converted) onto our
    param-tree layout (models/bert.py / encoders.py naming). Returns a partial
    tree to merge with ``transfer_pretrained``.

    HF layout: bert.embeddings.{word,position,token_type}_embeddings.weight,
    bert.encoder.layer.N.attention.self.{query,key,value}.{weight,bias},
    .attention.output.dense/LayerNorm, .intermediate.dense, .output.dense/LayerNorm.
    XLM-RoBERTa checkpoints share the encoder layout under a 'roberta.'
    prefix (the reference's RxR path, pretrain_src/train_r2r.py:131-148).
    """
    sd = {}
    roberta_style = False
    for k, v in state_dict.items():
        for prefix in ("roberta.", "xlm_roberta."):
            if k.startswith(prefix):
                roberta_style = True
        for prefix in ("bert.", "roberta.", "xlm_roberta."):
            if k.startswith(prefix):
                k = k[len(prefix):]
                break
        sd[k] = np.asarray(v)
    tree: Dict[str, Any] = {}

    def lin(prefix, transpose=True):
        w = sd[f"{prefix}.weight"]
        b = sd[f"{prefix}.bias"]
        return {"kernel": w.T if transpose else w, "bias": b}

    def ln(prefix):
        return {"scale": sd[f"{prefix}.weight"], "bias": sd[f"{prefix}.bias"]}

    emb = "embeddings"
    _set(tree, (emb, "word_embeddings", "embedding"),
         sd["embeddings.word_embeddings.weight"])
    pos_table = sd["embeddings.position_embeddings.weight"]
    if roberta_style:
        # RoBERTa position ids start at padding_idx + 1 = 2, so the first two
        # table rows are never trained for real positions. The reference maps
        # them naively (pretrain_src/train_r2r.py:131-148); we drop the +2 pad
        # offset so row i is the embedding of position i.
        pos_table = pos_table[2:]
    _set(tree, (emb, "position_embeddings", "embedding"), pos_table)
    _set(tree, (emb, "token_type_embeddings", "embedding"),
         sd["embeddings.token_type_embeddings.weight"])
    _set(tree, (emb, "ln"), ln("embeddings.LayerNorm"))

    for i in range(num_l_layers):
        hf = f"encoder.layer.{i}"
        base = ("lang_encoder", f"layer_{i}")
        # our self-attention uses a fused QKV projection: concat the three
        # HF matrices (concat-of-matmuls == matmul-of-concat)
        q = lin(f"{hf}.attention.self.query")
        k = lin(f"{hf}.attention.self.key")
        v = lin(f"{hf}.attention.self.value")
        _set(tree, base + ("attn", "att", "qkv"), {
            "kernel": np.concatenate([q["kernel"], k["kernel"], v["kernel"]], axis=1),
            "bias": np.concatenate([q["bias"], k["bias"], v["bias"]]),
        })
        _set(tree, base + ("attn", "out_dense"), lin(f"{hf}.attention.output.dense"))
        _set(tree, base + ("attn", "out_ln"), ln(f"{hf}.attention.output.LayerNorm"))
        _set(tree, base + ("ffn", "inter"), lin(f"{hf}.intermediate.dense"))
        _set(tree, base + ("ffn", "out_dense"), lin(f"{hf}.output.dense"))
        _set(tree, base + ("ffn", "out_ln"), ln(f"{hf}.output.LayerNorm"))
    return tree


def load_hf_bert(model_name: str = "bert-base-uncased", num_l_layers: int = 9):
    """Fetch HF weights via transformers (torch CPU) and convert. Requires
    the model to be cached locally (zero-egress environment)."""
    from transformers import BertModel

    model = BertModel.from_pretrained(model_name)
    sd = {k: v.detach().numpy() for k, v in model.state_dict().items()}
    return hf_bert_to_tree(sd, num_l_layers=num_l_layers)
