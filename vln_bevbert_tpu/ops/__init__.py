from .masking import seq_mask, attn_bias, masked_fill_neg, NEG_INF
from .bev import BevProjector

__all__ = ["seq_mask", "attn_bias", "masked_fill_neg", "NEG_INF", "BevProjector"]
