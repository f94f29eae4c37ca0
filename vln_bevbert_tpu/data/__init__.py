from .synthetic import synthetic_pretrain_batch, synthetic_raw_bev_inputs

__all__ = ["synthetic_pretrain_batch", "synthetic_raw_bev_inputs"]
