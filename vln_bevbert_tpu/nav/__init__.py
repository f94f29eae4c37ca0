from .eval_utils import compute_dtw_metrics, compute_cls
from .graph_map import FloydGraph, GraphMap

__all__ = ["compute_dtw_metrics", "compute_cls", "FloydGraph", "GraphMap"]
