from gpzoo_tpu.ops.distance import squared_dist, cdist
from gpzoo_tpu.ops.linalg import (
    add_jitter,
    svgp_forward,
    whitened_kl,
    safe_sqrt,
    embed_distance_matrix,
)

__all__ = [
    "squared_dist",
    "cdist",
    "add_jitter",
    "svgp_forward",
    "whitened_kl",
    "safe_sqrt",
    "embed_distance_matrix",
]
