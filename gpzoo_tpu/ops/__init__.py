from gpzoo_tpu.ops.distance import squared_dist, cdist
from gpzoo_tpu.ops.linalg import (
    add_jitter,
    cholesky_mm,
    embed_distance_matrix,
    reshape_param,
    safe_sqrt,
    spd_inverse_from_cholesky,
    sqrt_safe_grad,
    svgp_forward,
    tri_inverse,
    tril_logdet,
    whitened_kl,
)
from gpzoo_tpu.ops.tri_blocked import tri_kl_trace, tri_sq_colsum

__all__ = [
    "squared_dist",
    "cdist",
    "add_jitter",
    "cholesky_mm",
    "svgp_forward",
    "whitened_kl",
    "safe_sqrt",
    "spd_inverse_from_cholesky",
    "sqrt_safe_grad",
    "embed_distance_matrix",
    "reshape_param",
    "tri_inverse",
    "tril_logdet",
    "tri_kl_trace",
    "tri_sq_colsum",
]
