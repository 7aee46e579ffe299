from gpzoo_tpu.data.preprocess import (
    rescale_spatial_coords,
    scanpy_sizefactors,
    anndata_to_train_val,
    arrays_to_train_val,
)
from gpzoo_tpu.data.nmf_init import (
    regularized_nmf,
    shrink_factors,
    shrink_loadings,
    lnormal_approx_dirichlet,
    smooth_spatial_factors,
)
from gpzoo_tpu.data.metrics import (morans_i, dims_autocorr,
                                    best_match_correlation)
from gpzoo_tpu.data.io import read_h5ad, load_train_val
from gpzoo_tpu.data.sim import (simulate_nsf_counts, simulate_nb_counts,
                                simulate_1d_regression,
                                simulate_shape_images)

__all__ = [
    "rescale_spatial_coords",
    "scanpy_sizefactors",
    "anndata_to_train_val",
    "arrays_to_train_val",
    "regularized_nmf",
    "shrink_factors",
    "shrink_loadings",
    "lnormal_approx_dirichlet",
    "smooth_spatial_factors",
    "morans_i",
    "best_match_correlation",
    "read_h5ad",
    "load_train_val",
    "dims_autocorr",
    "simulate_nsf_counts",
    "simulate_nb_counts",
    "simulate_1d_regression",
    "simulate_shape_images",
]
