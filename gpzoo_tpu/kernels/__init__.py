from gpzoo_tpu.kernels.rbf import RBF, NSFRBF, BatchedRBF, Matern32
from gpzoo_tpu.kernels.mggp import MGGPRBF, MGGPNSFRBF, BatchedMGGPRBF

# Reference-style aliases (GPzoo class names).
NSF_RBF = NSFRBF
MGGP_RBF = MGGPRBF
MGGP_NSF_RBF = MGGPNSFRBF
batched_RBF = BatchedRBF
batched_Matern32 = Matern32
batched_MGGP_RBF = BatchedMGGPRBF

__all__ = [
    "RBF",
    "NSFRBF",
    "BatchedRBF",
    "Matern32",
    "MGGPRBF",
    "MGGPNSFRBF",
    "BatchedMGGPRBF",
    "NSF_RBF",
    "MGGP_RBF",
    "MGGP_NSF_RBF",
    "batched_RBF",
    "batched_Matern32",
    "batched_MGGP_RBF",
]
