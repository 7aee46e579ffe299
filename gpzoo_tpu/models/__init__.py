from gpzoo_tpu.models.likelihoods import GaussianLikelihood, ExactLikelihood
from gpzoo_tpu.models.factorization import (
    PoissonFactorization,
    PNMF,
    NSF,
    NBNSF,
    LegacyNSF,
    HybridNSF,
    HybridNSFExact,
    LegacyHybridNSF,
    MGGPNSF,
)

# Reference-style aliases (GPzoo class names; see factorization.py for the
# mapping — reference `NSF2` is the main head, renamed `NSF` here).
NSF2 = NSF
Hybrid_NSF2 = HybridNSF
Hybrid_NSF_Exact = HybridNSFExact
Hybrid_NSF = LegacyHybridNSF
MGGP_NSF = MGGPNSF

__all__ = [
    "GaussianLikelihood",
    "ExactLikelihood",
    "PoissonFactorization",
    "PNMF",
    "NSF",
    "NBNSF",
    "LegacyNSF",
    "HybridNSF",
    "HybridNSFExact",
    "LegacyHybridNSF",
    "MGGPNSF",
    "NSF2",
    "Hybrid_NSF2",
    "Hybrid_NSF_Exact",
    "Hybrid_NSF",
    "MGGP_NSF",
]
