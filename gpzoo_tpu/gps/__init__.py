from gpzoo_tpu.gps.svgp import SVGP, WSVGP, LowRankWSVGP
from gpzoo_tpu.gps.mggp import MGGPSVGP, MGGPWSVGP
from gpzoo_tpu.gps.vnngp import VNNGP
from gpzoo_tpu.gps.gaussian_prior import GaussianPrior

# Reference-style aliases.
MGGP_SVGP = MGGPSVGP
MGGP_WSVGP = MGGPWSVGP

__all__ = [
    "SVGP",
    "WSVGP",
    "LowRankWSVGP",
    "MGGPSVGP",
    "MGGPWSVGP",
    "VNNGP",
    "GaussianPrior",
    "MGGP_SVGP",
    "MGGP_WSVGP",
]
