"""gpzoo_tpu — a TPU-native sparse-variational Gaussian-process framework.

A ground-up JAX/XLA/Pallas rebuild of the capabilities of GPzoo
(luisdiaz1997/GPzoo): sparse variational GPs (SVGP, whitened SVGP,
multi-group MGGP, nearest-neighbor VNNGP) with Gaussian / Poisson
observation models driving spatial-transcriptomics factorization
(NSF, PNMF, hybrid spatial/non-spatial variants).

Design (TPU-first, not a port):

* **Functional core.** Models are immutable pytree dataclasses
  (``flax.struct``); every forward is a pure function of ``(params, inputs,
  key)``. The whole training step — minibatch index sampling, Gram
  construction, Cholesky, ELBO, gradients, optimizer update — compiles to a
  single ``jax.jit`` program (vs. the reference's per-op host loop,
  ``/root/reference/gpzoo/utilities.py:471-632``).
* **Batched linear algebra.** Multi-factor GPs carry an explicit leading
  ``L`` axis; the L×M×M Choleskys and L×M×N Gram matrices are batched XLA
  ops that tile onto the MXU, optionally sharded over a device mesh.
* **Pallas kernels** for the fusion-unfriendly hot spots (tiled fused
  distance+covariance Gram construction, MGGP's double-distance fusion).
* **SPMD scaling** via ``jax.sharding``: minibatches are sharded over the
  spot axis of a 1-D (or 2-D ``data × factor``) mesh; inducing-point
  parameters are replicated so the only cross-chip traffic is the gradient
  reduction over ICI.

Numerical conventions (positivity bijectors, variance floors, jitter
semantics, the unnormalized Poisson log-likelihood) replicate the reference
exactly where the reference is internally consistent, and are centralized in
:mod:`gpzoo_tpu.bijectors` / per-model ``var_floor`` fields where it is not
(see SURVEY.md §2.6).
"""

__version__ = "0.1.0"

from gpzoo_tpu import (
    bijectors,
    dists,
    kernels,
    gps,
    models,
    ops,
    train,
    data,
    parallel,
    predict,
    utils,
    warmstart,
)
from gpzoo_tpu.configs import (
    SVGPRegressionConfig,
    PNMFConfig,
    HybridNSFConfig,
    SlideseqHybridMGGPConfig,
    NSFConfig,
    MGGPNSFConfig,
    VNNGPConfig,
    SlideseqNSFConfig,
)

__all__ = [
    "bijectors",
    "dists",
    "kernels",
    "gps",
    "models",
    "ops",
    "train",
    "data",
    "parallel",
    "predict",
    "utils",
    "warmstart",
    "SVGPRegressionConfig",
    "PNMFConfig",
    "HybridNSFConfig",
    "SlideseqHybridMGGPConfig",
    "NSFConfig",
    "MGGPNSFConfig",
    "VNNGPConfig",
    "SlideseqNSFConfig",
]
