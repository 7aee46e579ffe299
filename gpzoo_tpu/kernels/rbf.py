"""Stationary kernels (RBF / Matérn-3/2), single and L-batched.

Gram construction strategy (TPU-first): one squared-distance matrix is built
per (X, Z) pair — the cross term rides the MXU — and the L latent-factor
covariances are broadcast from it on the VPU, exactly the factorization the
MXU/HBM balance wants (the reference reaches the same shape two different
ways: a cdist in ``kernels.py:118,146`` or a double ``torch.vmap`` in
``kernels.py:29,58``; both families collapse to this one implementation).

Hyperparameters are stored unconstrained and enter the covariance squared
(σ², ℓ²), matching the reference's sign-invariant usage.

A fused Pallas path (:mod:`gpzoo_tpu.ops.gram_pallas`) computes
distance+covariance tiles in VMEM without materializing the distance matrix
in HBM; kernels dispatch to it when ``gpzoo_tpu.ops.gram_pallas.ENABLED``
and shapes qualify.
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import struct

from gpzoo_tpu.ops.distance import squared_dist
from gpzoo_tpu.ops.linalg import sqrt_safe_grad


def _bcast_hparam(p):
    """Reshape a (L,)-vector hyperparameter to (L, 1, 1); pass scalars /
    pre-shaped (L,1,1) through. Lets one implementation serve the scalar
    ``RBF``, the vector ``batched_RBF`` and the (L,1,1) ``NSF_RBF``."""
    p = jnp.asarray(p)
    if p.ndim == 1:
        return p[:, None, None]
    return p


@struct.dataclass
class RBF:
    """Squared-exponential kernel: σ² exp(−½‖x−z‖²/ℓ²) (kernels.py:106-130).

    ``sigma`` / ``lengthscale`` may be scalars (reference ``RBF``), (L,)
    vectors (reference ``batched_RBF``) or (L,1,1) (reference ``NSF_RBF``);
    the Gram is (N, M) for scalars and (L, N, M) otherwise.
    """

    sigma: Any
    lengthscale: Any
    input_dim: int = struct.field(pytree_node=False, default=2)

    # --- covariance from a precomputed squared-distance matrix -----------
    def gram_from_squared_dist(self, d2):
        """σ² exp(−½ d²/ℓ²); lets distances be reused (kernels.py:128-130)."""
        sigma = _bcast_hparam(self.sigma)
        ell = _bcast_hparam(self.lengthscale)
        return jnp.square(sigma) * jnp.exp(-0.5 * d2 / jnp.square(ell))

    # --- public Gram interface -------------------------------------------
    def diag(self, x, groups=None):
        """k(x,x) diagonal: σ² expanded to (N,) or (L, N)
        (kernels.py:115-116,143-144)."""
        n = x.shape[0]
        var = jnp.square(jnp.asarray(self.sigma)).reshape(-1)
        if var.shape[0] == 1:
            return jnp.broadcast_to(var[0], (n,))
        return jnp.broadcast_to(var[:, None], (var.shape[0], n))

    def gram(self, x, z, groups_x=None, groups_z=None):
        out = self._gram_pallas(x, z)
        if out is not None:
            return out
        return self.gram_from_squared_dist(self._d2(x, z))

    def _gram_pallas(self, x, z):
        """Fused Pallas path (ops.gram_pallas) when shapes/backend qualify;
        returns None to fall back to the XLA path."""
        from gpzoo_tpu.ops import gram_pallas

        if not gram_pallas.enabled_for(
            x.shape[0], z.shape[0], x.shape[-1], jnp.result_type(x)
        ):
            return None
        sigma = jnp.asarray(self.sigma).reshape(-1)
        ell = jnp.asarray(self.lengthscale).reshape(-1)
        L = max(sigma.shape[0], ell.shape[0])
        scalar = (
            jnp.asarray(self.sigma).ndim == 0
            and jnp.asarray(self.lengthscale).ndim == 0
        )
        out = gram_pallas.rbf_gram(
            x, z, jnp.broadcast_to(sigma, (L,)), jnp.broadcast_to(ell, (L,))
        )
        return out[0] if scalar else out

    def gram_and_distance(self, x, z, groups_x=None, groups_z=None):
        """Gram plus the raw distance matrix, for VNNGP neighbor search
        (kernels.py:123-124)."""
        d2 = self._d2(x, z)
        return self.gram_from_squared_dist(d2), sqrt_safe_grad(d2)

    def _d2(self, x, z):
        return squared_dist(x, z)

    def variance_vector(self):
        """σ² shaped (L, 1) (or scalar) — broadcastable against (L, N)
        marginal variances; used by the precomputed-projection fast path."""
        var = jnp.square(jnp.asarray(self.sigma)).reshape(-1)
        if var.shape[0] == 1:
            return var[0]
        return var[:, None]


@struct.dataclass
class NSFRBF(RBF):
    """L-batched RBF for multi-factor GPs (reference ``NSF_RBF``,
    kernels.py:133-155): per-factor (L,1,1) σ and ℓ over one shared
    distance matrix.

    Construct with :meth:`create` to get the reference's constant-filled
    (L,1,1) initialization.
    """

    @classmethod
    def create(cls, sigma=1.0, lengthscale=2.0, L=10, input_dim=2):
        return cls(
            sigma=sigma * jnp.ones((L, 1, 1)),
            lengthscale=lengthscale * jnp.ones((L, 1, 1)),
            input_dim=input_dim,
        )


@struct.dataclass
class BatchedRBF(RBF):
    """Reference ``batched_RBF`` (kernels.py:34-59): scalar or (L,)-vector
    hyperparameters (used with per-factor σ/ℓ estimation in
    ``Slideseqv2_estimate_lengthscales.ipynb``). Same math as :class:`RBF`;
    the reference's double-``torch.vmap`` construction is replaced by the
    shared distance matrix + broadcast, which is algebraically identical.
    """


@struct.dataclass
class Matern32:
    """Matérn-3/2: σ²(1 + √3 d/ℓ) exp(−√3 d/ℓ) (kernels.py:6-30).

    Scalar or (L,)-vector hyperparameters, like :class:`BatchedRBF`.
    """

    sigma: Any
    lengthscale: Any
    input_dim: int = struct.field(pytree_node=False, default=2)

    def diag(self, x, groups=None):
        n = x.shape[0]
        var = jnp.square(jnp.asarray(self.sigma)).reshape(-1)
        if var.shape[0] == 1:
            return jnp.broadcast_to(var[0], (n,))
        return jnp.broadcast_to(var[:, None], (var.shape[0], n))

    def gram(self, x, z, groups_x=None, groups_z=None):
        # sqrt_safe_grad, not jnp.sqrt: at d=0 (every Kzz diagonal, any
        # query coinciding with an inducing point) the plain sqrt VJP is
        # 0·inf = NaN, silently NaN'ing Z-updates of any SVGP/VNNGP with a
        # trainable-Z Matérn. The true gradient there is 0 (Matérn-3/2 is
        # C¹); values are unchanged. Reference: _torch_sqrt,
        # utilities.py:450-456.
        d = sqrt_safe_grad(squared_dist(x, z))
        sigma = _bcast_hparam(self.sigma)
        ell = _bcast_hparam(self.lengthscale)
        val = jnp.sqrt(3.0) * d / ell
        return jnp.square(sigma) * (1.0 + val) * jnp.exp(-val)

    def gram_and_distance(self, x, z, groups_x=None, groups_z=None):
        d = sqrt_safe_grad(squared_dist(x, z))
        sigma = _bcast_hparam(self.sigma)
        ell = _bcast_hparam(self.lengthscale)
        val = jnp.sqrt(3.0) * d / ell
        return jnp.square(sigma) * (1.0 + val) * jnp.exp(-val), d
