"""Minimal distribution pytrees.

The reference leans on ``torch.distributions`` for four things only:
``Normal`` / ``MultivariateNormal(scale_tril=...)`` / ``Poisson`` objects,
``rsample``, ``log_prob``, and ``kl_divergence`` between same-family pairs
(``utilities.py:479-481``, ``likelihoods.py`` passim). We implement exactly
that surface as immutable pytree dataclasses so distributions can flow
through ``jit`` / ``vmap`` / ``grad`` like any other array structure.

All math is shape-polymorphic over leading batch dims, mirroring the
reference's ``(L, ...)`` factor batching.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import struct

_LOG_2PI = 1.8378770664093453  # log(2*pi)


@struct.dataclass
class Normal:
    """Diagonal/elementwise normal, batch shape = broadcast(loc, scale)."""

    loc: Any
    scale: Any

    @property
    def mean(self):
        return self.loc

    def sample(self, key, sample_shape=()):
        """Reparameterized sample (torch ``rsample``); grads flow to params."""
        shape = tuple(sample_shape) + jnp.broadcast_shapes(
            jnp.shape(self.loc), jnp.shape(self.scale)
        )
        eps = jax.random.normal(key, shape, dtype=jnp.result_type(self.loc))
        return self.loc + self.scale * eps

    def log_prob(self, x):
        z = (x - self.loc) / self.scale
        return -0.5 * (z * z + _LOG_2PI) - jnp.log(self.scale)

    def variance(self):
        return jnp.square(self.scale)


@struct.dataclass
class MultivariateNormalTril:
    """MVN parameterized by a lower-triangular scale factor.

    ``loc``: (..., M); ``scale_tril``: (..., M, M) lower-triangular with
    positive diagonal. Mirrors ``torch.distributions.MultivariateNormal(
    loc, scale_tril=...)`` as used at ``gp.py:229-230``.
    """

    loc: Any
    scale_tril: Any

    @property
    def mean(self):
        return self.loc

    def sample(self, key, sample_shape=()):
        batch = jnp.broadcast_shapes(
            jnp.shape(self.loc), jnp.shape(self.scale_tril)[:-1]
        )
        shape = tuple(sample_shape) + batch
        eps = jax.random.normal(key, shape, dtype=jnp.result_type(self.loc))
        return self.loc + jnp.einsum("...ij,...j->...i", self.scale_tril, eps)

    def log_prob(self, x):
        diff = x - self.loc
        # broadcast batch dims like torch (sample dims on x vs the
        # distribution's batch): XLA's triangular_solve requires equal
        # batch ranks.
        tril = jnp.broadcast_to(
            self.scale_tril, diff.shape[:-1] + self.scale_tril.shape[-2:]
        )
        sol = jax.scipy.linalg.solve_triangular(
            tril, diff[..., None], lower=True
        )[..., 0]
        from gpzoo_tpu.ops.linalg import tril_logdet

        m = self.loc.shape[-1]
        half_logdet = tril_logdet(self.scale_tril)
        return -0.5 * (jnp.sum(sol * sol, axis=-1) + m * _LOG_2PI) - half_logdet


@struct.dataclass
class Poisson:
    rate: Any

    @property
    def mean(self):
        return self.rate

    def sample(self, key, sample_shape=()):
        shape = tuple(sample_shape) + jnp.shape(self.rate)
        return jax.random.poisson(key, self.rate, shape=shape)

    def log_prob(self, x):
        """Normalized Poisson log-pmf (torch parity, utilities.py:479,611).

        ``xlogy`` rather than ``x*log(rate)``: at (x=0, rate=0) the naive
        product is 0·(−inf) = NaN where torch's ``xlogy``-based
        implementation returns the correct limit 0 — reachable through
        ``LegacyHybridNSF``'s raw-W path when trainer clamping
        (utilities.py:623) drives a loadings row to exactly 0."""
        return (
            jax.scipy.special.xlogy(x, self.rate)
            - self.rate
            - jax.lax.lgamma(x + 1.0)
        )

    def unnormalized_log_prob(self, x):
        """``y·log(rate) − rate`` — the convention of the reference's
        hybrid minibatch trainer (utilities.py:510) and the Slideseq
        north-star notebook loop (cell 21), dropping the data-only
        ``log y!``. (``utilities.train_batched`` itself uses the
        normalized ``log_prob``, utilities.py:611.) Same ``xlogy``
        (y=0, rate=0) limit handling as :meth:`log_prob`."""
        return jax.scipy.special.xlogy(x, self.rate) - self.rate


@struct.dataclass
class NegativeBinomial:
    """Gamma-Poisson mixture in mean/dispersion form (beyond-reference).

    The reference is Poisson-only (``likelihoods.py`` passim), but real
    transcriptomics counts are overdispersed — the NSF paper this data
    pipeline descends from (willtownes/nsf-paper) ships a negative-
    binomial likelihood option. Parameterization: ``total_count`` r > 0
    (inverse dispersion; Poisson recovered as r → ∞) and ``rate`` μ > 0
    (the MEAN — matching :class:`Poisson` so factorization heads swap the
    two without touching the rate math). Variance = μ + μ²/r.

    Matches ``torch.distributions.NegativeBinomial(total_count=r,
    logits=log μ − log r)`` (parity-tested in tests/test_nb.py).
    """

    total_count: Any
    rate: Any

    @property
    def mean(self):
        return self.rate

    def variance(self):
        return self.rate + jnp.square(self.rate) / self.total_count

    def sample(self, key, sample_shape=()):
        """Gamma-Poisson: λ ~ Gamma(r, scale=μ/r), x ~ Poisson(λ).

        Not reparameterized (discrete) — like :meth:`Poisson.sample`;
        the ELBO heads sample latent F, never the counts."""
        kg, kp = jax.random.split(key)
        shape = tuple(sample_shape) + jnp.broadcast_shapes(
            jnp.shape(self.total_count), jnp.shape(self.rate)
        )
        g = jax.random.gamma(kg, self.total_count, shape=shape)
        lam = g * (self.rate / self.total_count)
        return jax.random.poisson(kp, lam)

    def log_prob(self, x):
        """lgamma(x+r) − lgamma(r) − lgamma(x+1) + xlogy(x, μ)
        + r·log r − (x+r)·log(μ+r).

        ``xlogy`` gives the correct 0-limit at (x=0, μ=0) — the same edge
        :meth:`Poisson.log_prob` handles (prob 1 at a zero-mean count)."""
        r, mu = self.total_count, self.rate
        return (
            jax.lax.lgamma(x + r)
            - jax.lax.lgamma(r)
            - jax.lax.lgamma(x + 1.0)
            + jax.scipy.special.xlogy(x, mu)
            + r * jnp.log(r)
            - (x + r) * jnp.log(mu + r)
        )

    def unnormalized_log_prob(self, x):
        """:meth:`log_prob` minus the data-only ``−lgamma(x+1)`` term —
        the NB analog of the reference's unnormalized Poisson convention
        (utilities.py:611). Every r-dependent term must stay: unlike
        Poisson's ``log y!``, the NB normalizer ``lgamma(x+r) − lgamma(r)``
        carries dispersion gradients."""
        r, mu = self.total_count, self.rate
        return (
            jax.lax.lgamma(x + r)
            - jax.lax.lgamma(r)
            + jax.scipy.special.xlogy(x, mu)
            + r * jnp.log(r)
            - (x + r) * jnp.log(mu + r)
        )


@struct.dataclass
class LowRankMultivariateNormal:
    """MVN with covariance ``diag(cov_diag) + cov_factor cov_factorᵀ``.

    Mirrors ``torch.distributions.LowRankMultivariateNormal``:
    ``loc`` (..., M), ``cov_factor`` (..., M, r), ``cov_diag`` (..., M)
    strictly positive VARIANCES. All dense algebra is O(M r² + r³) via
    the Woodbury identity / matrix determinant lemma — the covariance is
    never materialized. This is the variational family of
    :class:`gpzoo_tpu.gps.LowRankWSVGP`, built so the M×M inducing
    Cholesky (the measured step floor of the full parameterization at
    north-star scale) disappears from the training state entirely.
    """

    loc: Any
    cov_factor: Any
    cov_diag: Any

    @property
    def mean(self):
        return self.loc

    def variance(self):
        return self.cov_diag + jnp.sum(jnp.square(self.cov_factor), axis=-1)

    def sample(self, key, sample_shape=()):
        """Reparameterized: loc + V ε_r + sqrt(diag) ε_M."""
        batch = jnp.broadcast_shapes(
            jnp.shape(self.loc), jnp.shape(self.cov_factor)[:-1]
        )
        kr, km = jax.random.split(key)
        dtype = jnp.result_type(self.loc)
        r = jnp.shape(self.cov_factor)[-1]
        shape_r = tuple(sample_shape) + batch[:-1] + (r,)
        eps_r = jax.random.normal(kr, shape_r, dtype=dtype)
        eps_m = jax.random.normal(km, tuple(sample_shape) + batch,
                                  dtype=dtype)
        return (
            self.loc
            + jnp.einsum("...mr,...r->...m", self.cov_factor, eps_r)
            + jnp.sqrt(self.cov_diag) * eps_m
        )

    def _capacitance_tril(self):
        """chol(I_r + Vᵀ D⁻¹ V) — the r×r core of Woodbury/det-lemma."""
        vt_dinv = self.cov_factor / self.cov_diag[..., None]  # D⁻¹V
        r = self.cov_factor.shape[-1]
        cap = jnp.eye(r, dtype=self.cov_factor.dtype) + jnp.einsum(
            "...mi,...mj->...ij", self.cov_factor, vt_dinv
        )
        return jnp.linalg.cholesky(cap)

    def log_prob(self, x):
        from gpzoo_tpu.ops.linalg import tril_logdet

        diff = x - self.loc
        dinv_diff = diff / self.cov_diag
        vt_dinv_diff = jnp.einsum("...mr,...m->...r", self.cov_factor,
                                  dinv_diff)
        cap_tril = self._capacitance_tril()
        # broadcast sample dims of x against the distribution batch
        # (XLA's triangular_solve requires equal batch ranks)
        cap_b = jnp.broadcast_to(
            cap_tril, vt_dinv_diff.shape[:-1] + cap_tril.shape[-2:]
        )
        sol = jax.scipy.linalg.solve_triangular(
            cap_b, vt_dinv_diff[..., None], lower=True
        )[..., 0]
        maha = jnp.sum(diff * dinv_diff, axis=-1) - jnp.sum(sol * sol,
                                                            axis=-1)
        m = jnp.shape(self.loc)[-1]
        half_logdet = (
            0.5 * jnp.sum(jnp.log(self.cov_diag), axis=-1)
            + tril_logdet(cap_tril)
        )
        return -0.5 * (maha + m * _LOG_2PI) - half_logdet


def kl_normal_normal(q: Normal, p: Normal):
    """Elementwise KL(q‖p) for two diagonal normals."""
    var_ratio = jnp.square(q.scale / p.scale)
    t1 = jnp.square((q.loc - p.loc) / p.scale)
    return 0.5 * (var_ratio + t1 - 1.0 - jnp.log(var_ratio))


def kl_mvn_mvn(q: MultivariateNormalTril, p: MultivariateNormalTril):
    """KL(q‖p) between scale_tril MVNs, batched over leading dims.

    0.5·(tr(Σp⁻¹Σq) + ‖Lp⁻¹(μp−μq)‖² − M) + log|Lp| − log|Lq|,
    computed with triangular solves only (no explicit inverses).
    """
    lq, lp = q.scale_tril, p.scale_tril
    lq, lp = jnp.broadcast_arrays(lq, lp)
    a = jax.scipy.linalg.solve_triangular(lp, lq, lower=True)
    trace = jnp.sum(a * a, axis=(-2, -1))
    diff = p.loc - q.loc
    diff = jnp.broadcast_to(diff, lq.shape[:-2] + diff.shape[-1:])
    b = jax.scipy.linalg.solve_triangular(lp, diff[..., None], lower=True)[..., 0]
    maha = jnp.sum(b * b, axis=-1)
    from gpzoo_tpu.ops.linalg import tril_logdet

    m = lq.shape[-1]
    return 0.5 * (trace + maha - m) + tril_logdet(lp) - tril_logdet(lq)


def kl_divergence(q, p):
    """Dispatch analogous to ``torch.distributions.kl_divergence``."""
    if isinstance(q, Normal) and isinstance(p, Normal):
        return kl_normal_normal(q, p)
    if isinstance(q, MultivariateNormalTril) and isinstance(p, MultivariateNormalTril):
        return kl_mvn_mvn(q, p)
    raise NotImplementedError(f"KL({type(q).__name__} ‖ {type(p).__name__})")
