"""Sparse variational GP posteriors (unwhitened and whitened).

Produces the reference's three-distribution contract
``gp(X) → (qF, qU, pU)`` (``gp.py:183-232``, ``gp.py:260-306``):

* ``qF`` — diagonal-Normal marginal posterior at the query points,
* ``qU`` — variational inducing distribution N(μ, Lu Luᵀ),
* ``pU`` — GP prior at the inducing points N(0, Kzz) (``None`` for the
  whitened parameterization, whose KL is the closed form
  :func:`gpzoo_tpu.ops.linalg.whitened_kl` against N(0, I)).

Everything is batched over an optional leading L (latent-factor) axis held
by the kernel hyperparameters and/or ``mu``/``Lu``; the L×M×M Choleskys and
triangular solves are single batched XLA calls.

TPU notes: the whitened path costs one triangular solve where the
unwhitened path costs a ``cho_solve`` (two solves) and additionally needs
``S = Lu Luᵀ`` materialized; prefer :class:`WSVGP` for training throughput.
Cholesky inputs stay float32 with the caller-chosen jitter (the reference's
configs use jitter up to 1e-1 for exactly this reason); distance/Gram
matmuls run at HIGHEST precision (see :mod:`gpzoo_tpu.ops.distance`).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import struct

from gpzoo_tpu import dists
from gpzoo_tpu.bijectors import lower_cholesky, softplus, softplus_inverse
from gpzoo_tpu.ops.linalg import add_jitter, sqrt_safe_grad, svgp_forward


def _posterior_tail(kxx, kzz_jittered, lzz, w, mu, lu_raw, var_floor):
    """Shared unwhitened tail: S = Lu Luᵀ → svgp_forward → distributions."""
    lu = lower_cholesky(lu_raw)
    s = jnp.einsum("...ij,...kj->...ik", lu, lu)
    mean, cov_diag = svgp_forward(kxx, kzz_jittered, w, mu, s)
    qf = dists.Normal(mean, jnp.sqrt(jnp.clip(cov_diag, min=var_floor)))
    qu = dists.MultivariateNormalTril(mu, lu)
    pu = dists.MultivariateNormalTril(jnp.zeros_like(mu), lzz)
    return qf, qu, pu


@struct.dataclass
class SVGP:
    """Canonical (unwhitened) SVGP (reference ``SVGP``, gp.py:149-232).

    Fields:
      kernel — any :mod:`gpzoo_tpu.kernels` kernel (its L-batching decides
               whether qF has a leading factor axis),
      Z  (M, dim) inducing locations,
      mu (M,) or (L, M) inducing mean,
      Lu_raw (M, M) or (L, M, M) unconstrained Cholesky
             (diag exp'd by :func:`gpzoo_tpu.bijectors.lower_cholesky`,
             matching ``transform_to(lower_cholesky)`` at gp.py:220),
      jitter — added to Kzz once; the jittered matrix feeds both the
               Cholesky and ``svgp_forward`` (replicating the reference's
               in-place ``add_jitter`` data flow, utilities.py:407-418),
      var_floor — qF variance clamp (1e-6 at gp.py:228).
    """

    kernel: Any
    Z: Any
    mu: Any
    Lu_raw: Any
    jitter: float = struct.field(pytree_node=False, default=1e-4)
    var_floor: float = struct.field(pytree_node=False, default=1e-6)

    @classmethod
    def create(cls, key, kernel, dim=1, M=50, jitter=1e-4, var_floor=1e-6):
        """Random init matching gp.py:149-161: Z ~ N(0,1), Lu_raw ~ N(0,1),
        mu = 0."""
        kz, kl = jax.random.split(key)
        return cls(
            kernel=kernel,
            Z=jax.random.normal(kz, (M, dim)),
            mu=jnp.zeros((M,)),
            Lu_raw=jax.random.normal(kl, (M, M)),
            jitter=jitter,
            var_floor=var_floor,
        )

    def _gram(self, x):
        kxx = self.kernel.diag(x)
        kzx = self.kernel.gram(self.Z, x)
        kzz = add_jitter(self.kernel.gram(self.Z, self.Z), self.jitter)
        return kxx, kzx, kzz

    def __call__(self, x, **kwargs):
        kxx, kzx, kzz = self._gram(x)
        lzz = jnp.linalg.cholesky(kzz)
        # W = (Kzz⁻¹ Kzx)ᵀ via two triangular solves (gp.py:218-219).
        w = jnp.swapaxes(
            jax.scipy.linalg.cho_solve((lzz, True), kzx), -2, -1
        )
        return _posterior_tail(kxx, kzz, lzz, w, self.mu, self.Lu_raw,
                               self.var_floor)


@struct.dataclass
class WSVGP:
    """Whitened SVGP (reference ``WSVGP``, gp.py:235-322).

    The variational distribution lives in the whitened space
    ``u = Lzz v + 0`` with prior v ~ N(0, I): ``W = Kxz Lzz⁻ᵀ``,
    ``cov = clamp(Kxx − Σ W², 0) + Σ (W Lu)²``, and ``pU = None`` — the
    training loss pairs qU with :func:`gpzoo_tpu.ops.linalg.whitened_kl`.
    """

    kernel: Any
    Z: Any
    mu: Any
    Lu_raw: Any
    jitter: float = struct.field(pytree_node=False, default=1e-4)

    @classmethod
    def create(cls, key, kernel, dim=1, M=50, jitter=1e-4):
        kz, kl = jax.random.split(key)
        return cls(
            kernel=kernel,
            Z=jax.random.normal(kz, (M, dim)),
            mu=jnp.zeros((M,)),
            Lu_raw=jax.random.normal(kl, (M, M)),
            jitter=jitter,
        )

    def _gram(self, x, **kwargs):
        """Hook for group-aware subclasses (gp.py:252-258)."""
        kxx = self.kernel.diag(x)
        kzx = self.kernel.gram(self.Z, x)
        kzz = add_jitter(self.kernel.gram(self.Z, self.Z), self.jitter)
        return kxx, kzx, kzz

    def __call__(self, x, **kwargs):
        kxx, kzx, kzz = self._gram(x, **kwargs)
        lzz = jnp.linalg.cholesky(kzz)
        wt = jax.scipy.linalg.solve_triangular(lzz, kzx, lower=True)
        w = jnp.swapaxes(wt, -2, -1)  # (…, N, M) = Kxz Lzz⁻ᵀ
        return self._tail(kxx, w)

    def _tail(self, kxx, w):
        lu = lower_cholesky(self.Lu_raw)
        cov_diag = jnp.clip(kxx - jnp.sum(jnp.square(w), axis=-1), min=0.0)
        wlu = jnp.einsum("...nm,...mk->...nk", w, lu)
        cov_diag = cov_diag + jnp.sum(jnp.square(wlu), axis=-1)
        mean = jnp.einsum("...nm,...m->...n", w, self.mu)
        # sqrt_safe_grad: the clamp can leave cov_diag exactly 0 (reference
        # clamps the same way, gp.py:287); plain sqrt would NaN the VJP
        # there. Values are unchanged.
        qf = dists.Normal(mean, sqrt_safe_grad(cov_diag))
        qu = dists.MultivariateNormalTril(self.mu, lu)
        return qf, qu, None

    def forward_precomputed(self, w, **kwargs):
        """Posterior from a frozen projection matrix W (gp.py:308-322):
        ``Kxx`` is replaced by the kernel variance σ² (valid for stationary
        kernels). Used when Z and the kernel are frozen so W is computed
        once for the full dataset and batches are row-gathers of it."""
        kxx = self.kernel.variance_vector()
        return self._tail(kxx, w)


@struct.dataclass
class LowRankWSVGP:
    """Whitened SVGP with a low-rank-plus-diagonal variational covariance.

    Beyond-reference extension (no counterpart in /root/reference; the
    closest concept is torch's ``LowRankMultivariateNormal``): the
    whitened inducing posterior is q(v) = N(μ, D + VVᵀ) with ``V``
    (…, M, r) and ``D = diag(softplus(d_raw)²)`` instead of the full
    (…, M, M) Cholesky ``Lu``. At north-star scale (L=20, M=3000) the
    full Lu is 720 MB and its (L, M, M)×(M, B) posterior contraction +
    Adam traffic set the measured step floor (docs/PERFORMANCE.md); the
    low-rank family replaces both with O(M·r) state and O(r·M·B)
    matmuls, at the cost of restricting q's covariance to
    Lzz (D + VVᵀ) Lzzᵀ in u-space.

    Contract matches :class:`WSVGP`: ``gp(x) → (qF, qU, pU=None)`` with
    ``qU`` a :class:`gpzoo_tpu.dists.LowRankMultivariateNormal`; the
    training KL is :func:`gpzoo_tpu.ops.linalg.lowrank_whitened_kl`
    (closed form against N(0, I), matrix-determinant-lemma logdet).
    """

    kernel: Any
    Z: Any
    mu: Any
    V: Any
    d_raw: Any
    jitter: float = struct.field(pytree_node=False, default=1e-4)

    @classmethod
    def create(cls, key, kernel, dim=1, M=50, rank=16, jitter=1e-4,
               v_scale=1e-2):
        """Init: Z ~ N(0,1), μ = 0, D = I (the full config's Lu = I
        start), V ~ v_scale·N(0,1) — V must not start at exactly 0,
        which is a stationary point of both the KL and the posterior
        variance in V (all V-gradients vanish there)."""
        kz, kv = jax.random.split(key)
        return cls(
            kernel=kernel,
            Z=jax.random.normal(kz, (M, dim)),
            mu=jnp.zeros((M,)),
            V=v_scale * jax.random.normal(kv, (M, rank)),
            # explicit dtype: a weak-typed d_raw would silently change the
            # jit signature after the first optimizer update (one wasted
            # recompile of every training program — observed ~17 s at toy
            # scale over the TPU tunnel)
            d_raw=jnp.full((M,), softplus_inverse(jnp.asarray(1.0)),
                           dtype=jnp.result_type(float)),
            jitter=jitter,
        )

    @property
    def rank(self):
        return self.V.shape[-1]

    def _gram(self, x, **kwargs):
        kxx = self.kernel.diag(x)
        kzx = self.kernel.gram(self.Z, x)
        kzz = add_jitter(self.kernel.gram(self.Z, self.Z), self.jitter)
        return kxx, kzx, kzz

    def __call__(self, x, **kwargs):
        kxx, kzx, kzz = self._gram(x, **kwargs)
        lzz = jnp.linalg.cholesky(kzz)
        wt = jax.scipy.linalg.solve_triangular(lzz, kzx, lower=True)
        w = jnp.swapaxes(wt, -2, -1)  # (…, N, M) = Kxz Lzz⁻ᵀ
        return self._tail(kxx, w)

    def _tail(self, kxx, w):
        d = softplus(self.d_raw)
        var_diag = jnp.square(d)
        # diag(W S Wᵀ) = Σ_m D_mm W²_nm + Σ_k (W V)²_nk — no M×M tensor.
        cov_diag = jnp.clip(kxx - jnp.sum(jnp.square(w), axis=-1), min=0.0)
        cov_diag = cov_diag + jnp.einsum("...nm,...m->...n",
                                         jnp.square(w), var_diag)
        wv = jnp.einsum("...nm,...mk->...nk", w, self.V)
        cov_diag = cov_diag + jnp.sum(jnp.square(wv), axis=-1)
        mean = jnp.einsum("...nm,...m->...n", w, self.mu)
        qf = dists.Normal(mean, sqrt_safe_grad(cov_diag))
        qu = dists.LowRankMultivariateNormal(self.mu, self.V, var_diag)
        return qf, qu, None

    def forward_precomputed(self, w, **kwargs):
        """Posterior from a frozen projection matrix W (see
        :meth:`WSVGP.forward_precomputed`)."""
        kxx = self.kernel.variance_vector()
        return self._tail(kxx, w)
