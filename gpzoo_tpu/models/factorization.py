"""Poisson factorization heads (PNMF / NSF / hybrids / MGGP-NSF).

All heads factorize a genes × spots count matrix ``y (D, N)`` as
``rate = sz · softplus(W) @ exp(F)`` with F drawn from a GP or mean-field
prior (reference ``likelihoods.py:39-374``).

Class mapping to the reference (likelihoods.py):

=====================  =============================  =====
here                   reference                      lines
=====================  =============================  =====
``PoissonFactorization``  ``PoissonFactorization``    :39-53
``PNMF``               ``PNMF``                       :56-72
``NSF``                ``NSF2``  (the main head)      :74-97
``LegacyNSF``          ``NSF``   (older inline head)  :216-253
``HybridNSF``          ``Hybrid_NSF2``                :100-165
``HybridNSFExact``     ``Hybrid_NSF_Exact``           :168-213
``LegacyHybridNSF``    ``Hybrid_NSF``                 :257-330
``MGGPNSF``            ``MGGP_NSF``                   :334-374
=====================  =============================  =====

Aliases with the reference names are exported from
:mod:`gpzoo_tpu.models`.

TPU note: the ``softplus(W) @ exp(F)`` rate is an (E·D·L·N) matmul — kept a
single batched MXU ``einsum`` over the E sample axis.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import struct

from gpzoo_tpu import dists
from gpzoo_tpu.bijectors import softplus


def _rate(w_raw, f_samples, apply_softplus=True):
    """softplus(W) @ exp(F): (D,Lt) @ (..., Lt, N) → (..., D, N)
    (likelihoods.py:49-53)."""
    w = softplus(w_raw) if apply_softplus else w_raw
    return jnp.einsum("dl,...ln->...dn", w, jnp.exp(f_samples))


@struct.dataclass
class PoissonFactorization:
    """Base pairing a prior with nonnegative loadings W (D, L)
    (likelihoods.py:39-53). W is stored raw and softplus'd in the rate."""

    prior: Any
    W_raw: Any

    @classmethod
    def create(cls, key, prior, D, L=10):
        return cls(prior=prior, W_raw=jax.random.uniform(key, (D, L)))

    def get_rate(self, f_samples):
        return _rate(self.W_raw, f_samples)


@struct.dataclass
class PNMF(PoissonFactorization):
    """Probabilistic NMF — Poisson factorization with a mean-field
    :class:`gpzoo_tpu.gps.GaussianPrior`, no GP (likelihoods.py:56-72)."""

    V_raw: Any = None  # (N,) per-spot size factor, softplus'd

    @classmethod
    def create(cls, key, prior, D, N, L=10):
        return cls(
            prior=prior,
            W_raw=jax.random.uniform(key, (D, L)),
            V_raw=jnp.ones((N,)),
        )

    def __call__(self, key, E=10, **kwargs):
        qf, pf = self.prior()
        f = qf.sample(key, (E,))
        rate = softplus(self.V_raw) * self.get_rate(f)
        return dists.Poisson(rate), qf, pf

    def batched(self, idx, key, E=10, **kwargs):
        qf, pf = self.prior.batched(idx)
        f = qf.sample(key, (E,))
        rate = softplus(self.V_raw[idx]) * self.get_rate(f)
        return dists.Poisson(rate), qf, pf


@struct.dataclass
class NSF(PoissonFactorization):
    """Nonnegative Spatial Factorization — the flagship head (reference
    ``NSF2``, likelihoods.py:74-97): Poisson counts with rate
    ``softplus(V) · softplus(W) @ exp(F)``, F from a (multi-factor) SVGP."""

    V_raw: Any = None

    @classmethod
    def create(cls, key, gp, D, N, L=10):
        return cls(
            prior=gp,
            W_raw=jax.random.uniform(key, (D, L)),
            V_raw=jnp.ones((N,)),
        )

    def __call__(self, x, key, E=10, **kwargs):
        qf, qu, pu = self.prior(x, **kwargs)
        f = qf.sample(key, (E,))
        rate = softplus(self.V_raw) * self.get_rate(f)
        return dists.Poisson(rate), qf, qu, pu

    def batched(self, x, idx, key, E=10, **kwargs):
        """Evaluate the GP only at X[idx] and slice V (likelihoods.py:90-97)."""
        qf, qu, pu = self.prior(x[idx], **kwargs)
        f = qf.sample(key, (E,))
        rate = softplus(self.V_raw[idx]) * self.get_rate(f)
        return dists.Poisson(rate), qf, qu, pu


@struct.dataclass
class NBNSF(NSF):
    """NSF with a negative-binomial likelihood (beyond-reference).

    Same rate ``softplus(V) · softplus(W) @ exp(F)`` as :class:`NSF`, but
    the counts are NB with a trainable per-gene inverse dispersion
    ``r = softplus(r_raw)`` (D,) — Poisson is the r → ∞ limit. The
    reference is Poisson-only; real transcriptomics counts are
    overdispersed and the nsf-paper pipeline the reference's data prep
    descends from offers NB. Drop-in with every generic ELBO and the
    blockwise/precomputed fast paths (dispatched on the ``r_raw`` field,
    tests/test_nb.py)."""

    r_raw: Any = None  # (D,) per-gene inverse dispersion, softplus'd

    @classmethod
    def create(cls, key, gp, D, N, L=10, total_count=10.0):
        from gpzoo_tpu.bijectors import init_softplus

        return cls(
            prior=gp,
            W_raw=jax.random.uniform(key, (D, L)),
            V_raw=jnp.ones((N,)),
            # result_type(float): strong dtype — a weak-typed leaf
            # silently recompiles the training program after the first
            # optimizer update
            r_raw=jnp.asarray(
                init_softplus(jnp.full((D,), float(total_count))),
                dtype=jnp.result_type(float),
            ),
        )

    def _py(self, rate):
        return dists.NegativeBinomial(
            softplus(self.r_raw)[:, None], rate
        )

    def __call__(self, x, key, E=10, **kwargs):
        qf, qu, pu = self.prior(x, **kwargs)
        f = qf.sample(key, (E,))
        rate = softplus(self.V_raw) * self.get_rate(f)
        return self._py(rate), qf, qu, pu

    def batched(self, x, idx, key, E=10, **kwargs):
        qf, qu, pu = self.prior(x[idx], **kwargs)
        f = qf.sample(key, (E,))
        rate = softplus(self.V_raw[idx]) * self.get_rate(f)
        return self._py(rate), qf, qu, pu


@struct.dataclass
class HybridNSF:
    """Spatial + non-spatial factorization (reference ``Hybrid_NSF2``,
    likelihoods.py:100-165): two Poisson-factorization halves — ``sf`` with
    a GP prior (L factors) and ``cf`` with a mean-field prior (T factors) —
    whose rates add. Returns the 6-tuple including (qF2, pF2) for the extra
    mean-field KL term."""

    sf: PoissonFactorization
    cf: PoissonFactorization
    V_raw: Any

    @classmethod
    def create(cls, key, gp, prior, D, N, L=10, T=10):
        k1, k2 = jax.random.split(key)
        return cls(
            sf=PoissonFactorization.create(k1, gp, D, L),
            cf=PoissonFactorization.create(k2, prior, D, T),
            V_raw=jnp.ones((N,)),
        )

    def _combine(self, f1, f2, v_raw):
        rate = self.sf.get_rate(f1) + self.cf.get_rate(f2)
        return dists.Poisson(softplus(v_raw) * rate)

    def __call__(self, x, key, E=10, **kwargs):
        k1, k2 = jax.random.split(key)
        qf1, qu, pu = self.sf.prior(x, **kwargs)
        qf2, pf2 = self.cf.prior()
        f1 = qf1.sample(k1, (E,))
        f2 = qf2.sample(k2, (E,))
        py = self._combine(f1, f2, self.V_raw)
        return py, qf1, qu, pu, qf2, pf2

    def batched(self, x, idx, key, E=10, **kwargs):
        # groups_x (multi-group sf prior) is passed FULL-length like
        # MGGP_NSF.batched and sliced here — the reference's caller-side
        # slice (notebook `groupsX=groupsX[idx]`) can't work when idx is
        # sampled inside the jitted step.
        if kwargs.get("groups_x") is not None:
            kwargs = dict(kwargs, groups_x=kwargs["groups_x"][idx])
        k1, k2 = jax.random.split(key)
        qf1, qu, pu = self.sf.prior(x[idx], **kwargs)
        qf2, pf2 = self.cf.prior.batched(idx)
        f1 = qf1.sample(k1, (E,))
        f2 = qf2.sample(k2, (E,))
        py = self._combine(f1, f2, self.V_raw[idx])
        return py, qf1, qu, pu, qf2, pf2

    def precomputed(self, w, idx, key, E=10, **kwargs):
        """Frozen-projection fast path pairing with
        ``WSVGP.forward_precomputed`` (likelihoods.py:147-164)."""
        k1, k2 = jax.random.split(key)
        qf1, qu, pu = self.sf.prior.forward_precomputed(w, **kwargs)
        qf2, pf2 = self.cf.prior.batched(idx)
        f1 = qf1.sample(k1, (E,))
        f2 = qf2.sample(k2, (E,))
        py = self._combine(f1, f2, self.V_raw[idx])
        return py, qf1, qu, pu, qf2, pf2


@struct.dataclass
class HybridNSFExact(HybridNSF):
    """Hybrid head using the lognormal mean E[e^F] = exp(μ + ½σ²) instead of
    Monte-Carlo samples (reference ``Hybrid_NSF_Exact``,
    likelihoods.py:178-213). Note the reference feeds ``μ + ½σ²`` into the
    shared exp-rate, so the rate uses exp(μ + ½σ²) exactly."""

    def __call__(self, x, key=None, E=10, **kwargs):
        qf1, qu, pu = self.sf.prior(x, **kwargs)
        qf2, pf2 = self.cf.prior()
        f1 = qf1.mean + 0.5 * jnp.square(qf1.scale)
        f2 = qf2.mean + 0.5 * jnp.square(qf2.scale)
        py = self._combine(f1, f2, self.V_raw)
        return py, qf1, qu, pu, qf2, pf2

    def batched(self, x, idx, key=None, E=10, **kwargs):
        # full-length groups_x sliced here, like HybridNSF.batched —
        # idx is sampled inside the jitted step
        if kwargs.get("groups_x") is not None:
            kwargs = dict(kwargs, groups_x=kwargs["groups_x"][idx])
        qf1, qu, pu = self.sf.prior(x[idx], **kwargs)
        qf2, pf2 = self.cf.prior.batched(idx)
        f1 = qf1.mean + 0.5 * jnp.square(qf1.scale)
        f2 = qf2.mean + 0.5 * jnp.square(qf2.scale)
        py = self._combine(f1, f2, self.V_raw[idx])
        return py, qf1, qu, pu, qf2, pf2


@struct.dataclass
class LegacyNSF:
    """Older NSF head (reference ``NSF``, likelihoods.py:216-253) — same
    math as :class:`NSF` with the rate computed inline; kept for API
    parity with notebooks that use it."""

    gp: Any
    W_raw: Any
    V_raw: Any

    @classmethod
    def create(cls, key, gp, D, N, L=10):
        return cls(
            gp=gp,
            W_raw=jax.random.uniform(key, (D, L)),
            V_raw=jnp.ones((N,)),
        )

    def __call__(self, x, key, E=10, **kwargs):
        qf, qu, pu = self.gp(x, **kwargs)
        f = qf.sample(key, (E,))
        rate = softplus(self.V_raw) * _rate(self.W_raw, f)
        return dists.Poisson(rate), qf, qu, pu

    def batched(self, x, idx, key, E=10, **kwargs):
        qf, qu, pu = self.gp(x[idx], **kwargs)
        f = qf.sample(key, (E,))
        rate = softplus(self.V_raw[idx]) * _rate(self.W_raw, f)
        return dists.Poisson(rate), qf, qu, pu


@struct.dataclass
class LegacyHybridNSF:
    """Single-module hybrid (reference ``Hybrid_NSF``,
    likelihoods.py:257-330). Quirk kept for parity: the concatenated
    loadings ``[W ‖ W2]`` are used RAW — not softplus'd
    (likelihoods.py:287-293) — relying on the trainer clamping them ≥ 0
    after each step (utilities.py:523-524, 553-554; see
    ``gpzoo_tpu.train.loop.clamp_nonnegative``)."""

    gp: Any
    W_raw: Any  # (D, L) spatial loadings — raw
    W2_raw: Any  # (D, T) non-spatial loadings — raw
    mF: Any  # (T, N) non-spatial factor means
    scale_qF_raw: Any  # (T, N), softplus'd
    V_raw: Any

    @classmethod
    def create(cls, key, gp, D, N, L=10, non_spatial_factors=10):
        k1, k2, k3 = jax.random.split(key, 3)
        T = non_spatial_factors
        return cls(
            gp=gp,
            W_raw=jax.random.uniform(k1, (D, L)),
            W2_raw=jax.random.uniform(k2, (D, T)),
            mF=jnp.zeros((T, N)),
            scale_qF_raw=1e-1 * jax.random.uniform(k3, (T, N)),
            V_raw=jnp.ones((N,)),
        )

    def _forward(self, qf, qf2, v_raw, key, E):
        k1, k2 = jax.random.split(key)
        f = qf.sample(k1, (E,))
        f2 = qf2.sample(k2, (E,))
        f_all = jnp.concatenate((f, f2), axis=-2)
        w_all = jnp.concatenate((self.W_raw, self.W2_raw), axis=-1)
        rate = softplus(v_raw) * _rate(w_all, f_all, apply_softplus=False)
        py = dists.Poisson(rate)
        pf2 = dists.Normal(jnp.zeros_like(qf2.loc), jnp.ones_like(qf2.scale))
        return py, pf2

    def __call__(self, x, key, E=10, **kwargs):
        qf, qu, pu = self.gp(x, **kwargs)
        qf2 = dists.Normal(self.mF, softplus(self.scale_qF_raw))
        py, pf2 = self._forward(qf, qf2, self.V_raw, key, E)
        return py, qf, qu, pu, qf2, pf2

    def batched(self, x, idx, key, E=10, **kwargs):
        qf, qu, pu = self.gp(x[idx], **kwargs)
        qf2 = dists.Normal(
            self.mF[:, idx], softplus(self.scale_qF_raw[:, idx])
        )
        py, pf2 = self._forward(qf, qf2, self.V_raw[idx], key, E)
        return py, qf, qu, pu, qf2, pf2


@struct.dataclass
class MGGPNSF:
    """NSF head threading per-spot group labels into a multi-group GP
    (reference ``MGGP_NSF``, likelihoods.py:334-374)."""

    gp: Any  # an MGGPSVGP / MGGPWSVGP
    W_raw: Any
    V_raw: Any

    @classmethod
    def create(cls, key, gp, D, N, L=10):
        return cls(
            gp=gp,
            W_raw=jax.random.uniform(key, (D, L)),
            V_raw=jnp.ones((N,)),
        )

    def __call__(self, x, key, E=10, *, groups_x, **kwargs):
        """Note: unlike the reference's positional ``forward(X, groupsX,
        E)`` (likelihoods.py:363), group labels are keyword-only here so
        the head shares the generic ELBO signatures
        (``negative_elbo*(..., groups_x=...)``)."""
        qf, qu, pu = self.gp(x, groups_x=groups_x, **kwargs)
        f = qf.sample(key, (E,))
        rate = softplus(self.V_raw) * _rate(self.W_raw, f)
        return dists.Poisson(rate), qf, qu, pu

    def batched(self, x, idx, key, E=10, *, groups_x, **kwargs):
        qf, qu, pu = self.gp(x[idx], groups_x=groups_x[idx], **kwargs)
        f = qf.sample(key, (E,))
        rate = softplus(self.V_raw[idx]) * _rate(self.W_raw, f)
        return dists.Poisson(rate), qf, qu, pu
