"""Gaussian observation heads over a GP posterior.

Reference ``GaussianLikelihood`` / ``ExactLikelihood``
(likelihoods.py:7-36). Sampling takes an explicit PRNG key (the JAX analog
of torch's global-RNG ``rsample``).
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import struct

from gpzoo_tpu import dists
from gpzoo_tpu.bijectors import softplus


@struct.dataclass
class GaussianLikelihood:
    """pY = N(F, softplus(noise)) around E reparameterized samples of qF
    (likelihoods.py:14-20)."""

    gp: Any
    noise_raw: Any

    @classmethod
    def create(cls, gp, noise=0.1):
        # result_type(float): strong dtype — a weak-typed leaf silently
        # recompiles the training program after the first update
        return cls(gp=gp, noise_raw=jnp.asarray(
            noise, dtype=jnp.result_type(float)))

    def __call__(self, x, key, E=1, **kwargs):
        qf, qu, pu = self.gp(x, **kwargs)
        f = qf.sample(key, (E,))
        py = dists.Normal(f, softplus(self.noise_raw))
        return py, qf, qu, pu


@struct.dataclass
class ExactLikelihood:
    """pY = N(qF.mean, softplus(noise)) — no sampling (likelihoods.py:30-36);
    pairs with the analytic variance-corrected ELBO
    (:func:`gpzoo_tpu.train.elbo.gaussian_exact_elbo`)."""

    gp: Any
    noise_raw: Any

    @classmethod
    def create(cls, gp, noise=0.1):
        # result_type(float): strong dtype — a weak-typed leaf silently
        # recompiles the training program after the first update
        return cls(gp=gp, noise_raw=jnp.asarray(
            noise, dtype=jnp.result_type(float)))

    def __call__(self, x, key=None, E=1, **kwargs):
        qf, qu, pu = self.gp(x, **kwargs)
        py = dists.Normal(qf.mean, softplus(self.noise_raw))
        return py, qf, qu, pu
