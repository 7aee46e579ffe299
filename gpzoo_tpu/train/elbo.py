"""ELBO objectives.

Each function mirrors one of the reference's training-loop loss bodies
(``utilities.py:471-632``) as a pure ``(model, data, key) → scalar loss``
suitable for ``jax.value_and_grad`` inside a jitted step. Conventions the
reference relies on are preserved:

* the expected log-likelihood is the mean over the E sample axis, then a
  *sum* over all (D, N) entries (utilities.py:479);
* the reference has BOTH Poisson conventions: ``utilities.train_batched``
  uses the normalized ``pY.log_prob`` (utilities.py:611) while
  ``train_hybrid_batched`` (utilities.py:510) and the Slideseq north-star
  notebook's inline loop (Slideseq_NSF_newest_version.ipynb cell 21) use
  the **unnormalized** ``y·log(rate) − rate``. The ``*_batched`` losses
  here default to ``unnormalized=True`` (the north-star convention;
  gradients are identical — ``log y!`` is constant); pass
  ``unnormalized=False`` to reproduce ``utilities.train_batched``
  loss values;
* the KL term is **not** rescaled by N/B on minibatches (a deliberate
  reference quirk, utilities.py:616);
* whitened GPs (``pU is None``) use the closed-form
  :func:`gpzoo_tpu.ops.linalg.whitened_kl` against N(0, I).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from gpzoo_tpu import dists
from gpzoo_tpu.bijectors import softplus
from gpzoo_tpu.ops.linalg import lowrank_whitened_kl, whitened_kl


def _gp_kl(qu, pu):
    """KL(qU‖pU): MVN-MVN when the prior is explicit, whitened closed form
    when pU is None (WSVGP contract, gp.py:304-306; the low-rank family
    of :class:`gpzoo_tpu.gps.LowRankWSVGP` gets the matrix-determinant-
    lemma form)."""
    if pu is None:
        if isinstance(qu, dists.LowRankMultivariateNormal):
            return jnp.sum(lowrank_whitened_kl(
                qu.loc, qu.cov_factor, qu.cov_diag))
        return jnp.sum(whitened_kl(qu.loc, qu.scale_tril))
    return jnp.sum(dists.kl_divergence(qu, pu))


def _expected_ll(py, y, unnormalized):
    # count likelihoods (Poisson, NegativeBinomial) expose the reference's
    # unnormalized convention; Gaussians don't and always normalize
    if unnormalized and hasattr(py, "unnormalized_log_prob"):
        lp = py.unnormalized_log_prob(y)
    else:
        lp = py.log_prob(y)
    return jnp.sum(jnp.mean(lp, axis=0))


def negative_elbo(model, x, y, key, E=20, unnormalized=False, **kwargs):
    """Full-batch −ELBO (utilities.py:471-493)."""
    py, qf, qu, pu = model(x, key=key, E=E, **kwargs)
    elbo = _expected_ll(py, y, unnormalized) - _gp_kl(qu, pu)
    return -elbo


def negative_elbo_batched(model, x, y, idx, key, E=20, unnormalized=True,
                          remat=False, **kwargs):
    """Minibatch −ELBO (utilities.py:600-621): the GP is evaluated at
    ``x[idx]`` only and the likelihood sees ``y[:, idx]``. See the module
    docstring for the normalized/unnormalized Poisson convention.

    ``remat=True`` rematerializes the model forward in the backward pass
    (``jax.checkpoint``): the L×M×B Gram/solve intermediates are recomputed
    instead of stored, trading ~1 extra forward of FLOPs for the several
    (L, B, M)-sized residuals that otherwise dominate HBM at Slideseq scale
    (the north-star step drops from ~30 GB of temps to well under one
    chip's HBM).
    """
    if y.shape[-1] != x.shape[0]:
        raise ValueError(
            f"y has {y.shape[-1]} spots (last axis) but x has "
            f"{x.shape[0]} — counts must be (D, N) aligned with X"
        )
    fwd = lambda m: m.batched(x, idx, key=key, E=E, **kwargs)  # noqa: E731
    if remat:
        fwd = jax.checkpoint(fwd)
    py, qf, qu, pu = fwd(model)
    elbo = _expected_ll(py, y[:, idx], unnormalized) - _gp_kl(qu, pu)
    return -elbo


def negative_elbo_hybrid(model, x, y, key, E=20, unnormalized=False, **kwargs):
    """Full-batch hybrid −ELBO with the extra mean-field KL
    (utilities.py:535-557)."""
    py, qf1, qu, pu, qf2, pf2 = model(x, key=key, E=E, **kwargs)
    elbo = _expected_ll(py, y, unnormalized) - _gp_kl(qu, pu)
    elbo = elbo - jnp.sum(dists.kl_divergence(qf2, pf2))
    return -elbo


def negative_elbo_hybrid_batched(model, x, y, idx, key, E=20,
                                 unnormalized=True, **kwargs):
    """Minibatch hybrid −ELBO (utilities.py:498-526)."""
    py, qf1, qu, pu, qf2, pf2 = model.batched(x, idx, key=key, E=E, **kwargs)
    elbo = _expected_ll(py, y[:, idx], unnormalized) - _gp_kl(qu, pu)
    elbo = elbo - jnp.sum(dists.kl_divergence(qf2, pf2))
    return -elbo


def pnmf_negative_elbo(model, y, key, E=20, unnormalized=False, **kwargs):
    """PNMF −ELBO: no GP, KL is mean-field Normal-Normal
    (PNMF_benchmarks.ipynb training cell)."""
    py, qf, pf = model(key=key, E=E, **kwargs)
    elbo = _expected_ll(py, y, unnormalized) - jnp.sum(
        dists.kl_divergence(qf, pf)
    )
    return -elbo


def pnmf_negative_elbo_batched(model, y, idx, key, E=20, unnormalized=True,
                               **kwargs):
    py, qf, pf = model.batched(idx, key=key, E=E, **kwargs)
    elbo = _expected_ll(py, y[:, idx], unnormalized) - jnp.sum(
        dists.kl_divergence(qf, pf)
    )
    return -elbo


def gaussian_exact_negative_elbo(model, x, y, key=None, E=1, **kwargs):
    """Analytic Gaussian ELBO for :class:`ExactLikelihood` — the sampled
    expected-LL is replaced by ``log N(y | qF.mean, noise)`` with the
    variance correction ``− Σ qF.scale² / (2·softplus(noise)²)``
    (mggp_test_exact.ipynb (cell 8))."""
    py, qf, qu, pu = model(x, key=key, E=E, **kwargs)
    noise = softplus(model.noise_raw)
    elbo = jnp.sum(py.log_prob(y))
    elbo = elbo - jnp.sum(jnp.square(qf.scale)) / (2.0 * jnp.square(noise))
    elbo = elbo - _gp_kl(qu, pu)
    return -elbo


def whitened_negative_elbo(model, x, y, key, E=20, **kwargs):
    """Convenience −ELBO for whitened GPs under a Gaussian likelihood
    (mggp_test.ipynb (cell 8)): sampled expected LL + whitened KL."""
    py, qf, qu, pu = model(x, key=key, E=E, **kwargs)
    elbo = _expected_ll(py, y, unnormalized=False)
    elbo = elbo - jnp.sum(whitened_kl(qu.loc, qu.scale_tril))
    return -elbo


def posterior_nll(qf, y_latent):
    """Gaussian negative log-likelihood of held-out latent values under the
    marginal posterior qF — the parity harness's posterior-quality metric."""
    return -jnp.sum(dists.Normal(qf.loc, qf.scale).log_prob(y_latent))
