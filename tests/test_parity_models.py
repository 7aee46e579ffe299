"""Float64 parity for the likelihood/factorization heads: Poisson rates at
fixed latent samples, deterministic heads end-to-end, and full ELBO values
at common random draws."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")
from parity_utils import import_reference, t2n  # noqa: E402

gpzoo = import_reference()

from gpzoo_tpu import dists, gps, kernels, models  # noqa: E402
from gpzoo_tpu.ops import whitened_kl  # noqa: E402

torch.set_default_dtype(torch.float64)


def _mirrored_nsf(rng, D=7, N=15, L=3, M=8, jitter=1e-2):
    """Build reference NSF2(SVGP(NSF_RBF)) and its mirrored gpzoo_tpu twin."""
    x = rng.standard_normal((N, 2))
    y = rng.poisson(3.0, (D, N)).astype(np.float64)
    refk = gpzoo.kernels.NSF_RBF(sigma=1.1, lengthscale=0.9, L=L).double()
    refgp = gpzoo.gp.SVGP(refk, dim=2, M=M, jitter=jitter).double()
    ref = gpzoo.likelihoods.NSF2(refgp, torch.tensor(y), L=L).double()

    ourk = kernels.NSFRBF(
        sigma=jnp.asarray(t2n(refk.sigma)),
        lengthscale=jnp.asarray(t2n(refk.lengthscale)),
    )
    ourgp = gps.SVGP(
        kernel=ourk,
        Z=jnp.asarray(t2n(refgp.Z)),
        mu=jnp.asarray(t2n(refgp.mu)),
        Lu_raw=jnp.asarray(t2n(refgp.Lu)),
        jitter=jitter,
    )
    ours = models.NSF(
        prior=ourgp,
        W_raw=jnp.asarray(t2n(ref.W)),
        V_raw=jnp.asarray(t2n(ref.V)),
    )
    return x, y, ref, ours


def test_nsf_rate_at_common_f(rng):
    """rate = softplus(V)·softplus(W)@exp(F) at identical F draws
    (likelihoods.py:49-53, 80-87)."""
    x, y, ref, ours = _mirrored_nsf(rng)
    E, L, N = 2, 3, 15
    f = rng.standard_normal((E, L, N))

    rate_ref = torch.nn.functional.softplus(ref.V) * ref.get_rate(
        torch.tensor(f)
    )
    from gpzoo_tpu.bijectors import softplus
    from gpzoo_tpu.models.factorization import _rate

    rate_ours = softplus(ours.V_raw) * _rate(ours.W_raw, jnp.asarray(f))
    np.testing.assert_allclose(np.asarray(rate_ours), t2n(rate_ref),
                               rtol=1e-9)


def test_nsf_elbo_at_common_f(rng):
    """Full minibatch-convention ELBO (utilities.py:609-616) with F fixed to
    the posterior mean on both sides."""
    x, y, ref, ours = _mirrored_nsf(rng)
    idx = np.array([0, 3, 5, 9, 11])

    # reference pieces
    qf_t, qu_t, pu_t = ref.prior(torch.tensor(x[idx]))
    f_t = qf_t.mean[None]  # E=1 'sample' = mean
    rate_t = torch.nn.functional.softplus(ref.V[torch.tensor(idx)]) \
        * ref.get_rate(f_t)
    y_t = torch.tensor(y[:, idx])
    logp_t = y_t * torch.log(rate_t) - rate_t
    elbo_t = logp_t.mean(axis=0).sum() - torch.sum(
        torch.distributions.kl_divergence(qu_t, pu_t)
    )

    # ours
    qf, qu, pu = ours.prior(jnp.asarray(x)[jnp.asarray(idx)])
    f = qf.mean[None]
    from gpzoo_tpu.bijectors import softplus
    from gpzoo_tpu.models.factorization import _rate

    rate = softplus(ours.V_raw[jnp.asarray(idx)]) * _rate(ours.W_raw, f)
    logp = dists.Poisson(rate).unnormalized_log_prob(jnp.asarray(y[:, idx]))
    elbo = jnp.sum(jnp.mean(logp, axis=0)) - jnp.sum(
        dists.kl_divergence(qu, pu)
    )
    assert float(elbo) == pytest.approx(float(elbo_t), rel=1e-8)


def test_pnmf_deterministic_pieces(rng):
    D, N, L = 6, 12, 3
    y = rng.poisson(2.0, (D, N)).astype(np.float64)
    refp = gpzoo.gp.GaussianPrior(torch.tensor(y), L=L).double()
    ref = gpzoo.likelihoods.PNMF(refp, torch.tensor(y), L=L).double()

    ourp = gps.GaussianPrior(
        mean=jnp.asarray(t2n(refp.mean)),
        scale_raw=jnp.asarray(t2n(refp.scale)),
        scale_pf=refp.scale_pf,
    )
    ours = models.PNMF(
        prior=ourp,
        W_raw=jnp.asarray(t2n(ref.W)),
        V_raw=jnp.asarray(t2n(ref.V)),
    )

    # KL(qF‖pF)
    qf_t, pf_t = refp()
    qf, pf = ourp()
    kl_t = torch.sum(torch.distributions.kl_divergence(qf_t, pf_t))
    kl = jnp.sum(dists.kl_divergence(qf, pf))
    assert float(kl) == pytest.approx(float(kl_t), rel=1e-9)

    # rate at common F
    f = rng.standard_normal((2, L, N))
    rate_t = torch.nn.functional.softplus(ref.V) * ref.get_rate(
        torch.tensor(f)
    )
    from gpzoo_tpu.bijectors import softplus
    from gpzoo_tpu.models.factorization import _rate

    rate = softplus(ours.V_raw) * _rate(ours.W_raw, jnp.asarray(f))
    np.testing.assert_allclose(np.asarray(rate), t2n(rate_t), rtol=1e-9)


def test_hybrid_nsf_exact_end_to_end(rng):
    """Hybrid_NSF_Exact is fully deterministic — whole forward compared
    (likelihoods.py:178-193)."""
    D, N, L, T, M = 5, 14, 2, 3, 7
    x = rng.standard_normal((N, 2))
    y = rng.poisson(2.0, (D, N)).astype(np.float64)

    refk = gpzoo.kernels.NSF_RBF(sigma=1.0, lengthscale=1.0, L=L).double()
    refgp = gpzoo.gp.SVGP(refk, dim=2, M=M, jitter=1e-2).double()
    refp = gpzoo.gp.GaussianPrior(torch.tensor(y), L=T).double()
    ref = gpzoo.likelihoods.Hybrid_NSF_Exact(
        refgp, refp, torch.tensor(y), L=L, T=T
    ).double()

    ourk = kernels.NSFRBF(
        sigma=jnp.asarray(t2n(refk.sigma)),
        lengthscale=jnp.asarray(t2n(refk.lengthscale)),
    )
    ourgp = gps.SVGP(
        kernel=ourk,
        Z=jnp.asarray(t2n(refgp.Z)),
        mu=jnp.asarray(t2n(refgp.mu)),
        Lu_raw=jnp.asarray(t2n(refgp.Lu)),
        jitter=1e-2,
    )
    ourp = gps.GaussianPrior(
        mean=jnp.asarray(t2n(refp.mean)),
        scale_raw=jnp.asarray(t2n(refp.scale)),
        scale_pf=refp.scale_pf,
    )
    ours = models.HybridNSFExact(
        sf=models.PoissonFactorization(
            prior=ourgp, W_raw=jnp.asarray(t2n(ref.sf.W))
        ),
        cf=models.PoissonFactorization(
            prior=ourp, W_raw=jnp.asarray(t2n(ref.cf.W))
        ),
        V_raw=jnp.asarray(t2n(ref.V)),
    )

    py_t, qf1_t, qu_t, pu_t, qf2_t, pf2_t = ref(torch.tensor(x))
    py, qf1, qu, pu, qf2, pf2 = ours(jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(py.rate), t2n(py_t.rate),
                               rtol=1e-8)

    # batched variant too (likelihoods.py:196-213)
    idx = np.array([1, 4, 6])
    py_tb = ref.forward_batched(torch.tensor(x), torch.tensor(idx))[0]
    py_b = ours.batched(jnp.asarray(x), jnp.asarray(idx))[0]
    np.testing.assert_allclose(np.asarray(py_b.rate), t2n(py_tb.rate),
                               rtol=1e-8)


def test_legacy_hybrid_raw_w_rate(rng):
    """Hybrid_NSF's raw (non-softplus'd) concatenated loadings
    (likelihoods.py:287-293) at common F draws."""
    D, N, L, T = 4, 10, 2, 2
    y = rng.poisson(2.0, (D, N)).astype(np.float64)
    refk = gpzoo.kernels.NSF_RBF(sigma=1.0, lengthscale=1.0, L=L).double()
    refgp = gpzoo.gp.SVGP(refk, dim=2, M=6, jitter=1e-2).double()
    ref = gpzoo.likelihoods.Hybrid_NSF(
        refgp, torch.tensor(y), L=L, non_spatial_factors=T
    ).double()

    f = rng.standard_normal((3, L, N))
    f2 = rng.standard_normal((3, T, N))
    w_all_t = torch.cat((ref.W, ref.W2), dim=1)
    f_all_t = torch.exp(torch.cat((torch.tensor(f), torch.tensor(f2)), dim=1))
    rate_t = torch.nn.functional.softplus(ref.V) * (w_all_t @ f_all_t)

    from gpzoo_tpu.bijectors import softplus
    from gpzoo_tpu.models.factorization import _rate

    w_all = jnp.concatenate(
        (jnp.asarray(t2n(ref.W)), jnp.asarray(t2n(ref.W2))), axis=-1
    )
    f_all = jnp.concatenate((jnp.asarray(f), jnp.asarray(f2)), axis=-2)
    rate = softplus(jnp.asarray(t2n(ref.V))) * _rate(
        w_all, f_all, apply_softplus=False
    )
    np.testing.assert_allclose(np.asarray(rate), t2n(rate_t), rtol=1e-9)


def test_gaussian_exact_likelihood_elbo(rng):
    """ExactLikelihood analytic ELBO (mggp_test_exact.ipynb cell 8)."""
    N, M = 20, 9
    x = rng.standard_normal((N, 1))
    y = rng.standard_normal(N)
    refk = gpzoo.kernels.RBF(sigma=1.0, lengthscale=1.0).double()
    refgp = gpzoo.gp.SVGP(refk, dim=1, M=M, jitter=1e-2).double()
    ref = gpzoo.likelihoods.ExactLikelihood(refgp, noise=0.3).double()

    py_t, qf_t, qu_t, pu_t = ref(torch.tensor(x))
    noise_t = torch.nn.functional.softplus(ref.noise)
    elbo_t = (
        py_t.log_prob(torch.tensor(y)).sum()
        - torch.sum(qf_t.scale**2) / (2 * noise_t**2)
        - torch.sum(torch.distributions.kl_divergence(qu_t, pu_t))
    )

    ourk = kernels.RBF(
        sigma=jnp.asarray(t2n(refk.sigma)),
        lengthscale=jnp.asarray(t2n(refk.lengthscale)),
    )
    ourgp = gps.SVGP(
        kernel=ourk,
        Z=jnp.asarray(t2n(refgp.Z)),
        mu=jnp.asarray(t2n(refgp.mu)),
        Lu_raw=jnp.asarray(t2n(refgp.Lu)),
        jitter=1e-2,
    )
    ours = models.ExactLikelihood(gp=ourgp, noise_raw=jnp.asarray(t2n(ref.noise)))

    from gpzoo_tpu.train.elbo import gaussian_exact_negative_elbo

    loss = gaussian_exact_negative_elbo(ours, jnp.asarray(x), jnp.asarray(y))
    assert float(-loss) == pytest.approx(float(elbo_t), rel=1e-8)


def test_mggp_nsf_batched_rate_at_common_f(rng):
    D, N, L, M, G = 5, 16, 2, 8, 3
    x = rng.standard_normal((N, 2))
    gx = rng.integers(0, G, N)
    y = rng.poisson(2.0, (D, N)).astype(np.float64)

    refk = gpzoo.kernels.MGGP_NSF_RBF(
        sigma=1.0, lengthscale=1.2, group_diff_param=0.7, n_groups=G, L=L
    ).double()
    refgp = gpzoo.gp.MGGP_SVGP(refk, dim=2, M=M, jitter=1e-2,
                               n_groups=G).double()
    ref = gpzoo.likelihoods.MGGP_NSF(refgp, torch.tensor(y), L=L).double()

    ourk = kernels.MGGPNSFRBF(
        sigma=jnp.asarray(t2n(refk.sigma)),
        lengthscale=jnp.asarray(t2n(refk.lengthscale)),
        group_diff_param=jnp.asarray(t2n(refk.group_diff_param)),
        embedding=jnp.asarray(t2n(refk.embedding)),
    )
    ourgp = gps.MGGPSVGP(
        kernel=ourk,
        Z=jnp.asarray(t2n(refgp.Z)),
        groupsZ=jnp.asarray(t2n(refgp.groupsZ)),
        mu=jnp.asarray(t2n(refgp.mu)),
        Lu_raw=jnp.asarray(t2n(refgp.Lu)),
        jitter=1e-2,
    )
    ours = models.MGGPNSF(
        gp=ourgp,
        W_raw=jnp.asarray(t2n(ref.W)),
        V_raw=jnp.asarray(t2n(ref.V)),
    )

    idx = np.array([2, 5, 8, 13])
    # posterior at the batch
    qf_t, _, _ = refgp(torch.tensor(x[idx]), torch.tensor(gx[idx]))
    qf, _, _ = ourgp(jnp.asarray(x[idx]), jnp.asarray(gx[idx]))
    np.testing.assert_allclose(np.asarray(qf.mean), t2n(qf_t.mean),
                               rtol=1e-8, atol=1e-10)

    f = rng.standard_normal((1, L, len(idx)))
    rate_t = torch.nn.functional.softplus(ref.V[torch.tensor(idx)]) * (
        torch.nn.functional.softplus(ref.W) @ torch.exp(torch.tensor(f))
    )
    from gpzoo_tpu.bijectors import softplus
    from gpzoo_tpu.models.factorization import _rate

    rate = softplus(ours.V_raw[jnp.asarray(idx)]) * _rate(
        ours.W_raw, jnp.asarray(f)
    )
    np.testing.assert_allclose(np.asarray(rate), t2n(rate_t), rtol=1e-9)
