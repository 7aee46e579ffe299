"""Float64 posterior parity vs the PyTorch reference for every GP variant:
qF mean/scale, KL(qU‖pU), and whitened KL must agree to ≤1e-5
(BASELINE.json; in practice ~1e-8 here)."""

import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")
from parity_utils import import_reference, t2n  # noqa: E402

gpzoo = import_reference()

import gpzoo_tpu.dists as dists  # noqa: E402
from gpzoo_tpu import gps, kernels  # noqa: E402
from gpzoo_tpu.ops import whitened_kl  # noqa: E402

torch.set_default_dtype(torch.float64)


def _mirror_svgp(ref, kernel, cls=gps.SVGP, **extra):
    return cls(
        kernel=kernel,
        Z=jnp.asarray(t2n(ref.Z)),
        mu=jnp.asarray(t2n(ref.mu)),
        Lu_raw=jnp.asarray(t2n(ref.Lu)),
        jitter=ref.jitter,
        **extra,
    )


def _kl_sum_ref(qU, pU):
    return float(torch.sum(torch.distributions.kl_divergence(qU, pU)))


@pytest.fixture
def x(rng):
    return rng.standard_normal((17, 2))


def test_svgp_nsf_rbf_posterior(x):
    L, M = 3, 11
    refk = gpzoo.kernels.NSF_RBF(sigma=1.2, lengthscale=0.8, L=L).double()
    ref = gpzoo.gp.SVGP(refk, dim=2, M=M, jitter=1e-2).double()
    ourk = kernels.NSFRBF(
        sigma=jnp.asarray(t2n(refk.sigma)),
        lengthscale=jnp.asarray(t2n(refk.lengthscale)),
    )
    ours = _mirror_svgp(ref, ourk)

    qf_t, qu_t, pu_t = ref(torch.tensor(x))
    qf, qu, pu = ours(jnp.asarray(x))

    np.testing.assert_allclose(np.asarray(qf.mean), t2n(qf_t.mean),
                               rtol=1e-8, atol=1e-10)
    np.testing.assert_allclose(np.asarray(qf.scale), t2n(qf_t.scale),
                               rtol=1e-7, atol=1e-10)
    got_kl = float(jnp.sum(dists.kl_divergence(qu, pu)))
    assert got_kl == pytest.approx(_kl_sum_ref(qu_t, pu_t), rel=1e-7)


def test_svgp_batched_mu_lu(x):
    """Slideseq-style per-factor mu (L,M) and Lu (L,M,M) (notebook cell 20)."""
    L, M = 2, 9
    refk = gpzoo.kernels.NSF_RBF(sigma=1.0, lengthscale=1.0, L=L).double()
    ref = gpzoo.gp.SVGP(refk, dim=2, M=M, jitter=1e-1).double()
    ref.mu = torch.nn.Parameter(torch.randn((L, M), dtype=torch.float64))
    ref.Lu = torch.nn.Parameter(torch.randn((L, M, M), dtype=torch.float64))

    ourk = kernels.NSFRBF(
        sigma=jnp.asarray(t2n(refk.sigma)),
        lengthscale=jnp.asarray(t2n(refk.lengthscale)),
    )
    ours = _mirror_svgp(ref, ourk)

    qf_t, qu_t, pu_t = ref(torch.tensor(x))
    qf, qu, pu = ours(jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(qf.mean), t2n(qf_t.mean),
                               rtol=1e-8, atol=1e-10)
    np.testing.assert_allclose(np.asarray(qf.scale), t2n(qf_t.scale),
                               rtol=1e-7, atol=1e-10)
    got_kl = float(jnp.sum(dists.kl_divergence(qu, pu)))
    assert got_kl == pytest.approx(_kl_sum_ref(qu_t, pu_t), rel=1e-7)


def test_wsvgp_posterior_and_whitened_kl(x):
    M = 13
    refk = gpzoo.kernels.RBF(sigma=1.1, lengthscale=0.9).double()
    ref = gpzoo.gp.WSVGP(refk, dim=2, M=M, jitter=1e-3).double()
    ref.mu = torch.nn.Parameter(torch.randn((M,), dtype=torch.float64))

    ourk = kernels.RBF(
        sigma=jnp.asarray(t2n(refk.sigma)),
        lengthscale=jnp.asarray(t2n(refk.lengthscale)),
    )
    ours = gps.WSVGP(
        kernel=ourk,
        Z=jnp.asarray(t2n(ref.Z)),
        mu=jnp.asarray(t2n(ref.mu)),
        Lu_raw=jnp.asarray(t2n(ref.Lu)),
        jitter=ref.jitter,
    )

    qf_t, qu_t, pu_t = ref(torch.tensor(x))
    qf, qu, pu = ours(jnp.asarray(x))
    assert pu_t is None and pu is None
    np.testing.assert_allclose(np.asarray(qf.mean), t2n(qf_t.mean),
                               rtol=1e-8, atol=1e-10)
    np.testing.assert_allclose(np.asarray(qf.scale), t2n(qf_t.scale),
                               rtol=1e-7, atol=1e-10)

    # whitened KL: ours vs reference utilities.whitened_KL (2-D case)
    got = float(whitened_kl(qu.loc, qu.scale_tril))
    lu_t = torch.distributions.transform_to(
        torch.distributions.constraints.lower_cholesky
    )(ref.Lu)
    expect = float(gpzoo.utilities.whitened_KL(ref.mu, lu_t))
    assert got == pytest.approx(expect, rel=1e-8)


def test_mggp_svgp_posterior(x, rng):
    M, n_groups = 10, 3
    gx = rng.integers(0, n_groups, x.shape[0])
    refk = gpzoo.kernels.MGGP_RBF(
        sigma=1.0, lengthscale=1.2, group_diff_param=0.6, n_groups=n_groups
    ).double()
    ref = gpzoo.gp.MGGP_SVGP(refk, dim=2, M=M, jitter=1e-2,
                             n_groups=n_groups).double()

    ourk = kernels.MGGPRBF.create(
        sigma=float(t2n(refk.sigma)),
        lengthscale=float(t2n(refk.lengthscale)),
        group_diff_param=float(t2n(refk.group_diff_param)),
        n_groups=n_groups,
    ).replace(embedding=jnp.asarray(t2n(refk.embedding)))
    ours = gps.MGGPSVGP(
        kernel=ourk,
        Z=jnp.asarray(t2n(ref.Z)),
        groupsZ=jnp.asarray(t2n(ref.groupsZ)),
        mu=jnp.asarray(t2n(ref.mu)),
        Lu_raw=jnp.asarray(t2n(ref.Lu)),
        jitter=ref.jitter,
    )

    qf_t, qu_t, pu_t = ref(torch.tensor(x), torch.tensor(gx))
    qf, qu, pu = ours(jnp.asarray(x), jnp.asarray(gx))
    np.testing.assert_allclose(np.asarray(qf.mean), t2n(qf_t.mean),
                               rtol=1e-8, atol=1e-10)
    np.testing.assert_allclose(np.asarray(qf.scale), t2n(qf_t.scale),
                               rtol=1e-7, atol=1e-10)
    got_kl = float(jnp.sum(dists.kl_divergence(qu, pu)))
    assert got_kl == pytest.approx(_kl_sum_ref(qu_t, pu_t), rel=1e-7)


def test_mggp_wsvgp_posterior(x, rng):
    M, n_groups = 8, 2
    gx = rng.integers(0, n_groups, x.shape[0])
    refk = gpzoo.kernels.MGGP_RBF(
        sigma=0.9, lengthscale=1.1, group_diff_param=1.4, n_groups=n_groups
    ).double()
    ref = gpzoo.gp.MGGP_WSVGP(refk, dim=2, M=M, n_groups=n_groups,
                              jitter=1e-3).double()

    ourk = kernels.MGGPRBF.create(
        sigma=float(t2n(refk.sigma)),
        lengthscale=float(t2n(refk.lengthscale)),
        group_diff_param=float(t2n(refk.group_diff_param)),
        n_groups=n_groups,
    ).replace(embedding=jnp.asarray(t2n(refk.embedding)))
    ours = gps.MGGPWSVGP(
        kernel=ourk,
        Z=jnp.asarray(t2n(ref.Z)),
        mu=jnp.asarray(t2n(ref.mu)),
        Lu_raw=jnp.asarray(t2n(ref.Lu)),
        jitter=ref.jitter,
        groupsZ=jnp.asarray(t2n(ref.groupsZ)),
    )

    qf_t, _, _ = ref(torch.tensor(x), groupsX=torch.tensor(gx))
    qf, _, _ = ours(jnp.asarray(x), groups_x=jnp.asarray(gx))
    np.testing.assert_allclose(np.asarray(qf.mean), t2n(qf_t.mean),
                               rtol=1e-8, atol=1e-10)
    np.testing.assert_allclose(np.asarray(qf.scale), t2n(qf_t.scale),
                               rtol=1e-7, atol=1e-10)


def test_vnngp_posterior(x):
    """VNNGP parity incl. the block-gather identity (vs the reference's
    gathered-Cholesky-row products). The reference's forward only works
    with L-batched kernels (its index `repeat` assumes a leading factor
    axis), so we use NSF_RBF with L=2."""
    L, M, K = 2, 12, 4
    refk = gpzoo.kernels.NSF_RBF(sigma=1.0, lengthscale=1.0, L=L).double()
    ref = gpzoo.gp.VNNGP(refk, dim=2, M=M, K=K, jitter=1e-2).double()
    # For L>1 the reference's flattening requires per-factor mu/Lu
    # (vnngp_multiple_gps.ipynb sets them this way).
    ref.mu = torch.nn.Parameter(torch.randn((L, M), dtype=torch.float64))
    ref.Lu = torch.nn.Parameter(torch.randn((L, M, M), dtype=torch.float64))

    ourk = kernels.NSFRBF(
        sigma=jnp.asarray(t2n(refk.sigma)),
        lengthscale=jnp.asarray(t2n(refk.lengthscale)),
    )
    ours = gps.VNNGP(
        kernel=ourk,
        Z=jnp.asarray(t2n(ref.Z)),
        mu=jnp.asarray(t2n(ref.mu)),
        Lu_raw=jnp.asarray(t2n(ref.Lu)),
        K=K,
        jitter=ref.jitter,
    )

    qf_t, qu_t, pu_t = ref(torch.tensor(x))
    qf, qu, pu = ours(jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(qf.mean), t2n(qf_t.mean),
                               rtol=1e-6, atol=1e-8)
    np.testing.assert_allclose(np.asarray(qf.scale), t2n(qf_t.scale),
                               rtol=1e-6, atol=1e-8)
    got_kl = float(jnp.sum(dists.kl_divergence(qu, pu)))
    assert got_kl == pytest.approx(_kl_sum_ref(qu_t, pu_t), rel=1e-7)


def test_gaussian_prior(rng):
    ref = gpzoo.gp.GaussianPrior(
        torch.zeros((5, 20), dtype=torch.float64), L=3
    ).double()
    ours = gps.GaussianPrior(
        mean=jnp.asarray(t2n(ref.mean)),
        scale_raw=jnp.asarray(t2n(ref.scale)),
        scale_pf=ref.scale_pf,
    )
    qf_t, pf_t = ref()
    qf, pf = ours()
    np.testing.assert_allclose(np.asarray(qf.scale), t2n(qf_t.scale),
                               rtol=1e-9)
    idx = np.array([3, 1, 7])
    qf_tb, _ = ref.forward_batched(torch.tensor(idx))
    qf_b, _ = ours.batched(jnp.asarray(idx))
    np.testing.assert_allclose(np.asarray(qf_b.loc), t2n(qf_tb.mean),
                               rtol=1e-12)


def test_wsvgp_forward_precomputed_consistency(x, rng):
    """forward_precomputed(W) with W = Kxz Lzz⁻ᵀ must reproduce the full
    whitened forward's mean, and its variance must use σ² in place of the
    exact diag (the reference's stationary-kernel shortcut,
    gp.py:308-322)."""
    import jax
    import jax.scipy.linalg as jsl
    from gpzoo_tpu.ops import add_jitter

    M, L = 9, 3
    kern = kernels.NSFRBF.create(sigma=1.2, lengthscale=0.9, L=L)
    key = jax.random.PRNGKey(1)
    gp = gps.WSVGP.create(key, kern, dim=2, M=M, jitter=1e-3)
    gp = gp.replace(Z=jnp.asarray(x[:M]))

    qf_full, qu_full, _ = gp(jnp.asarray(x))

    kzz = add_jitter(kern.gram(gp.Z, gp.Z), gp.jitter)
    lzz = jnp.linalg.cholesky(kzz)
    kzx = kern.gram(gp.Z, jnp.asarray(x))
    w = jnp.swapaxes(jsl.solve_triangular(lzz, kzx, lower=True), -2, -1)

    qf_pre, qu_pre, pu_pre = gp.forward_precomputed(w)
    assert pu_pre is None
    np.testing.assert_allclose(np.asarray(qf_pre.mean),
                               np.asarray(qf_full.mean), rtol=1e-8)
    # variance: Kxx diag is exactly σ² for a stationary kernel, so the
    # precomputed path matches the full one here.
    np.testing.assert_allclose(np.asarray(qf_pre.scale),
                               np.asarray(qf_full.scale), rtol=1e-7)


def test_hybrid_precomputed_path(x, rng):
    """HybridNSF.precomputed pairs the frozen projection with the batched
    mean-field half (likelihoods.py:147-164)."""
    import jax
    import jax.scipy.linalg as jsl
    from gpzoo_tpu import models as gzm
    from gpzoo_tpu import gps as gzg
    from gpzoo_tpu.ops import add_jitter

    key = jax.random.PRNGKey(2)
    N, D, L, T, M = x.shape[0], 6, 2, 3, 8
    kern = kernels.NSFRBF.create(L=L, lengthscale=1.0)
    gp = gzg.WSVGP.create(key, kern, dim=2, M=M, jitter=1e-2)
    prior = gzg.GaussianPrior.create(key, N=N, L=T)
    model = gzm.HybridNSF.create(key, gp, prior, D=D, N=N, L=L, T=T)

    idx = jnp.arange(8)
    kzz = add_jitter(kern.gram(gp.Z, gp.Z), gp.jitter)
    lzz = jnp.linalg.cholesky(kzz)
    kzx = kern.gram(gp.Z, jnp.asarray(x)[idx])
    w = jnp.swapaxes(jsl.solve_triangular(lzz, kzx, lower=True), -2, -1)

    py, qf1, qu, pu, qf2, pf2 = model.precomputed(w, idx, key, E=2)
    assert py.rate.shape == (2, D, 8)
    assert np.all(np.isfinite(np.asarray(py.rate)))
