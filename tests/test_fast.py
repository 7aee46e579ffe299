"""The blockwise NSF fast path must equal the generic minibatch ELBO in
value and gradient."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import gpzoo_tpu as gz
from gpzoo_tpu.train import negative_elbo_batched
from gpzoo_tpu.train.fast import nsf_negative_elbo_batched


@pytest.fixture(scope="module")
def setup():
    coords, counts, _ = gz.data.simulate_nsf_counts(N=300, D=12, L=3)
    # float64 inputs: the fast path compiles its body as one XLA program,
    # so float32 inputs differ from the eager path at ~2e-6 (fusion
    # rounding); in float64 both must agree to reassociation level.
    x = jnp.asarray(coords, jnp.float64)
    y = jnp.asarray(counts, jnp.float64)
    key = jax.random.PRNGKey(3)
    model = gz.NSFConfig(D=12, N=300, L=3, M=20).build(key, X=x)
    idx = jax.random.choice(jax.random.PRNGKey(9), 300, (64,), replace=False)
    return model, x, y, idx, key


def test_value_matches_generic(setup):
    model, x, y, idx, key = setup
    ref = negative_elbo_batched(model, x, y, idx, key, E=2)
    for mb in (64, 32, 16):
        fast = nsf_negative_elbo_batched(model, x, y, idx, key, E=2,
                                         microbatch=mb)
        assert float(fast) == pytest.approx(float(ref), rel=1e-10), mb


def test_value_close_in_float32(setup):
    model, x, y, idx, key = setup
    x32 = x.astype(jnp.float32)
    y32 = y.astype(jnp.float32)
    m32 = jax.tree_util.tree_map(
        lambda a: a.astype(jnp.float32)
        if hasattr(a, "dtype") and a.dtype == jnp.float64 else a,
        model,
    )
    ref = negative_elbo_batched(m32, x32, y32, idx, key, E=2)
    fast = nsf_negative_elbo_batched(m32, x32, y32, idx, key, E=2,
                                     microbatch=32)
    assert float(fast) == pytest.approx(float(ref), rel=1e-4)


def test_gradient_matches_generic(setup):
    model, x, y, idx, key = setup
    g_ref = jax.grad(
        lambda m: negative_elbo_batched(m, x, y, idx, key, E=2)
    )(model)
    g_fast = jax.grad(
        lambda m: nsf_negative_elbo_batched(m, x, y, idx, key, E=2,
                                            microbatch=16)
    )(model)
    for a, b in zip(jax.tree_util.tree_leaves(g_ref),
                    jax.tree_util.tree_leaves(g_fast)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-9)


def test_whitened_prior(setup, key):
    _, x, y, idx, _ = setup
    kernel = gz.kernels.NSFRBF.create(L=3, lengthscale=1.0)
    gp = gz.gps.WSVGP.create(key, kernel, dim=2, M=20, jitter=1e-1)
    model = gz.models.NSF.create(key, gp, D=12, N=300, L=3)
    ref = negative_elbo_batched(model, x, y, idx, key, E=2)
    fast = nsf_negative_elbo_batched(model, x, y, idx, key, E=2,
                                     microbatch=16)
    assert float(fast) == pytest.approx(float(ref), rel=1e-9)


def test_factored_matches_generic(setup):
    model, x, y, idx, key = setup
    ref = negative_elbo_batched(model, x, y, idx, key, E=2)
    fast = nsf_negative_elbo_batched(model, x, y, idx, key, E=2,
                                     microbatch=16, factored=True)
    assert float(fast) == pytest.approx(float(ref), rel=1e-8)

    g_ref = jax.grad(
        lambda m: negative_elbo_batched(m, x, y, idx, key, E=2)
    )(model)
    g_fast = jax.grad(
        lambda m: nsf_negative_elbo_batched(m, x, y, idx, key, E=2,
                                            microbatch=16, factored=True)
    )(model)
    for a, b in zip(jax.tree_util.tree_leaves(g_ref),
                    jax.tree_util.tree_leaves(g_fast)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-8)


def test_factored_whitened(setup, key):
    _, x, y, idx, _ = setup
    kernel = gz.kernels.NSFRBF.create(L=3, lengthscale=1.0)
    gp = gz.gps.WSVGP.create(key, kernel, dim=2, M=20, jitter=1e-1)
    model = gz.models.NSF.create(key, gp, D=12, N=300, L=3)
    ref = negative_elbo_batched(model, x, y, idx, key, E=2)
    fast = nsf_negative_elbo_batched(model, x, y, idx, key, E=2,
                                     microbatch=16, factored=True)
    assert float(fast) == pytest.approx(float(ref), rel=1e-8)


def test_rejects_indivisible_batch(setup):
    model, x, y, idx, key = setup
    with pytest.raises(ValueError):
        nsf_negative_elbo_batched(model, x, y, idx, key, microbatch=17)


def test_y_transposed_matches(setup):
    model, x, y, idx, key = setup
    a = nsf_negative_elbo_batched(model, x, y, idx, key, E=2, microbatch=16)
    b = nsf_negative_elbo_batched(model, x, jnp.swapaxes(y, 0, 1), idx, key,
                                  E=2, microbatch=16, y_transposed=True)
    assert float(a) == float(b)


def test_shared_kernel_matches(key):
    """shared_kernel=True (equal per-factor hyperparams collapse to one
    Gram/Cholesky) must match the L-batched computation exactly."""
    coords, counts, _ = gz.data.simulate_nsf_counts(N=300, D=12, L=3)
    x = jnp.asarray(coords, jnp.float64)
    y = jnp.asarray(counts, jnp.float64)
    kernel = gz.kernels.NSFRBF.create(L=3, sigma=1.3, lengthscale=0.9)
    gp = gz.gps.SVGP.create(key, kernel, dim=2, M=20, jitter=1e-1)
    gp = gp.replace(mu=jax.random.normal(key, (3, 20)),
                    Lu_raw=jax.random.normal(key, (3, 20, 20)))
    model = gz.models.NSF.create(key, gp, D=12, N=300, L=3)
    idx = jax.random.choice(jax.random.PRNGKey(4), 300, (64,), replace=False)

    for factored in (False, True):
        a = nsf_negative_elbo_batched(model, x, y, idx, key, E=2,
                                      microbatch=16, factored=factored)
        b = nsf_negative_elbo_batched(model, x, y, idx, key, E=2,
                                      microbatch=16, factored=factored,
                                      shared_kernel=True)
        assert float(b) == pytest.approx(float(a), rel=1e-9), factored

    # gradients too (factored + shared, vs generic path)
    g_ref = jax.grad(
        lambda m: negative_elbo_batched(m, x, y, idx, key, E=2)
    )(model)
    g_fast = jax.grad(
        lambda m: nsf_negative_elbo_batched(m, x, y, idx, key, E=2,
                                            microbatch=16, factored=True,
                                            shared_kernel=True)
    )(model)
    np.testing.assert_allclose(np.asarray(g_fast.prior.mu),
                               np.asarray(g_ref.prior.mu),
                               rtol=1e-6, atol=1e-9)
    np.testing.assert_allclose(np.asarray(g_fast.prior.Lu_raw),
                               np.asarray(g_ref.prior.Lu_raw),
                               rtol=1e-6, atol=1e-9)


@pytest.mark.parametrize("whitened", [False, True])
@pytest.mark.parametrize("E", [1, 3])
def test_shared_kernel_shared_mu_degenerate(key, whitened, E):
    """shared_kernel=True on a model whose mu/Lu are ALSO shared (the
    NSFConfig default: (M,)/(M,M) broadcast against an L-vector kernel).
    Regression: the collapsed path used to crash at E>1 (eps lost the
    factor axis) and at E=1 silently drew one shared noise vector and
    counted the unwhitened KL once instead of L times."""
    coords, counts, _ = gz.data.simulate_nsf_counts(N=200, D=10, L=4)
    x = jnp.asarray(coords, jnp.float64)
    y = jnp.asarray(counts, jnp.float64)
    kernel = gz.kernels.NSFRBF.create(L=4, sigma=1.2, lengthscale=0.8)
    cls = gz.gps.WSVGP if whitened else gz.gps.SVGP
    gp = cls.create(jax.random.PRNGKey(0), kernel, dim=2, M=16, jitter=1e-1)
    assert gp.mu.ndim == 1  # the degenerate shared-mu layout
    model = gz.models.NSF.create(jax.random.PRNGKey(1), gp, D=10, N=200, L=4)
    idx = jnp.arange(128)

    for factored in (False, True):
        a = nsf_negative_elbo_batched(model, x, y, idx, key, E=E,
                                      microbatch=64, factored=factored)
        b = nsf_negative_elbo_batched(model, x, y, idx, key, E=E,
                                      microbatch=64, factored=factored,
                                      shared_kernel=True)
        assert float(b) == pytest.approx(float(a), rel=1e-12), factored
    # generic-path cross-check (different MC draw order → loose rel)
    ref = negative_elbo_batched(model, x, y, idx, key, E=E)
    assert float(b) == pytest.approx(float(ref), rel=1e-5)


def test_shared_kernel_scalar_sigma_batched_lengthscale(key):
    """A scalar-σ kernel with an L-batched (equal) ℓ is still L-batched.
    Regression: the factor-batch probe keyed on σ alone, so this config
    lost the factor axis of the noise draw (and, under shared_kernel,
    the KL copy count) — silently diverging from the generic path."""
    coords, counts, _ = gz.data.simulate_nsf_counts(N=200, D=10, L=4)
    x = jnp.asarray(coords, jnp.float64)
    y = jnp.asarray(counts, jnp.float64)
    kernel = gz.kernels.NSFRBF.create(L=4, sigma=1.2, lengthscale=0.8)
    kernel = kernel.replace(sigma=jnp.asarray(kernel.sigma).reshape(-1)[0])
    gp = gz.gps.SVGP.create(jax.random.PRNGKey(0), kernel, dim=2, M=16,
                            jitter=1e-1)
    model = gz.models.NSF.create(jax.random.PRNGKey(1), gp, D=10, N=200, L=4)
    idx = jnp.arange(128)

    for E in (1, 3):
        ref = negative_elbo_batched(model, x, y, idx, key, E=E)
        for sk in (False, True):
            fast = nsf_negative_elbo_batched(model, x, y, idx, key, E=E,
                                             microbatch=64, factored=True,
                                             shared_kernel=sk)
            assert float(fast) == pytest.approx(float(ref), rel=1e-5), (E, sk)


def test_mggp_shared_kernel_shared_mu(key, rng):
    """shared_kernel=True on an MGGP kernel whose group parameter stays
    L-batched after the σ/ℓ collapse, with shared mu/Lu. Regression: the
    KL copy correction double-counted (the collapsed Gram is still
    (L, M, M), so the w_form KL already sums L copies — multiplying by
    L again biased training toward the prior by L²)."""
    N, D, L, M, G = 200, 10, 3, 16, 3
    coords = rng.uniform(-2, 2, (N, 2))
    counts = rng.poisson(3.0, (D, N)).astype(np.float64)
    groups = jnp.asarray(rng.integers(0, G, N))
    x, y = jnp.asarray(coords), jnp.asarray(counts)
    kernel = gz.kernels.MGGPNSFRBF.create(
        sigma=1.0, lengthscale=1.2, group_diff_param=0.7, n_groups=G, L=L)
    gp = gz.gps.MGGPSVGP.create(key, kernel, dim=2, M=M, jitter=1e-1,
                                n_groups=G)
    assert gp.mu.ndim == 1  # shared-mu layout
    model = gz.models.MGGPNSF.create(key, gp, D=D, N=N, L=L)
    idx = jnp.arange(48)

    ref = negative_elbo_batched(model, x, y, idx, key, E=2, groups_x=groups)
    for sk in (False, True):
        fast = nsf_negative_elbo_batched(model, x, y, idx, key, E=2,
                                         microbatch=16, factored=True,
                                         groups=groups, shared_kernel=sk)
        assert float(fast) == pytest.approx(float(ref), rel=1e-9), sk


def test_remat_rejects_unknown_string(setup):
    """A typo'd remat policy string must raise, not silently select full
    rematerialization."""
    model, x, y, idx, key = setup
    with pytest.raises(ValueError, match="remat"):
        nsf_negative_elbo_batched(model, x, y, idx, key, microbatch=16,
                                  remat="save_proj_kxz")


def test_mggp_fast_path_matches_generic(key, rng):
    """Fast path with group labels == generic MGGP-NSF minibatch ELBO."""
    N, D, L, M, G = 200, 10, 2, 16, 3
    coords = rng.uniform(-2, 2, (N, 2))
    counts = rng.poisson(3.0, (D, N)).astype(np.float64)
    groups = jnp.asarray(rng.integers(0, G, N))
    x = jnp.asarray(coords)
    y = jnp.asarray(counts)

    kernel = gz.kernels.MGGPNSFRBF.create(
        sigma=1.0, lengthscale=1.2, group_diff_param=0.7, n_groups=G, L=L
    )
    gp = gz.gps.MGGPSVGP.create(key, kernel, dim=2, M=M, jitter=1e-1,
                                n_groups=G)
    model = gz.models.MGGPNSF.create(key, gp, D=D, N=N, L=L)
    idx = jax.random.choice(jax.random.PRNGKey(2), N, (48,), replace=False)

    ref = negative_elbo_batched(model, x, y, idx, key, E=2, groups_x=groups)
    for factored in (False, True):
        fast = nsf_negative_elbo_batched(model, x, y, idx, key, E=2,
                                         microbatch=16, factored=factored,
                                         groups=groups)
        assert float(fast) == pytest.approx(float(ref), rel=1e-9), factored

    # small-jitter w_form: grad_precision auto-gates to HIGHEST, which
    # dispatches the panel-blocked cholesky_inverse_mm backward — value
    # AND kernel-hyperparameter gradient must still match the generic
    # path (float64)
    model_sj = model.replace(gp=model.gp.replace(jitter=1e-3))

    def gref(m):
        return negative_elbo_batched(m, x, y, idx, key, E=2,
                                     groups_x=groups)

    def gfast(m):
        return nsf_negative_elbo_batched(m, x, y, idx, key, E=2,
                                         microbatch=16, factored=True,
                                         groups=groups)

    assert float(gfast(model_sj)) == pytest.approx(float(gref(model_sj)),
                                                   rel=1e-9)
    gr = jax.grad(gref, allow_int=True)(model_sj)
    gf = jax.grad(gfast, allow_int=True)(model_sj)
    for (path, a), b in zip(jax.tree_util.tree_leaves_with_path(gr),
                            jax.tree_util.tree_leaves(gf)):
        if a.dtype == jax.dtypes.float0:  # int leaves (group labels)
            continue
        a, b = np.asarray(a), np.asarray(b)
        # atol rides the leaf's own scale: at jitter 1e-3 some gradient
        # leaves span ~17 orders of magnitude (cancelling embedding
        # components) and the sub-machine-epsilon residue differs by
        # summation order between the two paths
        np.testing.assert_allclose(b, a, rtol=1e-6,
                                   atol=1e-9 * max(np.max(np.abs(a)), 1.0),
                                   err_msg=str(path))


def test_bench_configuration_matches_generic(key):
    """The exact bench.py flag set (freeze + factored + shared_kernel +
    y_transposed + remat off) must produce the generic-path loss."""
    from gpzoo_tpu.train import freeze_loss, trainable_mask

    coords, counts, _ = gz.data.simulate_nsf_counts(N=280, D=12, L=4)
    x = jnp.asarray(coords, jnp.float64)
    y = jnp.asarray(counts, jnp.float64)
    cfg = gz.SlideseqNSFConfig(D=12, N=280, L=4, M=24, batch_size=56)
    model = cfg.build(key, x)
    mask = trainable_mask(model, cfg.trainable)
    idx = jax.random.choice(jax.random.PRNGKey(7), 280, (56,),
                            replace=False)

    ref = negative_elbo_batched(model, x, y, idx, key, E=1)
    loss = freeze_loss(nsf_negative_elbo_batched, mask)
    fast = loss(model, x, jnp.swapaxes(y, 0, 1), idx, key, E=1,
                microbatch=8, y_transposed=True, factored=True,
                shared_kernel=True, remat=False)
    assert float(fast) == pytest.approx(float(ref), rel=1e-9)
    # the stable_projection override (advisor round 2) selects between
    # the one-matmul and two-sided shared-kernel projections — both are
    # the same math, float64-identical to the generic path
    for stable in (True, False):
        v = loss(model, x, jnp.swapaxes(y, 0, 1), idx, key, E=1,
                 microbatch=8, y_transposed=True, factored=True,
                 shared_kernel=True, remat=False,
                 stable_projection=stable)
        assert float(v) == pytest.approx(float(ref), rel=1e-9), stable


def test_vnngp_fast_loss_matches_generic(key, rng):
    from gpzoo_tpu.train.fast import vnngp_nsf_negative_elbo_batched

    N, D, L, M, K = 250, 10, 3, 24, 4
    coords = rng.uniform(-2, 2, (N, 2))
    counts = rng.poisson(3.0, (D, N)).astype(np.float64)
    x, y = jnp.asarray(coords), jnp.asarray(counts)
    kernel = gz.kernels.NSFRBF.create(L=L, sigma=1.1, lengthscale=1.0)
    gp = gz.gps.VNNGP.create(key, kernel, dim=2, M=M, K=K, jitter=1e-1)
    gp = gp.replace(mu=jax.random.normal(key, (L, M)),
                    Lu_raw=0.3 * jax.random.normal(key, (L, M, M)))
    model = gz.models.NSF.create(key, gp, D=D, N=N, L=L)
    idx = jax.random.choice(jax.random.PRNGKey(6), N, (64,), replace=False)

    ref = negative_elbo_batched(model, x, y, idx, key, E=2)
    fast = vnngp_nsf_negative_elbo_batched(model, x, y, idx, key, E=2)
    assert float(fast) == pytest.approx(float(ref), rel=1e-9)
    fast_sh = vnngp_nsf_negative_elbo_batched(model, x, y, idx, key, E=2,
                                              shared_kernel=True)
    assert float(fast_sh) == pytest.approx(float(ref), rel=1e-9)
    fast_t = vnngp_nsf_negative_elbo_batched(
        model, x, jnp.swapaxes(y, 0, 1), idx, key, E=2,
        shared_kernel=True, y_transposed=True,
    )
    assert float(fast_t) == pytest.approx(float(ref), rel=1e-9)


# ---------------------------------------------------------------------------
# Precomputed-projection path (frozen Z + frozen shared kernel)
# ---------------------------------------------------------------------------

from gpzoo_tpu.train.fast import (  # noqa: E402
    precompute_nsf_projection,
    nsf_negative_elbo_precomputed,
)


def _trainable_leaves(g):
    """The leaves the precomputed path trains (Z/kernel are frozen
    constants there, so generic-path grads for them are ignored)."""
    return {
        "mu": g.prior.mu, "Lu_raw": g.prior.Lu_raw,
        "W_raw": g.W_raw, "V_raw": g.V_raw,
    }


def test_precomputed_value_matches_generic(setup):
    model, x, y, idx, key = setup
    ref = negative_elbo_batched(model, x, y, idx, key, E=2)
    proj = precompute_nsf_projection(model, x)
    fast = nsf_negative_elbo_precomputed(model, proj, y, idx, key, E=2)
    assert float(fast) == pytest.approx(float(ref), rel=1e-9)
    # blockwise precompute is the same projection
    proj_b = precompute_nsf_projection(model, x, block=77)
    fast_b = nsf_negative_elbo_precomputed(model, proj_b, y, idx, key, E=2)
    assert float(fast_b) == pytest.approx(float(ref), rel=1e-9)


def test_precomputed_gradients_match_generic(setup):
    model, x, y, idx, key = setup
    proj = precompute_nsf_projection(model, x)
    g_ref = jax.grad(
        lambda m: negative_elbo_batched(m, x, y, idx, key, E=2)
    )(model)
    g_pre = jax.grad(
        lambda m: nsf_negative_elbo_precomputed(m, proj, y, idx, key, E=2)
    )(model)
    ref_leaves = _trainable_leaves(g_ref)
    pre_leaves = _trainable_leaves(g_pre)
    for name in ref_leaves:
        np.testing.assert_allclose(
            np.asarray(pre_leaves[name]), np.asarray(ref_leaves[name]),
            rtol=1e-7, atol=1e-9, err_msg=name,
        )


def test_precomputed_per_factor_northstar_layout(key):
    """The north-star parameter layout: per-factor (L, M) mu and
    (L, M, M) Lu, y spot-major."""
    N, D, L, M = 200, 15, 4, 24
    coords, counts, _ = gz.data.simulate_nsf_counts(N=N, D=D, L=L)
    x = jnp.asarray(coords, jnp.float64)
    y_t = jnp.asarray(counts, jnp.float64).T  # (N, D) spot-major
    model = gz.SlideseqNSFConfig(D=D, N=N, L=L, M=M).build(key, x)
    idx = jax.random.choice(jax.random.PRNGKey(1), N, (48,), replace=False)
    ref = negative_elbo_batched(model, x, y_t.T, idx, key, E=1)
    proj = precompute_nsf_projection(model, x)
    fast = nsf_negative_elbo_precomputed(model, proj, y_t, idx, key, E=1,
                                         y_transposed=True)
    assert float(fast) == pytest.approx(float(ref), rel=1e-9)


def test_precomputed_whitened(key):
    """WSVGP prior: proj stores a = Lzz^-1 Kzx and the whitened KL."""
    from gpzoo_tpu import gps, kernels, models

    N, D, L, M = 150, 10, 3, 16
    coords, counts, _ = gz.data.simulate_nsf_counts(N=N, D=D, L=L)
    x = jnp.asarray(coords, jnp.float64)
    y = jnp.asarray(counts, jnp.float64)
    kern = kernels.NSFRBF.create(sigma=1.0, lengthscale=1.0, L=L)
    gp = gps.WSVGP.create(jax.random.PRNGKey(2), kern, dim=2, M=M,
                          jitter=1e-1)
    model = models.NSF.create(jax.random.PRNGKey(3), gp, D, N, L=L)
    idx = jax.random.choice(jax.random.PRNGKey(4), N, (32,), replace=False)
    ref = negative_elbo_batched(model, x, y, idx, key, E=2)
    proj = precompute_nsf_projection(model, x)
    assert proj.whitened and proj.k_inv is None
    fast = nsf_negative_elbo_precomputed(model, proj, y, idx, key, E=2)
    assert float(fast) == pytest.approx(float(ref), rel=1e-9)


def test_small_jitter_projection_stability(rng):
    """The conditioning gate's reason to exist: at small jitter in
    float32, the norm-squared subtrahend colsum((W Kzx)²) (stable path,
    jitter < 1e-2) stays accurate while colsum(Kzx ⊙ K⁻¹Kzx) can lose
    digits. Checks the stable form against the float64 truth."""
    import numpy as np

    from gpzoo_tpu.ops.linalg import spd_inverse_from_cholesky, tri_inverse

    m, b = 256, 128
    # clustered inducing points → ill-conditioned Gram
    z = np.repeat(rng.uniform(-1, 1, size=(m // 4, 2)), 4, axis=0)
    z += 1e-3 * rng.standard_normal((m, 2))
    xb = rng.uniform(-1, 1, size=(b, 2))
    d2 = ((z[:, None, :] - z[None, :, :]) ** 2).sum(-1)
    kzz64 = np.exp(-0.5 * d2) + 1e-4 * np.eye(m)
    d2x = ((z[:, None, :] - xb[None, :, :]) ** 2).sum(-1)
    kzx64 = np.exp(-0.5 * d2x)

    # float64 truth for the variance subtrahend
    truth = np.sum(kzx64 * np.linalg.solve(kzz64, kzx64), axis=0)

    lzz32 = jnp.asarray(np.linalg.cholesky(kzz64), jnp.float32)
    kzx32 = jnp.asarray(kzx64, jnp.float32)
    with jax.default_matmul_precision("highest"):
        w = tri_inverse(lzz32, block=128)
        a = jnp.einsum("ij,jb->ib", w, kzx32)
        stable = jnp.sum(jnp.square(a), axis=0)
        k_inv = spd_inverse_from_cholesky(lzz32, block=128)
        at = jnp.einsum("ij,jb->ib", k_inv, kzx32)
        fast = jnp.sum(kzx32 * at, axis=0)

    scale = float(np.max(np.abs(truth)))
    err_stable = float(np.max(np.abs(np.asarray(stable, np.float64)
                                     - truth))) / scale
    err_fast = float(np.max(np.abs(np.asarray(fast, np.float64)
                                   - truth))) / scale
    # the stable form must stay float32-accurate at this conditioning
    assert err_stable < 5e-5, (err_stable, err_fast)
    # and not be worse than the gated-off fast form
    assert err_stable <= err_fast * 2, (err_stable, err_fast)


def test_wform_knobs_value_identical(key, rng):
    """The w_form path's static knobs — remat modes (True / save_proj /
    save_proj_kzx / False) and the grad/proj precision settings (no-ops
    on CPU float64, but they trace distinct programs) — must all produce
    the SAME loss value, and gradients must agree across remat modes."""
    N, D, L, M, G = 200, 10, 2, 16, 3
    coords = rng.uniform(-2, 2, (N, 2))
    counts = rng.poisson(3.0, (D, N)).astype(np.float64)
    groups = jnp.asarray(rng.integers(0, G, N))
    x, y = jnp.asarray(coords), jnp.asarray(counts)
    kernel = gz.kernels.MGGPNSFRBF.create(
        sigma=1.0, lengthscale=1.2, group_diff_param=0.7, n_groups=G, L=L
    )
    gp = gz.gps.MGGPSVGP.create(key, kernel, dim=2, M=M, jitter=1e-1,
                                n_groups=G)
    model = gz.models.MGGPNSF.create(key, gp, D=D, N=N, L=L)
    idx = jax.random.choice(jax.random.PRNGKey(2), N, (48,), replace=False)

    def loss(m, **kw):
        return nsf_negative_elbo_batched(
            m, x, y, idx, key, E=1, microbatch=16, factored=True,
            groups=groups, **kw)

    ref_v, ref_g = jax.value_and_grad(loss, allow_int=True)(model)
    for kw in (
        {"remat": "save_proj"},
        {"remat": "save_proj_kzx"},
        {"remat": False},
        {"grad_precision": "default", "proj_precision": "high"},
        {"grad_precision": "highest", "proj_precision": "highest"},
        {"chol_precision": "high"},
    ):
        v, g = jax.value_and_grad(
            lambda m: loss(m, **kw), allow_int=True)(model)
        assert float(v) == pytest.approx(float(ref_v), rel=1e-12), kw
        jax.tree_util.tree_map(
            # skip float0 grads of integer leaves (MGGP groupsZ)
            lambda a, b: np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-8, atol=1e-10)
            if np.asarray(b).dtype.kind == "f" else None,
            g, ref_g,
        )


def test_vnngp_kl_form_solve_matches(key, rng):
    """kl_form='solve' (two triangular solves — the op-count-minimal
    form for the latency-bound VNNGP step) must equal the matmul form
    and the generic path, values and gradients, shared and per-factor
    prior Choleskys."""
    from gpzoo_tpu.train.fast_vnngp import vnngp_nsf_negative_elbo_batched

    N, D, L, M, K = 250, 10, 3, 24, 4
    coords = rng.uniform(-2, 2, (N, 2))
    counts = rng.poisson(3.0, (D, N)).astype(np.float64)
    x, y = jnp.asarray(coords), jnp.asarray(counts)
    idx = jax.random.choice(jax.random.PRNGKey(6), N, (64,), replace=False)
    model = gz.VNNGPConfig(D=D, N=N, L=L, M=M, K=K).build(
        jax.random.PRNGKey(0), X=x)

    for sk in (False, True):
        ref = negative_elbo_batched(model, x, y, idx, key, E=2)

        def solve_loss(m):
            return vnngp_nsf_negative_elbo_batched(
                m, x, y, idx, key, E=2, shared_kernel=sk,
                kl_form="solve")

        v, g = jax.value_and_grad(solve_loss)(model)
        assert float(v) == pytest.approx(float(ref), rel=1e-9), sk
        g_ref = jax.grad(
            lambda m: negative_elbo_batched(m, x, y, idx, key, E=2)
        )(model)
        np.testing.assert_allclose(np.asarray(g.prior.mu),
                                   np.asarray(g_ref.prior.mu),
                                   rtol=1e-6, atol=1e-9)
        np.testing.assert_allclose(np.asarray(g.prior.Lu_raw),
                                   np.asarray(g_ref.prior.Lu_raw),
                                   rtol=1e-6, atol=1e-9)
    with pytest.raises(ValueError, match="kl_form"):
        vnngp_nsf_negative_elbo_batched(model, x, y, idx, key,
                                        kl_form="sovle")


def test_vnngp_precomputed_matches_generic(key, rng):
    """Frozen-Z/frozen-kernel VNNGP: the precomputed-conditioning loss
    (train/fast_vnngp.py) equals the generic path in value and
    trainable-leaf gradients — shared AND per-factor mu/Lu layouts."""
    from gpzoo_tpu.train.fast_vnngp import (
        precompute_vnngp_conditioning,
        vnngp_nsf_negative_elbo_precomputed,
    )

    N, D, L, M, K = 250, 10, 3, 24, 4
    coords = rng.uniform(-2, 2, (N, 2))
    counts = rng.poisson(3.0, (D, N)).astype(np.float64)
    x, y = jnp.asarray(coords), jnp.asarray(counts)
    idx = jax.random.choice(jax.random.PRNGKey(6), N, (64,), replace=False)

    for per_factor in (False, True):
        model = gz.VNNGPConfig(D=D, N=N, L=L, M=M, K=K).build(
            jax.random.PRNGKey(0), X=x)
        if per_factor:
            gp = model.prior.replace(
                mu=jax.random.normal(key, (L, M)),
                Lu_raw=0.3 * jax.random.normal(key, (L, M, M)))
            model = gz.models.NSF.create(key, gp, D=D, N=N, L=L)
        cond = precompute_vnngp_conditioning(model, x)
        for E in (1, 2):
            ref = negative_elbo_batched(model, x, y, idx, key, E=E)
            pre = vnngp_nsf_negative_elbo_precomputed(model, cond, y, idx,
                                                      key, E=E)
            assert float(pre) == pytest.approx(float(ref), rel=1e-9), (
                per_factor, E)
        # y_transposed layout (the bench stores counts spot-major)
        pre_t = vnngp_nsf_negative_elbo_precomputed(
            model, cond, jnp.swapaxes(y, 0, 1), idx, key, E=1,
            y_transposed=True)
        ref1 = negative_elbo_batched(model, x, y, idx, key, E=1)
        assert float(pre_t) == pytest.approx(float(ref1), rel=1e-9)

        g_ref = jax.grad(
            lambda m: negative_elbo_batched(m, x, y, idx, key, E=2)
        )(model)
        g_pre = jax.grad(
            lambda m: vnngp_nsf_negative_elbo_precomputed(
                m, cond, y, idx, key, E=2)
        )(model)
        for name, a, b in (
            ("mu", g_ref.prior.mu, g_pre.prior.mu),
            ("Lu_raw", g_ref.prior.Lu_raw, g_pre.prior.Lu_raw),
            ("W_raw", g_ref.W_raw, g_pre.W_raw),
            ("V_raw", g_ref.V_raw, g_pre.V_raw),
        ):
            np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                       rtol=1e-7, atol=1e-10,
                                       err_msg=f"{name} pf={per_factor}")


def test_chol_precision_honored_off_wform(key, monkeypatch):
    """chol_precision must reach the shared-Cholesky (non-w_form) W/K⁻¹
    builders — before the round-4 fix the knob silently no-op'd on every
    path except w_form's cholesky_inverse_mm."""
    coords, counts, _ = gz.data.simulate_nsf_counts(N=200, D=8, L=3)
    x = jnp.asarray(coords, jnp.float64)
    y = jnp.asarray(counts, jnp.float64)
    kernel = gz.kernels.NSFRBF.create(L=3, sigma=1.3, lengthscale=0.9)
    gp = gz.gps.SVGP.create(key, kernel, dim=2, M=16, jitter=1e-1)
    gp = gp.replace(mu=jax.random.normal(key, (3, 16)),
                    Lu_raw=jax.random.normal(key, (3, 16, 16)))
    model = gz.models.NSF.create(key, gp, D=8, N=200, L=3)
    idx = jax.random.choice(jax.random.PRNGKey(4), 200, (32,),
                            replace=False)

    import gpzoo_tpu.train.fast as fast_mod
    seen = {}
    orig_tri = fast_mod.tri_inverse
    orig_spd = fast_mod.spd_inverse_from_cholesky

    def spy_tri(l, block=512, precision="highest"):
        seen.setdefault("tri", []).append(precision)
        return orig_tri(l, block, precision)

    def spy_spd(lz, block=512, precision="highest"):
        seen.setdefault("spd", []).append(precision)
        return orig_spd(lz, block, precision)

    monkeypatch.setattr(fast_mod, "tri_inverse", spy_tri)
    monkeypatch.setattr(fast_mod, "spd_inverse_from_cholesky", spy_spd)

    ref = negative_elbo_batched(model, x, y, idx, key, E=2)
    # stable (two-sided) form: W built by tri_inverse
    a = nsf_negative_elbo_batched(
        model, x, y, idx, key, E=2, microbatch=16, factored=True,
        shared_kernel=True, stable_projection=True, chol_precision="high")
    assert seen.get("tri") == ["high"]
    # single-matmul form: K⁻¹ built by spd_inverse_from_cholesky
    b = nsf_negative_elbo_batched(
        model, x, y, idx, key, E=2, microbatch=16, factored=True,
        shared_kernel=True, stable_projection=False, chol_precision="high")
    assert seen.get("spd") == ["high"]
    # CPU float64 runs precision contexts as no-ops — values must still
    # equal the generic ELBO with the knob set
    assert float(a) == pytest.approx(float(ref), rel=1e-9)
    assert float(b) == pytest.approx(float(ref), rel=1e-9)


# ---------------------------------------------------------------------------
# Hybrid (spatial + mean-field) head — reference Hybrid_NSF2
# ---------------------------------------------------------------------------

from gpzoo_tpu.train.elbo import negative_elbo_hybrid_batched  # noqa: E402


def _hybrid_model(key, whitened=False, N=300, D=12, L=3, T=2, M=20,
                  jitter=1e-1, scale_pf=0.1):
    k1, k2, k3 = jax.random.split(key, 3)
    kernel = gz.kernels.NSFRBF.create(L=L, sigma=1.1, lengthscale=0.8)
    cls = gz.gps.WSVGP if whitened else gz.gps.SVGP
    gp = cls.create(k1, kernel, dim=2, M=M, jitter=jitter)
    gp = gp.replace(mu=jax.random.normal(k3, (L, M)),
                    Lu_raw=0.1 * jax.random.normal(k3, (L, M, M)))
    prior2 = gz.gps.GaussianPrior.create(k2, N, L=T, scale_pf=scale_pf)
    return gz.models.HybridNSF.create(k1, gp, prior2, D, N, L=L, T=T)


@pytest.fixture(scope="module")
def hybrid_setup():
    coords, counts, _ = gz.data.simulate_nsf_counts(N=300, D=12, L=3)
    x = jnp.asarray(coords, jnp.float64)
    y = jnp.asarray(counts, jnp.float64)
    key = jax.random.PRNGKey(11)
    model = _hybrid_model(key)
    idx = jax.random.choice(jax.random.PRNGKey(7), 300, (64,),
                            replace=False)
    return model, x, y, idx, key


def test_hybrid_value_matches_generic(hybrid_setup):
    model, x, y, idx, key = hybrid_setup
    ref = negative_elbo_hybrid_batched(model, x, y, idx, key, E=2)
    for mb in (64, 32, 16):
        fast = nsf_negative_elbo_batched(model, x, y, idx, key, E=2,
                                         microbatch=mb)
        assert float(fast) == pytest.approx(float(ref), rel=1e-10), mb


def test_hybrid_gradient_matches_generic(hybrid_setup):
    model, x, y, idx, key = hybrid_setup
    g_ref = jax.grad(
        lambda m: negative_elbo_hybrid_batched(m, x, y, idx, key, E=2)
    )(model)
    g_fast = jax.grad(
        lambda m: nsf_negative_elbo_batched(m, x, y, idx, key, E=2,
                                            microbatch=16)
    )(model)
    for (pa, a), (pb, b) in zip(
        jax.tree_util.tree_leaves_with_path(g_ref),
        jax.tree_util.tree_leaves_with_path(g_fast),
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-6, atol=1e-9,
            err_msg=jax.tree_util.keystr(pa))


@pytest.mark.parametrize("whitened", [False, True])
def test_hybrid_factored_matches_generic(hybrid_setup, whitened):
    _, x, y, idx, key = hybrid_setup
    model = _hybrid_model(jax.random.PRNGKey(21), whitened=whitened)
    ref = negative_elbo_hybrid_batched(model, x, y, idx, key, E=2)
    # per-factor (L, M, M) Cholesky + factored → the W-form path when
    # unwhitened; the whitened branch runs the blocked-W projection
    fast = nsf_negative_elbo_batched(model, x, y, idx, key, E=2,
                                     microbatch=16, factored=True)
    assert float(fast) == pytest.approx(float(ref), rel=1e-8)
    g_ref = jax.grad(
        lambda m: negative_elbo_hybrid_batched(m, x, y, idx, key, E=2)
    )(model)
    g_fast = jax.grad(
        lambda m: nsf_negative_elbo_batched(m, x, y, idx, key, E=2,
                                            microbatch=16, factored=True)
    )(model)
    for (pa, a), (pb, b) in zip(
        jax.tree_util.tree_leaves_with_path(g_ref),
        jax.tree_util.tree_leaves_with_path(g_fast),
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-5, atol=1e-8,
            err_msg=f"{jax.tree_util.keystr(pa)} whitened={whitened}")


def test_hybrid_shared_kernel_matches_generic(hybrid_setup):
    model, x, y, idx, key = hybrid_setup
    ref = negative_elbo_hybrid_batched(model, x, y, idx, key, E=2)
    fast = nsf_negative_elbo_batched(model, x, y, idx, key, E=2,
                                     microbatch=16, factored=True,
                                     shared_kernel=True)
    assert float(fast) == pytest.approx(float(ref), rel=1e-8)


def test_hybrid_mggp_matches_generic(key, rng):
    """Hybrid with an MGGP spatial half (the Slideseq warm-start
    composition): groups threaded into the group-aware kernel."""
    n_groups, N, D, L, T, M = 3, 240, 10, 3, 2, 18
    coords = jnp.asarray(rng.uniform(-2, 2, size=(N, 2)), jnp.float64)
    counts = jnp.asarray(rng.poisson(2.0, size=(D, N)), jnp.float64)
    groups = jnp.asarray(rng.integers(0, n_groups, size=(N,)))
    k1, k2 = jax.random.split(key)
    kernel = gz.kernels.MGGPNSFRBF.create(
        sigma=1.0, lengthscale=1.2, group_diff_param=1.5,
        n_groups=n_groups, L=L)
    gp = gz.gps.MGGPSVGP.create(k1, kernel, dim=2, M=M, jitter=1e-1,
                                n_groups=n_groups)
    prior2 = gz.gps.GaussianPrior.create(k2, N, L=T, scale_pf=0.1)
    model = gz.models.HybridNSF.create(k1, gp, prior2, D, N, L=L, T=T)
    idx = jax.random.choice(jax.random.PRNGKey(5), N, (48,), replace=False)
    ref = negative_elbo_hybrid_batched(model, coords, counts, idx, key,
                                       E=2, groups_x=groups)
    fast = nsf_negative_elbo_batched(model, coords, counts, idx, key, E=2,
                                     microbatch=16, factored=True,
                                     groups=groups)
    assert float(fast) == pytest.approx(float(ref), rel=1e-8)

    # the exact head over the same MGGP spatial half (regression: the
    # HybridNSFExact.batched override must slice full-length groups_x
    # like HybridNSF.batched — it crashed on shape mismatch before)
    exact = gz.models.HybridNSFExact(sf=model.sf, cf=model.cf,
                                     V_raw=model.V_raw)
    ref_e = negative_elbo_hybrid_batched(exact, coords, counts, idx, key,
                                         E=2, groups_x=groups)
    fast_e = nsf_negative_elbo_batched(exact, coords, counts, idx, key,
                                       E=2, microbatch=16, factored=True,
                                       groups=groups)
    assert float(fast_e) == pytest.approx(float(ref_e), rel=1e-8)


def test_hybrid_precomputed_matches_generic(hybrid_setup):
    """Frozen-geometry hybrid: the precomputed-projection loss equals the
    generic hybrid ELBO (Z + kernel frozen — the fine-tune setting)."""
    model, x, y, idx, key = hybrid_setup
    proj = precompute_nsf_projection(model, x)
    ref = negative_elbo_hybrid_batched(model, x, y, idx, key, E=2)
    pre = nsf_negative_elbo_precomputed(model, proj, y, idx, key, E=2)
    assert float(pre) == pytest.approx(float(ref), rel=1e-8)
    g_ref = jax.grad(
        lambda m: negative_elbo_hybrid_batched(m, x, y, idx, key, E=2)
    )(model)
    g_pre = jax.grad(
        lambda m: nsf_negative_elbo_precomputed(m, proj, y, idx, key, E=2)
    )(model)
    for name, a, b in (
        ("mu", g_ref.sf.prior.mu, g_pre.sf.prior.mu),
        ("Lu_raw", g_ref.sf.prior.Lu_raw, g_pre.sf.prior.Lu_raw),
        ("sf.W_raw", g_ref.sf.W_raw, g_pre.sf.W_raw),
        ("cf.W_raw", g_ref.cf.W_raw, g_pre.cf.W_raw),
        ("cf.mean", g_ref.cf.prior.mean, g_pre.cf.prior.mean),
        ("cf.scale_raw", g_ref.cf.prior.scale_raw, g_pre.cf.prior.scale_raw),
        ("V_raw", g_ref.V_raw, g_pre.V_raw),
    ):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-6, atol=1e-9, err_msg=name)


def test_hybrid_whitened_precomputed(key):
    coords, counts, _ = gz.data.simulate_nsf_counts(N=260, D=10, L=3)
    x = jnp.asarray(coords, jnp.float64)
    y = jnp.asarray(counts, jnp.float64)
    model = _hybrid_model(jax.random.PRNGKey(31), whitened=True, N=260,
                          D=10)
    idx = jax.random.choice(jax.random.PRNGKey(6), 260, (52,),
                            replace=False)
    proj = precompute_nsf_projection(model, x)
    ref = negative_elbo_hybrid_batched(model, x, y, idx, key, E=2)
    pre = nsf_negative_elbo_precomputed(model, proj, y, idx, key, E=2)
    assert float(pre) == pytest.approx(float(ref), rel=1e-8)


def test_hybrid_legacy_rejected(hybrid_setup):
    _, x, y, idx, key = hybrid_setup
    gp = gz.gps.SVGP.create(
        key, gz.kernels.NSFRBF.create(L=3, lengthscale=1.0), dim=2, M=20,
        jitter=1e-1)
    legacy = gz.models.LegacyHybridNSF.create(key, gp, D=12, N=300, L=3,
                                              non_spatial_factors=2)
    with pytest.raises(NotImplementedError):
        nsf_negative_elbo_batched(legacy, x, y, idx, key, E=1,
                                  microbatch=16)


def _exact_model(seed=33, whitened=False):
    mc = _hybrid_model(jax.random.PRNGKey(seed), whitened=whitened)
    return gz.models.HybridNSFExact(sf=mc.sf, cf=mc.cf, V_raw=mc.V_raw)


def test_hybrid_exact_matches_generic(hybrid_setup):
    """HybridNSFExact dispatches into the fast path with the
    deterministic lognormal-mean rate (likelihoods.py:182-202) — NOT the
    MC-sampling objective (which differs by ~8x on this model)."""
    _, x, y, idx, key = hybrid_setup
    model = _exact_model()
    ref = negative_elbo_hybrid_batched(model, x, y, idx, key, E=2)
    for mb in (64, 16):
        fast = nsf_negative_elbo_batched(model, x, y, idx, key, E=2,
                                         microbatch=mb)
        assert float(fast) == pytest.approx(float(ref), rel=1e-10), mb
    g_ref = jax.grad(
        lambda m: negative_elbo_hybrid_batched(m, x, y, idx, key, E=2)
    )(model)
    g_fast = jax.grad(
        lambda m: nsf_negative_elbo_batched(m, x, y, idx, key, E=2,
                                            microbatch=16)
    )(model)
    for (pa, a), (pb, b) in zip(
        jax.tree_util.tree_leaves_with_path(g_ref),
        jax.tree_util.tree_leaves_with_path(g_fast),
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-6, atol=1e-9,
            err_msg=jax.tree_util.keystr(pa))


@pytest.mark.parametrize("whitened", [False, True])
def test_hybrid_exact_precomputed_matches_generic(hybrid_setup, whitened):
    _, x, y, idx, key = hybrid_setup
    model = _exact_model(seed=35, whitened=whitened)
    proj = precompute_nsf_projection(model, x)
    ref = negative_elbo_hybrid_batched(model, x, y, idx, key, E=2)
    pre = nsf_negative_elbo_precomputed(model, proj, y, idx, key, E=2)
    assert float(pre) == pytest.approx(float(ref), rel=1e-8)
