"""Synthetic-recovery tests — the pytest versions of the reference's
validation notebooks (SURVEY.md §4.1): fit models to data with known
ground truth and assert posterior quality / hyperparameter movement."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

import gpzoo_tpu as gz
from gpzoo_tpu.ops import add_jitter
from gpzoo_tpu.train import (
    TrainState,
    make_scan_runner,
    make_train_step,
    negative_elbo,
)
from gpzoo_tpu.train.elbo import whitened_negative_elbo


def test_svgp_1d_toy_posterior(key):
    """SVGP.ipynb: fit 2·sin(2x)+ε; posterior mean must track the truth."""
    x_np, y_np = gz.data.simulate_1d_regression(n=800, noise=0.5)
    x, y = jnp.asarray(x_np), jnp.asarray(y_np)

    kernel = gz.kernels.RBF(sigma=jnp.asarray(1.0),
                            lengthscale=jnp.asarray(1.0))
    gp = gz.gps.SVGP.create(key, kernel, dim=1, M=32, jitter=1e-3)
    # small initial variational covariance (Lu = 0.1·I) — the reference's
    # randn Lu init wanders through a noise-inflating basin for hundreds
    # of steps before converging.
    gp = gp.replace(Z=jnp.linspace(0, 6, 32)[:, None],
                    Lu_raw=-2.3 * jnp.eye(32))
    model = gz.models.GaussianLikelihood.create(gp, noise=0.5)

    opt = optax.adam(2e-2)
    state = TrainState.create(model, opt, key)
    step = make_train_step(negative_elbo, opt, static_kwargs={"E": 5})
    runner = make_scan_runner(step, 100)  # scan-fused: one dispatch/chunk
    for _ in range(3):
        state, _ = runner(state, x, y)

    qf, _, _ = state.model.gp(x)
    truth = 2 * jnp.sin(2 * x[:, 0])
    rmse = float(jnp.sqrt(jnp.mean((qf.mean - truth) ** 2)))
    assert rmse < 0.15, rmse
    # noise estimate should approach the true 0.5
    noise = float(jax.nn.softplus(state.model.noise_raw))
    assert 0.4 < noise < 0.65, noise


def test_mggp_whitened_fit_improves(key, rng):
    """mggp_test.ipynb (light): sample from a ground-truth multi-group
    kernel, fit MGGP_WSVGP + whitened KL; ELBO improves and the fitted
    posterior correlates with the latent function."""
    n = 200
    kx, kg, kf, kn = jax.random.split(key, 4)
    x = jax.random.uniform(kx, (n, 1), minval=-3.0, maxval=3.0)
    groups = jax.random.randint(kg, (n,), 0, 2)
    true_kernel = gz.kernels.BatchedMGGPRBF.create(
        sigma=2.0, lengthscale=1.5, group_diff_param=2.0, n_groups=2,
        input_dim=1,
    )
    k = add_jitter(true_kernel.gram(x, x, groups, groups), 1e-4)
    f = jnp.linalg.cholesky(k) @ jax.random.normal(kf, (n,))
    y = f + 0.1 * jax.random.normal(kn, (n,))

    kernel = gz.kernels.BatchedMGGPRBF.create(
        sigma=1.0, lengthscale=1.0, group_diff_param=1.0, n_groups=2,
        input_dim=1,
    )
    gp = gz.gps.MGGPWSVGP.create(key, kernel, dim=1, M=40, n_groups=2,
                                 jitter=1e-4)
    gp = gp.replace(Z=x[:40], groupsZ=groups[:40])
    model = gz.models.GaussianLikelihood.create(gp, noise=0.5)

    from gpzoo_tpu.train import partition_optimizer, trainable_mask

    # mask the integer groupsZ labels out of Adam (their moment zeros
    # would dtype-promote inside the scan carry)
    mask = trainable_mask(model, lambda p: "groupsZ" not in p)
    opt = partition_optimizer(optax.adam(2e-2), mask)
    state = TrainState.create(model, opt, key)
    step = make_train_step(whitened_negative_elbo, opt,
                           static_kwargs={"E": 5, "groups_x": groups})
    runner = make_scan_runner(step, 100)
    first = None
    for _ in range(3):
        state, losses = runner(state, x, y)
        first = first if first is not None else float(losses[0])
    assert float(losses[-1]) < first

    qf, _, _ = state.model.gp(x, groups_x=groups)
    corr = np.corrcoef(np.asarray(qf.mean), np.asarray(f))[0, 1]
    assert corr > 0.9, corr


def test_vnngp_full_neighborhood_matches_svgp(key, rng):
    """With K = M (every inducing point is a neighbor), VNNGP's marginal
    posterior must equal SVGP's exactly — with SVGP's jitter doubled,
    because VNNGP re-jitters the gathered blocks (the reference's in-place
    add_jitter at gp.py:77 makes K + 2j the effective block matrix)."""
    n, m = 30, 12
    x = jnp.asarray(rng.uniform(-2, 2, (n, 1)))
    kernel = gz.kernels.RBF(sigma=jnp.asarray(1.0),
                            lengthscale=jnp.asarray(1.0))
    kz, kl = jax.random.split(key)
    z = jnp.asarray(rng.uniform(-2, 2, (m, 1)))
    lu_raw = 0.3 * jax.random.normal(kl, (m, m))
    mu = jnp.asarray(rng.standard_normal(m))

    j = 1e-4
    svgp = gz.gps.SVGP(kernel=kernel, Z=z, mu=mu, Lu_raw=lu_raw,
                       jitter=2 * j, var_floor=0.0)
    vnngp = gz.gps.VNNGP(kernel=kernel, Z=z, mu=mu, Lu_raw=lu_raw,
                         K=m, jitter=j, var_floor=0.0)

    qf_s, _, _ = svgp(x)
    qf_v, _, _ = vnngp(x)
    np.testing.assert_allclose(np.asarray(qf_v.mean),
                               np.asarray(qf_s.mean), rtol=1e-8)
    np.testing.assert_allclose(np.asarray(qf_v.scale),
                               np.asarray(qf_s.scale), rtol=1e-7)


def test_lbfgs_closure_equivalent(key):
    """train_closure_batched analog (utilities.py:566-596): optax's LBFGS
    consumes (value, grad) pairs from the same jitted loss."""
    x_np, y_np = gz.data.simulate_1d_regression(n=500)
    x, y = jnp.asarray(x_np), jnp.asarray(y_np)
    kernel = gz.kernels.RBF(sigma=jnp.asarray(1.0),
                            lengthscale=jnp.asarray(1.0))
    gp = gz.gps.SVGP.create(key, kernel, dim=1, M=16, jitter=1e-3)
    gp = gp.replace(Z=jnp.linspace(0, 6, 16)[:, None])
    model = gz.models.ExactLikelihood.create(gp, noise=0.5)

    from gpzoo_tpu.train.elbo import gaussian_exact_negative_elbo

    opt = optax.lbfgs()

    def loss(m):
        return gaussian_exact_negative_elbo(m, x, y)

    @jax.jit  # compile the whole L-BFGS iteration incl. the line search
    def lbfgs_step(params, state):
        value, grads = jax.value_and_grad(loss)(params)
        updates, state = opt.update(
            grads, state, params, value=value, grad=grads, value_fn=loss
        )
        return optax.apply_updates(params, updates), state

    state = opt.init(model)
    params = model
    for _ in range(20):
        params, state = lbfgs_step(params, state)
    assert float(loss(params)) < float(loss(model))


def test_pnmf_recovers_shape_dictionary(key):
    """Toy-image NMF (reference Fake_nmf.ipynb): PNMF recovers the
    binary shape parts from Poisson count images."""
    import numpy as np

    coords, counts, parts = gz.data.simulate_shape_images(D=60, side=12)
    y = jnp.asarray(counts)
    cfg = gz.PNMFConfig(D=60, N=counts.shape[1], L=3, E=5)
    model = cfg.build(key)
    opt = cfg.optimizer()

    from gpzoo_tpu.train import TrainState, make_scan_runner, make_train_step
    from gpzoo_tpu.train.elbo import pnmf_negative_elbo

    state = TrainState.create(model, opt, key)
    step = make_train_step(
        lambda m, yy, key: pnmf_negative_elbo(m, yy, key, E=cfg.E), opt
    )
    runner = make_scan_runner(step, 300)
    for _ in range(4):
        state, losses = runner(state, y)
    factors = np.exp(np.asarray(state.model.prior.mean))  # (L, n_pix)
    corr = gz.data.best_match_correlation(parts, factors)
    assert np.all(corr > 0.5), corr
