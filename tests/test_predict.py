"""Posterior-extraction API: chunked == unchunked, factor ranking works."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import gpzoo_tpu as gz
from gpzoo_tpu import predict
from gpzoo_tpu.predict import extract_factors, latent_posterior


@pytest.fixture(scope="module")
def setup():
    coords, counts, _ = gz.data.simulate_nsf_counts(N=330, D=10, L=3)
    x = jnp.asarray(coords, jnp.float64)
    key = jax.random.PRNGKey(0)
    model = gz.NSFConfig(D=10, N=330, L=3, M=20).build(key, X=x)
    # non-degenerate posterior mean (mu=0 gives constant factors, whose
    # Moran's I is 0/0)
    model = model.replace(prior=model.prior.replace(
        mu=jax.random.normal(key, (3, 20))))
    return x, coords, model


def test_chunked_matches_unchunked(setup):
    x, coords, model = setup
    m0, s0 = latent_posterior(model.prior, x)
    # 330 is not a multiple of 64 — exercises padding
    m1, s1 = latent_posterior(model.prior, x, chunk_size=64)
    np.testing.assert_allclose(np.asarray(m1), np.asarray(m0), rtol=1e-8)
    np.testing.assert_allclose(np.asarray(s1), np.asarray(s0), rtol=1e-8)


def test_extract_factors(setup):
    x, coords, model = setup
    factors, idx, morans = extract_factors(model, x, chunk_size=128)
    assert factors.shape == (3, 330)
    assert np.all(factors > 0)
    assert len(idx) == 3 and np.all(np.diff(morans) <= 1e-12)


def test_mggp_latent_posterior(key):
    rng = np.random.default_rng(0)
    n, G = 150, 3
    x = jnp.asarray(rng.uniform(-2, 2, (n, 2)))
    groups = jnp.asarray(rng.integers(0, G, n))
    kernel = gz.kernels.MGGPNSFRBF.create(n_groups=G, L=2)
    gp = gz.gps.MGGPSVGP.create(key, kernel, dim=2, M=12, n_groups=G,
                                jitter=1e-1)
    m0, _ = latent_posterior(gp, x, groups=groups)
    m1, _ = latent_posterior(gp, x, groups=groups, chunk_size=50)
    np.testing.assert_allclose(np.asarray(m1), np.asarray(m0), rtol=1e-8)


def test_elbo_shape_guard(setup, key):
    from gpzoo_tpu.train import negative_elbo_batched
    from gpzoo_tpu.train.fast import nsf_negative_elbo_batched

    x, coords, model = setup
    y_bad = jnp.ones((10, 100))  # wrong spot count
    idx = jnp.arange(16)
    with pytest.raises(ValueError):
        negative_elbo_batched(model, x, y_bad, idx, key, E=1)
    with pytest.raises(ValueError):
        nsf_negative_elbo_batched(model, x, y_bad, idx, key, E=1,
                                  microbatch=16)


def test_latent_posterior_sharded_matches(rng):
    """mesh= shards the full-N forward over the data axis; values equal
    the single-device forward (SURVEY §3.5: sharded pjit forward)."""
    from gpzoo_tpu.parallel import data_parallel_mesh

    key = jax.random.PRNGKey(0)
    x = jnp.asarray(rng.uniform(-2, 2, size=(203, 2)))  # non-multiple of 8
    kernel = gz.kernels.NSFRBF.create(sigma=1.0, lengthscale=1.0, L=3)
    gp = gz.gps.SVGP.create(key, kernel, dim=2, M=24, jitter=1e-2)

    mean0, scale0 = predict.latent_posterior(gp, x)
    mesh = data_parallel_mesh()
    mean1, scale1 = predict.latent_posterior(gp, x, mesh=mesh)
    np.testing.assert_allclose(np.asarray(mean1), np.asarray(mean0),
                               rtol=1e-9, atol=1e-12)
    np.testing.assert_allclose(np.asarray(scale1), np.asarray(scale0),
                               rtol=1e-9, atol=1e-12)
