"""Pallas Gram kernels (interpret mode on CPU) vs the XLA kernel path."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gpzoo_tpu import kernels
from gpzoo_tpu.bijectors import GroupDiffConvention
from gpzoo_tpu.ops import gram_pallas


@pytest.fixture
def xz(rng):
    # sizes straddle tile boundaries to exercise padding
    x = rng.standard_normal((300, 2)).astype(np.float32)
    z = rng.standard_normal((270, 2)).astype(np.float32)
    return jnp.asarray(x), jnp.asarray(z)


def test_rbf_gram_matches_xla(xz):
    x, z = xz
    L = 3
    sigma = jnp.asarray([1.0, 1.5, 0.7], jnp.float32)
    ell = jnp.asarray([0.5, 1.0, 2.0], jnp.float32)
    got = gram_pallas.rbf_gram(x, z, sigma, ell, True)
    ref_k = kernels.BatchedRBF(sigma=sigma, lengthscale=ell)
    expect = ref_k.gram(x, z)
    np.testing.assert_allclose(np.asarray(got), np.asarray(expect),
                               rtol=2e-5, atol=1e-6)


def test_rbf_gram_gradients_match_xla(xz):
    x, z = xz
    x, z = x[:64], z[:48]  # keep the grad check cheap
    sigma = jnp.asarray([1.1, 0.9], jnp.float32)
    ell = jnp.asarray([0.8, 1.3], jnp.float32)

    def loss_pallas(x, z, s, e):
        return jnp.sum(jnp.sin(gram_pallas.rbf_gram(x, z, s, e, True)))

    def loss_xla(x, z, s, e):
        k = kernels.BatchedRBF(sigma=s, lengthscale=e)
        return jnp.sum(jnp.sin(k.gram(x, z)))

    g1 = jax.grad(loss_pallas, argnums=(0, 1, 2, 3))(x, z, sigma, ell)
    g2 = jax.grad(loss_xla, argnums=(0, 1, 2, 3))(x, z, sigma, ell)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=1e-5)


def test_mggp_gram_matches_xla(xz, rng):
    x, z = xz
    L, G = 2, 4
    gx = jnp.asarray(rng.integers(0, G, x.shape[0]))
    gz = jnp.asarray(rng.integers(0, G, z.shape[0]))
    k = kernels.MGGPNSFRBF.create(
        sigma=1.2, lengthscale=0.9, group_diff_param=0.7, n_groups=G, L=L
    )
    k = jax.tree_util.tree_map(
        lambda a: a.astype(jnp.float32) if a.dtype == jnp.float64 else a, k
    )
    expect = k.gram(x, z, gx, gz)

    ex = k.embedding[gx].astype(jnp.float32)
    ez = k.embedding[gz].astype(jnp.float32)
    alpha_eff = GroupDiffConvention.SQUARED.apply(
        k.group_diff_param.reshape(-1)
    )
    got = gram_pallas.mggp_gram(
        x, z, ex, ez,
        k.sigma.reshape(-1), k.lengthscale.reshape(-1),
        alpha_eff, input_dim=k.input_dim, interpret=True,
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(expect),
                               rtol=2e-5, atol=1e-6)


def test_enabled_for_heuristic():
    assert not gram_pallas.enabled_for(64, 64, 2, jnp.float32)  # too small
    assert not gram_pallas.enabled_for(512, 512, 2, jnp.float64)  # dtype
    # backend on CI is cpu → disabled regardless of shape
    assert not gram_pallas.enabled_for(512, 512, 2, jnp.float32) or \
        jax.default_backend() in ("tpu", "axon")
