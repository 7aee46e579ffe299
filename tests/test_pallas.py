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


def test_vnngp_block_conditional_matches_xla(rng):
    from gpzoo_tpu.ops import vnngp_pallas

    n, k = 300, 5  # non-multiple of the tile to exercise padding
    a = rng.standard_normal((n, k, k)).astype(np.float32)
    kzz = a @ np.swapaxes(a, -1, -2) + 3 * np.eye(k, dtype=np.float32)
    b = rng.standard_normal((n, k, k)).astype(np.float32) * 0.3
    s = b @ np.swapaxes(b, -1, -2)
    kxz = rng.standard_normal((n, k)).astype(np.float32)
    mu = rng.standard_normal((n, k)).astype(np.float32)
    kxx = rng.uniform(0.5, 2.0, n).astype(np.float32)

    mean_p, cov_p = vnngp_pallas.block_conditional(
        jnp.asarray(kzz), jnp.asarray(s), jnp.asarray(kxz),
        jnp.asarray(mu), jnp.asarray(kxx), 1e-2, True,
    )
    mean_x, cov_x = vnngp_pallas._xla_reference(
        jnp.asarray(kzz), jnp.asarray(s), jnp.asarray(kxz),
        jnp.asarray(mu), jnp.asarray(kxx), 1e-2,
    )
    np.testing.assert_allclose(np.asarray(mean_p), np.asarray(mean_x),
                               rtol=2e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(cov_p), np.asarray(cov_x),
                               rtol=2e-4, atol=1e-5)


def test_vnngp_block_conditional_gradients(rng):
    from gpzoo_tpu.ops import vnngp_pallas

    n, k = 64, 3
    a = rng.standard_normal((n, k, k)).astype(np.float32)
    kzz = jnp.asarray(a @ np.swapaxes(a, -1, -2) +
                      3 * np.eye(k, dtype=np.float32))
    b = rng.standard_normal((n, k, k)).astype(np.float32) * 0.3
    s = jnp.asarray(b @ np.swapaxes(b, -1, -2))
    kxz = jnp.asarray(rng.standard_normal((n, k)).astype(np.float32))
    mu = jnp.asarray(rng.standard_normal((n, k)).astype(np.float32))
    kxx = jnp.asarray(rng.uniform(0.5, 2.0, n).astype(np.float32))

    def loss_p(s, mu):
        m, c = vnngp_pallas.block_conditional(kzz, s, kxz, mu, kxx,
                                              1e-2, True)
        return jnp.sum(m * m + c)

    def loss_x(s, mu):
        m, c = vnngp_pallas._xla_reference(kzz, s, kxz, mu, kxx, 1e-2)
        return jnp.sum(m * m + c)

    g_p = jax.grad(loss_p, argnums=(0, 1))(s, mu)
    g_x = jax.grad(loss_x, argnums=(0, 1))(s, mu)
    for a_, b_ in zip(g_p, g_x):
        np.testing.assert_allclose(np.asarray(a_), np.asarray(b_),
                                   rtol=1e-4, atol=1e-5)


# ---------------------------------------------------------------------------
# Triangular contraction: Pallas kernel (interpret) + blocked-XLA panels
# ---------------------------------------------------------------------------

def _tri_operands(rng, L=2, M=200, B=260):
    lu = jnp.tril(jnp.asarray(
        rng.standard_normal((L, M, M)).astype(np.float32)))
    a = jnp.asarray(rng.standard_normal((M, B)).astype(np.float32))
    return lu, a


def test_tri_t_matmul_matches_einsum(rng):
    from gpzoo_tpu.ops import tri_pallas

    lu, a = _tri_operands(rng)
    got = tri_pallas.tri_t_matmul(lu, a, True, 128, 128, 128)
    # kernel computes in bf16 operands / f32 accumulation
    bf = lambda t: t.astype(jnp.bfloat16).astype(jnp.float32)
    expect = jnp.einsum("lkm,kb->lmb", bf(lu), bf(a))
    scale = float(jnp.max(jnp.abs(expect)))
    np.testing.assert_allclose(np.asarray(got) / scale,
                               np.asarray(expect) / scale, atol=5e-3)


def test_tri_t_matmul_gradients(rng):
    from gpzoo_tpu.ops import tri_pallas

    lu, a = _tri_operands(rng, M=130, B=140)
    g = jnp.asarray(rng.standard_normal(
        (lu.shape[0], 130, 140)).astype(np.float32))

    def loss_p(lu, a):
        return jnp.sum(g * tri_pallas.tri_t_matmul(lu, a, True,
                                                   128, 128, 128))

    def loss_x(lu, a):
        # tril on lu so the oracle's grad matches the tril contract
        return jnp.sum(g * jnp.einsum("lkm,kb->lmb", jnp.tril(lu), a))

    gp = jax.grad(loss_p, (0, 1))(lu, a)
    gx = jax.grad(loss_x, (0, 1))(lu, a)
    for got, expect in zip(gp, gx):
        scale = float(jnp.max(jnp.abs(expect)))
        np.testing.assert_allclose(np.asarray(got) / scale,
                                   np.asarray(expect) / scale, atol=5e-3)


def test_tri_blocked_sq_colsum(rng):
    from gpzoo_tpu.ops import tri_blocked

    lu, a = _tri_operands(rng)
    got = tri_blocked.tri_sq_colsum(lu, a, panels=3)
    expect = jnp.sum(jnp.square(jnp.einsum("lkm,kb->lmb", lu, a)), axis=-2)
    np.testing.assert_allclose(np.asarray(got), np.asarray(expect),
                               rtol=1e-4)
    # gradient parity under the tril contract: the blocked form never
    # reads the structural-zero entries (zero grads there, matching
    # autodiff through the lower_cholesky bijector) — compare through an
    # explicit tril so the dense oracle carries the same mask
    g2 = jnp.asarray(rng.standard_normal(got.shape).astype(np.float32))
    gb = jax.grad(lambda l_: jnp.sum(
        g2 * tri_blocked.tri_sq_colsum(jnp.tril(l_), a, panels=3)))(lu)
    gd = jax.grad(lambda l_: jnp.sum(g2 * jnp.sum(jnp.square(
        jnp.einsum("lkm,kb->lmb", jnp.tril(l_), a)), axis=-2)))(lu)
    scale = float(jnp.max(jnp.abs(gd)))
    np.testing.assert_allclose(np.asarray(gb) / scale,
                               np.asarray(gd) / scale, atol=1e-5)


def test_tri_blocked_kl_trace(rng):
    from gpzoo_tpu.ops import tri_blocked

    lu, _ = _tri_operands(rng)
    r = rng.standard_normal((200, 200)).astype(np.float32) * 0.1
    k_inv = jnp.asarray(r @ r.T + np.eye(200, dtype=np.float32))
    got = tri_blocked.tri_kl_trace(k_inv, lu, panels=3)
    expect = jnp.einsum("ij,ljk,lik->l", k_inv, lu, lu)
    np.testing.assert_allclose(np.asarray(got), np.asarray(expect),
                               rtol=1e-4)


def test_tri_blocked_batched_a(rng):
    """L-batched a (the non-shared chunk path layout)."""
    from gpzoo_tpu.ops import tri_blocked

    lu, _ = _tri_operands(rng)
    a = jnp.asarray(rng.standard_normal(
        (lu.shape[0], 200, 70)).astype(np.float32))
    got = tri_blocked.tri_sq_colsum(lu, a, panels=3)
    expect = jnp.sum(jnp.square(
        jnp.einsum("lkm,lkn->lmn", lu, a)), axis=-2)
    np.testing.assert_allclose(np.asarray(got), np.asarray(expect),
                               rtol=1e-4)
