"""Unit tests for L0 math: distances, jitter, svgp_forward, whitened KL,
MDS embedding, bijectors — against hand-computed values and numpy."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gpzoo_tpu import bijectors
from gpzoo_tpu.ops import (
    add_jitter,
    cdist,
    embed_distance_matrix,
    reshape_param,
    safe_sqrt,
    squared_dist,
    svgp_forward,
    whitened_kl,
)


def test_squared_dist_matches_numpy(rng):
    x = rng.standard_normal((7, 3))
    z = rng.standard_normal((5, 3))
    d2 = squared_dist(jnp.asarray(x), jnp.asarray(z))
    expect = ((x[:, None, :] - z[None, :, :]) ** 2).sum(-1)
    np.testing.assert_allclose(np.asarray(d2), expect, rtol=1e-10)
    np.testing.assert_allclose(
        np.asarray(cdist(jnp.asarray(x), jnp.asarray(z))),
        np.sqrt(expect),
        rtol=1e-8,
    )


def test_squared_dist_clamps_negative():
    x = jnp.ones((4, 2))
    d2 = squared_dist(x, x)
    assert np.all(np.asarray(d2) >= 0.0)


def test_add_jitter_2d_and_3d():
    k = jnp.ones((3, 3))
    out = add_jitter(k, 0.5)
    np.testing.assert_allclose(np.diag(np.asarray(out)), 1.5)
    assert np.asarray(out)[0, 1] == 1.0

    kb = jnp.ones((2, 3, 3))
    outb = add_jitter(kb, 0.25)
    np.testing.assert_allclose(
        np.asarray(outb)[:, np.arange(3), np.arange(3)], 1.25
    )


def test_svgp_forward_shapes_and_values(rng):
    L, N, M = 2, 6, 4
    kxx = rng.standard_normal((L, N))
    kzz = rng.standard_normal((L, M, M))
    w = rng.standard_normal((L, N, M))
    mu = rng.standard_normal((M,))
    s = rng.standard_normal((L, M, M))
    mean, cov = svgp_forward(*map(jnp.asarray, (kxx, kzz, w, mu, s)))
    expect_mean = np.einsum("lnm,m->ln", w, mu)
    diff = s - kzz
    expect_cov = kxx + np.einsum("lnm,lmk,lnk->ln", w, diff, w)
    np.testing.assert_allclose(np.asarray(mean), expect_mean, rtol=1e-8)
    np.testing.assert_allclose(np.asarray(cov), expect_cov, rtol=1e-8)


def test_whitened_kl_closed_form(rng):
    """KL(N(m, LLᵀ) ‖ N(0,I)) cross-checked against the generic MVN KL."""
    m = 5
    mz = rng.standard_normal(m)
    a = rng.standard_normal((m, m)) * 0.3
    lz = np.tril(a, -1) + np.diag(np.exp(np.diag(a)))
    got = float(whitened_kl(jnp.asarray(mz), jnp.asarray(lz)))

    from gpzoo_tpu import dists

    q = dists.MultivariateNormalTril(jnp.asarray(mz), jnp.asarray(lz))
    p = dists.MultivariateNormalTril(jnp.zeros(m), jnp.eye(m))
    expect = float(dists.kl_divergence(q, p))
    assert got == pytest.approx(expect, rel=1e-8)


def test_whitened_kl_batched(rng):
    mz = rng.standard_normal((3, 4))
    lz = np.tril(rng.standard_normal((3, 4, 4))) + 2 * np.eye(4)
    out = whitened_kl(jnp.asarray(mz), jnp.asarray(lz))
    assert out.shape == (3,)
    one = float(whitened_kl(jnp.asarray(mz[1]), jnp.asarray(lz[1])))
    assert float(out[1]) == pytest.approx(one, rel=1e-10)


def test_embed_distance_matrix_reproduces_distances():
    """MDS of the complete graph: embedding distances ≈ input distances."""
    n = 4
    d = np.ones((n, n)) - np.eye(n)
    emb = np.asarray(embed_distance_matrix(jnp.asarray(d)))
    rec = np.sqrt(
        np.maximum(
            ((emb[:, None, :] - emb[None, :, :]) ** 2).sum(-1), 0.0
        )
    )
    np.testing.assert_allclose(rec, d, atol=2e-3)


def test_reshape_param_matches_reference(rng):
    """Parity vs utilities.reshape_param (utilities.py:377-380): flatten
    leading batch dims of a (..., M, M) array to (B, M, M)."""
    x = rng.standard_normal((2, 3, 4, 4))
    got = np.asarray(reshape_param(jnp.asarray(x)))
    assert got.shape == (6, 4, 4)
    torch = pytest.importorskip("torch")
    import parity_utils

    ref = parity_utils.import_reference()
    want = ref.utilities.reshape_param(torch.as_tensor(x)).numpy()
    np.testing.assert_array_equal(got, want)


def test_safe_sqrt_gradient_finite():
    g = jax.grad(lambda x: safe_sqrt(x))(0.0)
    assert np.isfinite(float(g))


def test_lower_cholesky_bijector_roundtrip(rng):
    raw = rng.standard_normal((4, 4))
    chol = bijectors.lower_cholesky(jnp.asarray(raw))
    c = np.asarray(chol)
    assert np.allclose(c, np.tril(c))
    assert np.all(np.diag(c) > 0)
    back = bijectors.lower_cholesky_inverse(chol)
    np.testing.assert_allclose(
        np.asarray(bijectors.lower_cholesky(back)), c, rtol=1e-10
    )


def test_softplus_inverse_roundtrip():
    y = jnp.asarray([0.1, 1.0, 5.0, 30.0])
    x = bijectors.softplus_inverse(y)
    np.testing.assert_allclose(
        np.asarray(bijectors.softplus(x)), np.asarray(y), rtol=1e-6
    )


def test_init_softplus_matches_reference_semantics():
    mat = np.array([0.5, 1.0, 25.0])
    out = bijectors.init_softplus(mat)
    # values < 20 inverted, >= 20 passed through
    np.testing.assert_allclose(
        np.log(np.exp(0.5) - 1 + 1e-5), out[0], rtol=1e-10
    )
    assert out[2] == 25.0


def test_tri_inverse_matches_solve(rng):
    from gpzoo_tpu.ops.linalg import spd_inverse_from_cholesky, tri_inverse

    for batch in ((), (3,)):
        a = rng.standard_normal(batch + (300, 300)) * 0.3
        k = a @ np.swapaxes(a, -1, -2) + 2.0 * np.eye(300)
        l = np.linalg.cholesky(k)
        w = tri_inverse(jnp.asarray(l), block=128)
        eye = np.eye(300)
        np.testing.assert_allclose(np.asarray(w) @ l, 
                                   np.broadcast_to(eye, l.shape),
                                   atol=1e-10)
        # strictly upper stays exactly zero (the concat layout)
        assert np.all(np.triu(np.asarray(w), 1) == 0.0)
        k_inv = spd_inverse_from_cholesky(jnp.asarray(l), block=128)
        np.testing.assert_allclose(np.asarray(k_inv) @ k,
                                   np.broadcast_to(eye, k.shape),
                                   atol=1e-9)


def test_cholesky_inverse_mm_matches_autodiff(rng):
    """Combined (chol, inverse) op: values match the (stock cholesky,
    tri_inverse) pair; the shared-W custom VJP matches autodiff through
    that pair with cotangents on BOTH outputs."""
    from gpzoo_tpu.ops.linalg import cholesky_inverse_mm, tri_inverse

    a = rng.standard_normal((3, 200, 200)) * 0.3
    k = jnp.asarray(a @ np.swapaxes(a, -1, -2) + 2.0 * np.eye(200))
    gl = jnp.asarray(rng.standard_normal((3, 200, 200)))
    gw = jnp.asarray(rng.standard_normal((3, 200, 200)))

    l, w = cholesky_inverse_mm(k)
    np.testing.assert_allclose(np.asarray(l),
                               np.asarray(jnp.linalg.cholesky(k)))
    np.testing.assert_allclose(
        np.asarray(w), np.asarray(tri_inverse(jnp.linalg.cholesky(k))),
        atol=1e-12)

    def loss_ref(k_):
        l_ = jnp.linalg.cholesky(k_)
        w_ = tri_inverse(l_)
        return jnp.sum(gl * l_) + jnp.sum(gw * w_)

    def loss_mm(k_):
        l_, w_ = cholesky_inverse_mm(k_)
        return jnp.sum(gl * l_) + jnp.sum(gw * w_)

    gr = jax.grad(loss_ref)(k)
    gm = jax.grad(loss_mm)(k)
    np.testing.assert_allclose(np.asarray(gm), np.asarray(gr),
                               rtol=1e-9, atol=1e-10)
    # single-cotangent cases too (only L used / only W used)
    gr_l = jax.grad(lambda k_: jnp.sum(gl * jnp.linalg.cholesky(k_)))(k)
    gm_l = jax.grad(lambda k_: jnp.sum(gl * cholesky_inverse_mm(k_)[0]))(k)
    np.testing.assert_allclose(np.asarray(gm_l), np.asarray(gr_l),
                               rtol=1e-9, atol=1e-10)


def test_cholesky_inverse_mm_blocked_bwd_matches_dense(rng, monkeypatch):
    """bwd_blocked=True (panel-blocked VJP products, update-slice
    assembly) must reproduce the dense backward exactly up to panel-sum
    reassociation — the small-jitter HIGHEST-gradient path dispatches it
    (train/fast.py)."""
    import gpzoo_tpu.ops.tri_blocked as tb
    from gpzoo_tpu.ops.linalg import cholesky_inverse_mm

    monkeypatch.setattr(tb, "MIN_DIM", 8)  # force multi-panel at test M
    a = rng.standard_normal((2, 50, 50)) * 0.3
    k = jnp.asarray(a @ np.swapaxes(a, -1, -2) + 2.0 * np.eye(50))
    gl = jnp.asarray(rng.standard_normal((2, 50, 50)))
    gw = jnp.asarray(rng.standard_normal((2, 50, 50)))

    def loss(k_, blocked):
        l_, w_ = cholesky_inverse_mm(k_, "highest", blocked)
        return jnp.sum(gl * l_) + jnp.sum(gw * w_)

    gd = jax.grad(loss)(k, False)
    gb = jax.grad(loss)(k, True)
    np.testing.assert_allclose(np.asarray(gb), np.asarray(gd),
                               rtol=1e-12, atol=1e-12)


def test_tri_blocked_matmuls_match_dense(rng):
    from gpzoo_tpu.ops.tri_blocked import tri_matmul, tri_tri_matmul

    for batch in ((), (3,)):
        w = np.tril(rng.standard_normal(batch + (257, 257)))
        lu = np.tril(rng.standard_normal(batch + (257, 257)))
        rhs = rng.standard_normal(batch + (257, 40))
        np.testing.assert_allclose(
            np.asarray(tri_matmul(jnp.asarray(w), jnp.asarray(rhs),
                                  panels=4)),
            w @ rhs, atol=1e-10)
        c = np.asarray(tri_tri_matmul(jnp.asarray(w), jnp.asarray(lu),
                                      panels=4))
        np.testing.assert_allclose(c, w @ lu, atol=1e-10)
        assert np.all(np.triu(c, 1) == 0.0)
    # broadcast: per-factor w with shared lu
    w = np.tril(rng.standard_normal((2, 257, 257)))
    lu = np.tril(rng.standard_normal((257, 257)))
    np.testing.assert_allclose(
        np.asarray(tri_tri_matmul(jnp.asarray(w), jnp.asarray(lu),
                                  panels=4)),
        w @ lu, atol=1e-10)


def test_tri_blocked_vjp_helpers_match_dense(rng):
    from gpzoo_tpu.ops.tri_blocked import (matmul_tri, matmul_tri_t,
                                           tri_t_matmul_b)

    for batch in ((), (2,)):
        w = np.tril(rng.standard_normal(batch + (257, 257)))
        a = rng.standard_normal(batch + (257, 257))
        wt = np.swapaxes(w, -1, -2)
        np.testing.assert_allclose(
            np.asarray(tri_t_matmul_b(jnp.asarray(w), jnp.asarray(a),
                                      panels=4)), wt @ a, atol=1e-10)
        np.testing.assert_allclose(
            np.asarray(matmul_tri(jnp.asarray(a), jnp.asarray(w),
                                  panels=4)), a @ w, atol=1e-10)
        np.testing.assert_allclose(
            np.asarray(matmul_tri_t(jnp.asarray(a), jnp.asarray(w),
                                    panels=4)), a @ wt, atol=1e-10)


def test_cholesky_blocked_matches_stock(rng):
    from gpzoo_tpu.ops.linalg import cholesky_blocked

    for batch in ((), (4,)):
        a = rng.standard_normal(batch + (300, 300)) * 0.3
        k = a @ np.swapaxes(a, -1, -2) + 2.0 * np.eye(300)
        l_b = cholesky_blocked(jnp.asarray(k), block=128)
        l_s = np.linalg.cholesky(k)
        np.testing.assert_allclose(np.asarray(l_b), l_s,
                                   rtol=1e-10, atol=1e-12)
        # strictly upper stays exactly zero (concat layout)
        assert np.all(np.triu(np.asarray(l_b), 1) == 0.0)


def test_cholesky_mm_matches_builtin(rng):
    from gpzoo_tpu.ops.linalg import cholesky_mm

    a = rng.standard_normal((3, 200, 200)) * 0.3
    k = jnp.asarray(a @ np.swapaxes(a, -1, -2) + 2.0 * np.eye(200))
    g = jnp.asarray(rng.standard_normal((3, 200, 200)))
    np.testing.assert_allclose(np.asarray(cholesky_mm(k)),
                               np.asarray(jnp.linalg.cholesky(k)))
    gr = jax.grad(lambda k_: jnp.sum(g * jnp.linalg.cholesky(k_)))(k)
    gm = jax.grad(lambda k_: jnp.sum(g * cholesky_mm(k_)))(k)
    np.testing.assert_allclose(np.asarray(gm), np.asarray(gr),
                               rtol=1e-10, atol=1e-12)
