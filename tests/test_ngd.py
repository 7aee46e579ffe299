"""Natural-gradient VI for q(u) (beyond-reference, train/ngd.py).

Contracts:

* the natural update is EXACT for conjugate Gaussian models — one step
  at ρ=1 from any PD initialization lands on the closed-form posterior
  (the defining property of NGVI);
* the (m, S) ELBO equals ``nsf_negative_elbo_precomputed`` at
  S = Lu Luᵀ (same projection, same key);
* the full NGD+Adam step trains the toy north-star configuration and
  reaches a (much) lower loss than Adam at an equal step budget;
* ``ngd_to_model`` writes the covariance back so the standard paths see
  the trained q(u).
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

import gpzoo_tpu as gz
from gpzoo_tpu.bijectors import lower_cholesky
from gpzoo_tpu.ops.linalg import tril_logdet
from gpzoo_tpu.train.fast import (nsf_negative_elbo_precomputed,
                                  precompute_nsf_projection)
from gpzoo_tpu.train.ngd import (NGDTrainState, _ngd_negative_elbo_nologdet,
                                 make_ngd_train_step, natural_update,
                                 ngd_create, ngd_to_model)

N, D, L, M, B = 400, 12, 3, 24, 64


def test_natural_update_conjugate_exact(rng):
    """Gaussian likelihood y = A u + ε: one ρ=1 natural step from an
    arbitrary PD start recovers the exact posterior
    S* = (K⁻¹ + AᵀA/σ²)⁻¹, m* = S* Aᵀ y / σ² — in one shot."""
    m_dim, n_obs, sigma2 = 6, 9, 0.3
    a = jnp.asarray(rng.normal(size=(n_obs, m_dim)))
    y = jnp.asarray(rng.normal(size=(n_obs,)))
    k = jnp.asarray(rng.normal(size=(m_dim, m_dim)))
    k = k @ k.T + m_dim * jnp.eye(m_dim)
    k_inv = jnp.linalg.inv(k)

    def neg_elbo(m, s):
        fit = 0.5 / sigma2 * (
            jnp.sum(jnp.square(y - a @ m)) + jnp.trace(a.T @ a @ s)
        )
        kl = 0.5 * (
            jnp.trace(k_inv @ s) + m @ k_inv @ m - m_dim
            - jnp.linalg.slogdet(s)[1] + jnp.linalg.slogdet(k)[1]
        )
        return fit + kl

    # arbitrary PD start
    m0 = jnp.asarray(rng.normal(size=(m_dim,)))
    ls = jnp.asarray(rng.normal(size=(m_dim, m_dim)))
    s0 = ls @ ls.T + jnp.eye(m_dim)
    p0 = jnp.linalg.inv(s0)

    g_m, g_s = jax.grad(neg_elbo, argnums=(0, 1))(m0, s0)
    # natural_update is batched (L, M, M); lift to L=1
    m1, p1, _ = natural_update(m0[None], p0[None], g_m[None], g_s[None],
                               rho=1.0)

    p_star = k_inv + a.T @ a / sigma2
    m_star = jnp.linalg.solve(p_star, a.T @ y / sigma2)
    np.testing.assert_allclose(np.asarray(p1[0]), np.asarray(p_star),
                               rtol=1e-9, atol=1e-9)
    np.testing.assert_allclose(np.asarray(m1[0]), np.asarray(m_star),
                               rtol=1e-9, atol=1e-9)


@pytest.fixture(scope="module")
def nsf_setup():
    coords, counts, _ = gz.data.simulate_nsf_counts(N=N, D=D, L=L)
    x = jnp.asarray(coords, jnp.float64)
    y = jnp.asarray(counts, jnp.float64)
    key = jax.random.PRNGKey(3)
    model = gz.SlideseqNSFConfig(D=D, N=N, L=L, M=M, batch_size=B).build(
        key, x)
    # non-identity q(u) covariance so the logdet/trace terms are exercised
    lu_raw = 0.2 * jax.random.normal(jax.random.PRNGKey(8), (L, M, M))
    model = model.replace(prior=model.prior.replace(Lu_raw=lu_raw))
    return model, x, y, key


def test_ngd_elbo_matches_precomputed(nsf_setup):
    model, x, y, key = nsf_setup
    proj = precompute_nsf_projection(model, x)
    idx = jax.random.choice(jax.random.PRNGKey(5), N, (B,), replace=False)
    ref = nsf_negative_elbo_precomputed(model, proj, y, idx, key, E=2)
    lu = lower_cholesky(model.prior.Lu_raw)
    s = jnp.einsum("lmk,lnk->lmn", lu, lu)
    val = _ngd_negative_elbo_nologdet(model, s, proj, y, idx, key, E=2)
    val = val - jnp.sum(tril_logdet(lu))  # add the −½ logdet S KL term
    assert float(val) == pytest.approx(float(ref), rel=1e-9)


def test_ngd_beats_adam_at_equal_steps(nsf_setup):
    """The capability's point: at an equal 150-step budget on the frozen-
    geometry toy, NGD on q(u) reaches a much lower −ELBO than Adam."""
    model, x, y, key = nsf_setup
    proj = precompute_nsf_projection(model, x)
    steps = 150

    # Adam baseline (the production step)
    opt = optax.adam(2e-3)
    from gpzoo_tpu.train import TrainState, make_batched_train_step

    st = TrainState.create(model, opt, jax.random.PRNGKey(1))
    adam_step = make_batched_train_step(
        nsf_negative_elbo_precomputed, opt, num_points=N, batch_size=B,
        static_kwargs={"E": 1})
    adam_losses = []
    for _ in range(steps):
        st, l = adam_step(st, proj, y)
        adam_losses.append(float(l))

    state, part_opt = ngd_create(model, optax.adam(2e-3),
                                 jax.random.PRNGKey(1))
    ngd_step = make_ngd_train_step(
        part_opt, num_points=N, batch_size=B, nat_lr=0.05, ramp_steps=50,
        static_kwargs={"E": 1})
    ngd_losses = []
    for _ in range(steps):
        state, l = ngd_step(state, proj, y)
        ngd_losses.append(float(l))

    assert np.isfinite(ngd_losses).all()
    # the two losses are the same objective (test above); NGD must be
    # clearly ahead at the same step count. (No self-descent assert:
    # this toy's init is already near the mu/Lu optimum, so per-batch
    # noise dominates the NGD trace's own trend.)
    assert np.mean(ngd_losses[-10:]) < np.mean(adam_losses[-10:]), (
        np.mean(ngd_losses[-10:]), np.mean(adam_losses[-10:]))


def test_ngd_poisoned_step_skips_update(nsf_setup):
    """A non-finite loss (here: inf counts, the cleanest deterministic
    poison — any overflowed MC draw behaves the same) must skip the
    ENTIRE update: model, Adam state, and (m, P) all keep their values,
    only step/key advance, and the next clean step recovers."""
    model, x, y, key = nsf_setup
    proj = precompute_nsf_projection(model, x)
    state, part_opt = ngd_create(model, optax.adam(1e-3),
                                 jax.random.PRNGKey(1))
    step = make_ngd_train_step(part_opt, num_points=N, batch_size=B,
                               nat_lr=0.05, ramp_steps=10,
                               static_kwargs={"E": 1})
    y_bad = jnp.full_like(jnp.asarray(y), jnp.inf)
    state2, loss = step(state, proj, y_bad)
    assert not np.isfinite(float(loss))
    assert int(state2.step) == int(state.step) + 1
    for a, b in zip(jax.tree.leaves(state.model),
                    jax.tree.leaves(state2.model), strict=True):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(jax.tree.leaves(state.opt_state),
                    jax.tree.leaves(state2.opt_state), strict=True):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    np.testing.assert_array_equal(np.asarray(state.prec),
                                  np.asarray(state2.prec))
    np.testing.assert_array_equal(np.asarray(state.prec_chol),
                                  np.asarray(state2.prec_chol))
    state3, loss3 = step(state2, proj, y)
    assert np.isfinite(float(loss3))


def test_ngd_sharded_step_matches_unsharded(nsf_setup):
    """DP-sharded NGD step ≡ single-device: the idx sharding constraint
    partitions the batch axis without changing the math (same key → same
    minibatch → same loss and same natural update, float64)."""
    from gpzoo_tpu.parallel import data_parallel_mesh, replicate

    model, x, y, key = nsf_setup
    proj = precompute_nsf_projection(model, x)
    kw = dict(num_points=N, batch_size=B, nat_lr=0.05, ramp_steps=10,
              static_kwargs={"E": 1})
    state, part_opt = ngd_create(model, optax.adam(1e-3),
                                 jax.random.PRNGKey(1))
    step_ref = make_ngd_train_step(part_opt, **kw)
    mesh = data_parallel_mesh()
    step_sh = make_ngd_train_step(part_opt, mesh=mesh, **kw)
    s_sh = replicate(mesh, state)
    proj_sh, y_sh = replicate(mesh, (proj, y))
    for _ in range(3):
        state, l_ref = step_ref(state, proj, y)
        s_sh, l_sh = step_sh(s_sh, proj_sh, y_sh)
        assert float(l_ref) == pytest.approx(float(l_sh), rel=1e-9)
    np.testing.assert_allclose(np.asarray(s_sh.prec_chol),
                               np.asarray(state.prec_chol), rtol=1e-9)
    np.testing.assert_allclose(np.asarray(s_sh.model.prior.mu),
                               np.asarray(state.model.prior.mu), rtol=1e-9)


def test_ngd_factor_sharded_state_matches_replicated():
    """TP over the factor axis: factor_shardings partitions the NGD
    state's (L, M, M) prec/prec_chol (alongside mu and the Adam
    moments); the pinned output sharding survives the step; the training
    math is unchanged vs the unsharded step."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from gpzoo_tpu.parallel import (create_mesh, factor_shardings,
                                    put_sharded, replicate)

    l4, m4, n, b4 = 4, 16, 160, 32
    coords, counts, _ = gz.data.simulate_nsf_counts(N=n, D=8, L=l4)
    x = jnp.asarray(coords, jnp.float64)
    y = jnp.asarray(counts, jnp.float64)
    model = gz.SlideseqNSFConfig(D=8, N=n, L=l4, M=m4, batch_size=b4).build(
        jax.random.PRNGKey(3), x)
    proj = precompute_nsf_projection(model, x)
    state, part_opt = ngd_create(model, optax.adam(1e-3),
                                 jax.random.PRNGKey(1))
    kw = dict(num_points=n, batch_size=b4, nat_lr=0.05, ramp_steps=10,
              static_kwargs={"E": 1})
    step_ref = make_ngd_train_step(part_opt, **kw)

    mesh = create_mesh({"data": 4, "factor": 2})
    shardings = factor_shardings(mesh, state, num_factors=l4)
    fspec = NamedSharding(mesh, P("factor", None, None))
    assert shardings.prec == fspec and shardings.prec_chol == fspec
    s_sh = put_sharded(state, shardings)
    step_sh = make_ngd_train_step(part_opt, mesh=mesh,
                                  state_shardings=shardings, **kw)
    proj_sh, y_sh = replicate(mesh, (proj, y))
    for _ in range(3):
        state, l_ref = step_ref(state, proj, y)
        s_sh, l_sh = step_sh(s_sh, proj_sh, y_sh)
        assert float(l_ref) == pytest.approx(float(l_sh), rel=1e-9)
    assert s_sh.prec.sharding.spec == fspec.spec
    assert s_sh.prec_chol.sharding.spec == fspec.spec
    np.testing.assert_allclose(np.asarray(s_sh.prec_chol),
                               np.asarray(state.prec_chol), rtol=1e-9)
    np.testing.assert_allclose(np.asarray(s_sh.model.prior.mu),
                               np.asarray(state.model.prior.mu), rtol=1e-9)


def test_ngd_rejects_unsupported_heads():
    """Hybrid (sf/cf) heads and mean-field priors must be rejected with
    a clear error — the (m, S) ELBO has no mean-field term, so silently
    accepting them would train a wrong objective."""
    key = jax.random.PRNGKey(0)
    hybrid = gz.HybridNSFConfig(D=8, N=200, L=2, T=2, M_grid=4).build(key)
    with pytest.raises(ValueError, match="Hybrid"):
        ngd_create(hybrid, optax.adam(1e-3), key)
    pnmf = gz.PNMFConfig(D=8, N=200, L=2).build(key)
    with pytest.raises(ValueError):
        ngd_create(pnmf, optax.adam(1e-3), key)


def test_ngd_nb_head(nsf_setup):
    """NBNSF through NGD: the (m, S) ELBO dispatches the NB likelihood
    (float64-pinned against the production fast loss at S = Lu Luᵀ), the
    dispersion leaf trains under the Adam partition, and a short run
    stays finite."""
    _, x, y, key = nsf_setup
    model = gz.SlideseqNSFConfig(
        D=D, N=N, L=L, M=M, batch_size=B, likelihood="nb"
    ).build(jax.random.PRNGKey(3), x)
    lu_raw = 0.2 * jax.random.normal(jax.random.PRNGKey(8), (L, M, M))
    model = model.replace(prior=model.prior.replace(Lu_raw=lu_raw))
    proj = precompute_nsf_projection(model, x)

    idx = jax.random.choice(jax.random.PRNGKey(5), N, (B,), replace=False)
    ref = nsf_negative_elbo_precomputed(model, proj, y, idx, key, E=2)
    lu = lower_cholesky(model.prior.Lu_raw)
    s = jnp.einsum("lmk,lnk->lmn", lu, lu)
    val = _ngd_negative_elbo_nologdet(model, s, proj, y, idx, key, E=2)
    val = val - jnp.sum(tril_logdet(lu))
    assert float(val) == pytest.approx(float(ref), rel=1e-9)

    state, part_opt = ngd_create(model, optax.adam(1e-2),
                                 jax.random.PRNGKey(1))
    step = make_ngd_train_step(part_opt, num_points=N, batch_size=B,
                               nat_lr=0.05, ramp_steps=10,
                               static_kwargs={"E": 1})
    r0 = np.asarray(state.model.r_raw)
    losses = []
    for _ in range(20):
        state, l = step(state, proj, y)
        losses.append(float(l))
    assert np.isfinite(losses).all()
    assert np.mean(losses[-5:]) < np.mean(losses[:5])
    # the NB dispersion leaf is in the Adam partition, not frozen
    assert not np.array_equal(np.asarray(state.model.r_raw), r0)


def test_ngd_rate_overflow_guard_rejects_factors(nsf_setup):
    """The max_f trust guard: with a cap below the init mean function's
    magnitude, every factor's natural update is rejected (mu, prec,
    prec_chol unchanged) while the Adam head still trains and the loss
    stays finite; with the default cap the same step moves mu. This is
    the guard that prevents the measured deadlock mode (one accepted
    update → exp-overflowed F → every later loss non-finite)."""
    model, x, y, key = nsf_setup
    proj = precompute_nsf_projection(model, x)
    # ramped rho: the first step must be PD-acceptable so the two arms
    # differ ONLY in the F-cap (full rho=0.05 is PD-rejected on this toy)
    kw = dict(num_points=N, batch_size=B, nat_lr=0.05, ramp_steps=10,
              static_kwargs={"E": 1})
    state, part_opt = ngd_create(model, optax.adam(1e-2),
                                 jax.random.PRNGKey(1))
    step_tiny = make_ngd_train_step(part_opt, max_f=1e-9, **kw)
    s2, loss = step_tiny(state, proj, y)
    assert np.isfinite(float(loss))
    np.testing.assert_array_equal(np.asarray(s2.model.prior.mu),
                                  np.asarray(state.model.prior.mu))
    np.testing.assert_array_equal(np.asarray(s2.prec),
                                  np.asarray(state.prec))
    np.testing.assert_array_equal(np.asarray(s2.prec_chol),
                                  np.asarray(state.prec_chol))
    assert not np.array_equal(np.asarray(s2.model.W_raw),
                              np.asarray(state.model.W_raw))

    step_def = make_ngd_train_step(part_opt, **kw)
    s3, _ = step_def(state, proj, y)
    assert not np.array_equal(np.asarray(s3.model.prior.mu),
                              np.asarray(state.model.prior.mu))


def test_ngd_checkpoint_roundtrip_deterministic(tmp_path, nsf_setup):
    """Save/restore an NGDTrainState mid-run: the next step's loss is
    bit-identical. The checkpoint machinery is pytree-generic, but this
    pins the deterministic-resume contract for the NGD-specific leaves
    (prec, prec_chol) alongside the partitioned Adam state."""
    from gpzoo_tpu.train.checkpoint import (restore_checkpoint,
                                            save_checkpoint)

    model, x, y, key = nsf_setup
    proj = precompute_nsf_projection(model, x)
    state, part_opt = ngd_create(model, optax.adam(1e-3),
                                 jax.random.PRNGKey(1))
    step = make_ngd_train_step(part_opt, num_points=N, batch_size=B,
                               nat_lr=0.05, ramp_steps=10,
                               static_kwargs={"E": 1})
    for _ in range(3):
        state, _ = step(state, proj, y)
    path = save_checkpoint(str(tmp_path / "ngd.msgpack"), state)
    template, _ = ngd_create(model, optax.adam(1e-3), jax.random.PRNGKey(1))
    restored = restore_checkpoint(path, template)
    assert int(restored.step) == 3
    np.testing.assert_array_equal(np.asarray(restored.prec_chol),
                                  np.asarray(state.prec_chol))
    _, la = step(state, proj, y)
    _, lb = step(restored, proj, y)
    assert float(la) == float(lb)


def test_ngd_to_model_roundtrip(nsf_setup):
    model, x, y, key = nsf_setup
    state, part_opt = ngd_create(model, optax.adam(1e-3),
                                 jax.random.PRNGKey(1))
    proj = precompute_nsf_projection(model, x)
    step = make_ngd_train_step(part_opt, num_points=N, batch_size=B,
                               nat_lr=0.05, ramp_steps=10,
                               static_kwargs={"E": 1})
    for _ in range(5):
        state, l = step(state, proj, y)
    out = ngd_to_model(state)
    lu = lower_cholesky(out.prior.Lu_raw)
    s = jnp.einsum("lmk,lnk->lmn", lu, lu)
    # S written back must invert the carried precision
    p = state.prec
    ident = jnp.einsum("lmk,lkn->lmn", s, p)
    np.testing.assert_allclose(
        np.asarray(ident),
        np.broadcast_to(np.eye(M), (L, M, M)),
        atol=1e-7)
    # and the step's loss must equal the Adam-path loss of the
    # written-back model (same objective, same draw)
    idx = jax.random.choice(jax.random.PRNGKey(5), N, (B,), replace=False)
    ref = nsf_negative_elbo_precomputed(out, proj, y, idx, key, E=2)
    lu_l = lower_cholesky(out.prior.Lu_raw)
    val = _ngd_negative_elbo_nologdet(out, s, proj, y, idx, key, E=2)
    val = val - jnp.sum(tril_logdet(lu_l))
    assert float(val) == pytest.approx(float(ref), rel=1e-8)
