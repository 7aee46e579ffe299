"""Low-rank-plus-diagonal variational covariance (beyond-reference).

:class:`gpzoo_tpu.gps.LowRankWSVGP` restricts q(v) to N(μ, D + VVᵀ) so the
(L, M, M) Cholesky factor — the measured step floor of the full
parameterization at north-star scale (docs/PERFORMANCE.md) — never exists.
Everything here is verified in float64 against the DENSE construction: a
WSVGP whose Lu is chol(D + VVᵀ) defines the *same* variational
distribution, so posteriors, KLs and whole ELBOs must agree to float64
accumulation noise. The reference has no low-rank family; the closest
torch concept is ``torch.distributions.LowRankMultivariateNormal``, which
:class:`gpzoo_tpu.dists.LowRankMultivariateNormal` mirrors.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import gpzoo_tpu as gz
from gpzoo_tpu import dists
from gpzoo_tpu.bijectors import lower_cholesky_inverse, softplus
from gpzoo_tpu.ops.linalg import lowrank_whitened_kl, whitened_kl
from gpzoo_tpu.train import negative_elbo_batched
from gpzoo_tpu.train.fast import (
    nsf_negative_elbo_batched,
    nsf_negative_elbo_precomputed,
    precompute_nsf_projection,
)

M, R, L, N, D, B = 40, 5, 3, 200, 12, 64


def _lowrank_parts(rng, batch=()):
    v = jnp.asarray(rng.normal(size=batch + (M, R)))
    var = jnp.asarray(rng.uniform(0.5, 2.0, size=batch + (M,)))
    mu = jnp.asarray(rng.normal(size=batch + (M,)))
    return mu, v, var


def _dense_cov(v, var):
    return jnp.einsum("...mr,...kr->...mk", v, v) + jnp.vectorize(
        jnp.diag, signature="(m)->(m,m)"
    )(var)


def test_lowrank_logprob_matches_dense(rng):
    mu, v, var = _lowrank_parts(rng, batch=(L,))
    q = dists.LowRankMultivariateNormal(mu, v, var)
    dense = dists.MultivariateNormalTril(
        mu, jnp.linalg.cholesky(_dense_cov(v, var))
    )
    x = jnp.asarray(rng.normal(size=(7, L, M)))
    np.testing.assert_allclose(
        np.asarray(q.log_prob(x)), np.asarray(dense.log_prob(x)),
        rtol=1e-10,
    )


def test_lowrank_sample_moments(rng, key):
    """Reparameterized draws reproduce mean and covariance (MC, loose)."""
    mu, v, var = _lowrank_parts(rng)
    q = dists.LowRankMultivariateNormal(mu, v, var)
    draws = q.sample(key, (50_000,))
    cov = np.cov(np.asarray(draws).T)
    # marginal stds reach ~4 here → MC noise of the mean ~0.02, of cov
    # entries ~0.07; tolerances at ~4σ (the key is fixed, so this is a
    # deterministic regression check, not a flaky statistical one)
    np.testing.assert_allclose(np.asarray(draws).mean(0), np.asarray(mu),
                               atol=0.1)
    np.testing.assert_allclose(cov, np.asarray(_dense_cov(v, var)),
                               atol=0.3)


def test_lowrank_kl_matches_dense(rng):
    mu, v, var = _lowrank_parts(rng, batch=(L,))
    dense_l = jnp.linalg.cholesky(_dense_cov(v, var))
    np.testing.assert_allclose(
        np.asarray(lowrank_whitened_kl(mu, v, var)),
        np.asarray(whitened_kl(mu, dense_l)),
        rtol=1e-10,
    )


def _models(key, rng):
    """A LowRankWSVGP NSF and the DENSE-equivalent WSVGP NSF (same q)."""
    kernel = gz.kernels.NSFRBF.create(L=L, sigma=1.1, lengthscale=0.9)
    gp = gz.gps.LowRankWSVGP.create(key, kernel, dim=2, M=M, rank=R,
                                    jitter=1e-2)
    mu, v, var = _lowrank_parts(rng, batch=(L,))
    gp = gp.replace(mu=mu, V=v,
                    d_raw=jnp.log(jnp.expm1(jnp.sqrt(var))))
    model = gz.models.NSF.create(jax.random.fold_in(key, 3), gp, D=D,
                                 N=N, L=L)
    dense_gp = gz.gps.WSVGP(
        kernel=kernel, Z=gp.Z, mu=mu,
        Lu_raw=lower_cholesky_inverse(
            jnp.linalg.cholesky(_dense_cov(gp.V,
                                           jnp.square(softplus(gp.d_raw))))
        ),
        jitter=1e-2,
    )
    dense = model.replace(prior=dense_gp)
    return model, dense


def test_lowrank_gp_posterior_matches_dense(key, rng):
    model, dense = _models(key, rng)
    x = jnp.asarray(rng.uniform(-2, 2, (50, 2)))
    qf, qu, pu = model.prior(x)
    qf_d, _, _ = dense.prior(x)
    assert pu is None
    np.testing.assert_allclose(np.asarray(qf.mean), np.asarray(qf_d.mean),
                               rtol=1e-9)
    np.testing.assert_allclose(np.asarray(qf.scale), np.asarray(qf_d.scale),
                               rtol=1e-9)
    np.testing.assert_allclose(np.asarray(qu.variance()),
                               np.asarray(_dense_cov(qu.cov_factor,
                                                     qu.cov_diag)
                                          .diagonal(axis1=-2, axis2=-1)),
                               rtol=1e-12)


def test_lowrank_generic_elbo_matches_dense_equivalent(key, rng):
    """Same variational distribution ⇒ same ELBO: the low-rank model and
    its dense reconstruction agree through the whole generic loss (the
    qF marginals are identical, so the reparameterized draws are
    bit-identical under one key; only the KL takes a different formula)."""
    model, dense = _models(key, rng)
    coords = jnp.asarray(rng.uniform(-2, 2, (N, 2)))
    counts = jnp.asarray(rng.poisson(3.0, (D, N)).astype(np.float64))
    idx = jax.random.choice(jax.random.PRNGKey(2), N, (B,), replace=False)
    kk = jax.random.PRNGKey(11)
    lo = negative_elbo_batched(model, coords, counts, idx, kk, E=3)
    de = negative_elbo_batched(dense, coords, counts, idx, kk, E=3)
    assert float(lo) == pytest.approx(float(de), rel=1e-9)


def test_lowrank_precomputed_matches_generic(key, rng):
    """Value AND trainable-leaf gradients of the precomputed fast loss
    equal the generic minibatch ELBO on the low-rank model."""
    model, _ = _models(key, rng)
    coords = jnp.asarray(rng.uniform(-2, 2, (N, 2)))
    counts = jnp.asarray(rng.poisson(3.0, (D, N)).astype(np.float64))
    idx = jax.random.choice(jax.random.PRNGKey(2), N, (B,), replace=False)
    kk = jax.random.PRNGKey(11)
    proj = precompute_nsf_projection(model, coords)

    gen_val, gen_grad = jax.value_and_grad(
        lambda m: negative_elbo_batched(m, coords, counts, idx, kk, E=2)
    )(model)
    fast_val, fast_grad = jax.value_and_grad(
        lambda m: nsf_negative_elbo_precomputed(m, proj, counts, idx, kk,
                                                E=2)
    )(model)
    assert float(fast_val) == pytest.approx(float(gen_val), rel=1e-9)
    for name in ("W_raw", "V_raw"):
        np.testing.assert_allclose(np.asarray(getattr(fast_grad, name)),
                                   np.asarray(getattr(gen_grad, name)),
                                   rtol=1e-8, err_msg=name)
    for name in ("mu", "V", "d_raw"):
        np.testing.assert_allclose(
            np.asarray(getattr(fast_grad.prior, name)),
            np.asarray(getattr(gen_grad.prior, name)),
            rtol=1e-8, atol=1e-12, err_msg=name)


@pytest.mark.parametrize("shared_mu,rank,E", [
    (True, 1, 1),    # degenerate rank, shared (M,) params
    (True, 8, 2),
    (False, 1, 2),
    (False, 7, 1),   # non-power-of-two rank
])
def test_lowrank_precomputed_matrix(key, rng, shared_mu, rank, E):
    """Precomputed-vs-generic equivalence across the low-rank flag matrix:
    shared (M,)-shaped vs per-factor (L, M)-shaped variational params,
    degenerate and odd ranks, E draws."""
    kernel = gz.kernels.NSFRBF.create(L=L, sigma=1.1, lengthscale=0.9)
    gp = gz.gps.LowRankWSVGP.create(key, kernel, dim=2, M=M, rank=rank,
                                    jitter=1e-2)
    if shared_mu:
        gp = gp.replace(
            mu=jnp.asarray(rng.normal(size=(M,))),
            V=jnp.asarray(rng.normal(size=(M, rank))),
            d_raw=jnp.asarray(rng.normal(size=(M,))),
        )
    else:
        gp = gp.replace(
            mu=jnp.asarray(rng.normal(size=(L, M))),
            V=jnp.asarray(rng.normal(size=(L, M, rank))),
            d_raw=jnp.asarray(rng.normal(size=(L, M))),
        )
    model = gz.models.NSF.create(jax.random.fold_in(key, 3), gp, D=D,
                                 N=N, L=L)
    coords = jnp.asarray(rng.uniform(-2, 2, (N, 2)))
    counts = jnp.asarray(rng.poisson(3.0, (D, N)).astype(np.float64))
    idx = jax.random.choice(jax.random.PRNGKey(2), N, (B,), replace=False)
    kk = jax.random.PRNGKey(11)
    proj = precompute_nsf_projection(model, coords)
    gen = negative_elbo_batched(model, coords, counts, idx, kk, E=E)
    fast = nsf_negative_elbo_precomputed(model, proj, counts, idx, kk, E=E)
    assert float(fast) == pytest.approx(float(gen), rel=1e-9)


def test_lowrank_hybrid_precomputed_matches_generic(key, rng):
    """HybridNSF over a low-rank spatial half: the precomputed fast loss
    equals the generic hybrid ELBO (the mean-field half is orthogonal to
    the q(u) parameterization)."""
    from gpzoo_tpu.train.elbo import negative_elbo_hybrid_batched

    model, _ = _models(key, rng)
    prior2 = gz.gps.GaussianPrior.create(jax.random.fold_in(key, 9), N,
                                         L=2, scale_pf=0.3)
    hyb = gz.models.HybridNSF.create(jax.random.fold_in(key, 3),
                                     model.prior, prior2, D, N, L=L, T=2)
    coords = jnp.asarray(rng.uniform(-2, 2, (N, 2)))
    counts = jnp.asarray(rng.poisson(3.0, (D, N)).astype(np.float64))
    idx = jax.random.choice(jax.random.PRNGKey(2), N, (B,), replace=False)
    kk = jax.random.PRNGKey(11)
    proj = precompute_nsf_projection(hyb, coords)
    gen = negative_elbo_hybrid_batched(hyb, coords, counts, idx, kk, E=2)
    fast = nsf_negative_elbo_precomputed(hyb, proj, counts, idx, kk, E=2)
    assert float(fast) == pytest.approx(float(gen), rel=1e-9)


def test_lowrank_batched_fast_path_rejected(key, rng):
    model, _ = _models(key, rng)
    coords = jnp.asarray(rng.uniform(-2, 2, (N, 2)))
    counts = jnp.asarray(rng.poisson(3.0, (D, N)).astype(np.float64))
    idx = jnp.arange(B)
    with pytest.raises(NotImplementedError, match="LowRankWSVGP"):
        nsf_negative_elbo_batched(model, coords, counts, idx,
                                  jax.random.PRNGKey(0), E=1,
                                  microbatch=B, factored=True)


def _assert_no_weak_leaves(model, tag):
    for path, leaf in jax.tree_util.tree_flatten_with_path(model)[0]:
        if hasattr(leaf, "weak_type"):
            assert not leaf.weak_type, (
                f"{tag}: weak-typed leaf {jax.tree_util.keystr(path)}"
            )


def test_config_builds_have_no_weak_typed_leaves(key, rng):
    """Every built leaf must be strongly typed: a weak-typed parameter
    (e.g. broadcast_to / asarray of a python-float scalar) changes the
    jit signature after the first optimizer update — one silent
    recompile of every training program (observed as a hidden ~17 s
    second compile at toy scale over the TPU tunnel before the fix).
    Covers ALL public workload configs, not just the low-rank one."""
    coords = jnp.asarray(rng.uniform(-2, 2, (N, 2)))
    groups = jnp.asarray(rng.integers(0, 3, N))
    builds = {
        "SlideseqNSF(rank=0)": gz.SlideseqNSFConfig(
            D=D, N=N, L=L, M=M, rank=0, batch_size=B).build(key, coords),
        f"SlideseqNSF(rank={R})": gz.SlideseqNSFConfig(
            D=D, N=N, L=L, M=M, rank=R, batch_size=B).build(key, coords),
        "NSF": gz.NSFConfig(D=D, N=N, L=L, M=M).build(key, coords),
        "NSF(nb)": gz.NSFConfig(D=D, N=N, L=L, M=M,
                                likelihood="nb").build(key, coords),
        "SlideseqNSF(nb)": gz.SlideseqNSFConfig(
            D=D, N=N, L=L, M=M, batch_size=B,
            likelihood="nb").build(key, coords),
        "MGGPNSF": gz.MGGPNSFConfig(D=D, N=N, L=L, M_per_group=5,
                                    n_groups=3).build(key, coords, groups),
        "HybridNSF": gz.HybridNSFConfig(D=D, N=N, L=L, T=2,
                                        M_grid=4).build(key),
        "PNMF": gz.PNMFConfig(D=D, N=N, L=L).build(key),
        "VNNGP": gz.VNNGPConfig(D=D, N=N, L=L, M=M, K=4).build(
            key, X=coords),
        "SVGPRegression": gz.SVGPRegressionConfig(n=N, M=M).build(key),
        "MGGPRBF-direct": gz.kernels.MGGPRBF.create(
            sigma=1.0, lengthscale=2.0, group_diff_param=1.0, n_groups=3),
        "BatchedMGGPRBF-direct": gz.kernels.BatchedMGGPRBF.create(
            sigma=1.0, lengthscale=2.0, group_diff_param=1.0, n_groups=3),
    }
    for tag, model in builds.items():
        _assert_no_weak_leaves(model, tag)


def test_lowrank_checkpoint_roundtrip_deterministic(tmp_path, key, rng):
    """Save/restore a low-rank TrainState mid-run: the next step's loss is
    bit-identical (the deterministic-resume contract covers the new
    V/d_raw leaves and their Adam moments)."""
    import optax

    from gpzoo_tpu.train import TrainState, make_batched_train_step
    from gpzoo_tpu.train.checkpoint import (restore_checkpoint,
                                            save_checkpoint)

    coords = jnp.asarray(rng.uniform(-2, 2, (N, 2)))
    counts = jnp.asarray(rng.poisson(3.0, (D, N)).astype(np.float64))
    model = gz.SlideseqNSFConfig(D=D, N=N, L=L, M=M, rank=R,
                                 batch_size=B).build(key, coords)
    proj = precompute_nsf_projection(model, coords)
    opt = optax.adam(1e-3)
    state = TrainState.create(model, opt, jax.random.PRNGKey(1))
    step = make_batched_train_step(
        nsf_negative_elbo_precomputed, opt, num_points=N, batch_size=B,
        static_kwargs={"E": 1},
    )
    for _ in range(3):
        state, _ = step(state, proj, counts)
    path = save_checkpoint(str(tmp_path / "lr.msgpack"), state)
    restored = restore_checkpoint(
        path, TrainState.create(model, opt, jax.random.PRNGKey(1)))
    assert int(restored.step) == 3
    _, la = step(state, proj, counts)
    _, lb = step(restored, proj, counts)
    assert float(la) == float(lb)


def test_lowrank_factor_tp_matches_replicated(key, rng):
    """Tensor parallelism over the factor axis: the (L, M, R) V, (L, M)
    d_raw/mu and their Adam moments sharded over 'factor' must train
    identically to the fully-replicated precomputed step."""
    import optax
    from jax.sharding import NamedSharding, PartitionSpec as P

    from gpzoo_tpu.parallel import (create_mesh,
                                    make_sharded_batched_train_step,
                                    replicate, shard_columns,
                                    shard_factor_params)
    from gpzoo_tpu.train import TrainState, make_batched_train_step

    L2 = 2  # divisible by the 2-way factor axis
    coords = jnp.asarray(rng.uniform(-2, 2, (256, 2)))
    counts = jnp.asarray(rng.poisson(3.0, (D, 256)).astype(np.float64))
    cfg = gz.SlideseqNSFConfig(D=D, N=256, L=L2, M=M, rank=R,
                               batch_size=64)
    model = cfg.build(key, coords)
    proj = precompute_nsf_projection(model, coords)
    mesh = create_mesh({"data": 4, "factor": 2})
    opt = optax.adam(1e-2)

    step_ref = make_batched_train_step(
        nsf_negative_elbo_precomputed, opt, num_points=256, batch_size=64,
        static_kwargs={"E": 1},
    )
    s_ref = TrainState.create(model, opt, jax.random.PRNGKey(1))

    s_sh, shardings = shard_factor_params(
        mesh, TrainState.create(model, opt, jax.random.PRNGKey(1)),
        num_factors=L2,
    )
    v = s_sh.model.prior.V
    assert v.sharding.is_equivalent_to(
        NamedSharding(mesh, P("factor", None, None)), v.ndim
    )
    adam_v = s_sh.opt_state[0].mu.prior.V
    assert adam_v.sharding.is_equivalent_to(
        NamedSharding(mesh, P("factor", None, None)), adam_v.ndim
    )
    d = s_sh.model.prior.d_raw
    assert d.sharding.is_equivalent_to(
        NamedSharding(mesh, P("factor", None)), d.ndim
    )

    step_sh = make_sharded_batched_train_step(
        nsf_negative_elbo_precomputed, opt, num_points=256, batch_size=64,
        mesh=mesh, static_kwargs={"E": 1}, state_shardings=shardings,
    )
    proj_sh = replicate(mesh, proj)
    y_sh = shard_columns(mesh, counts)
    for _ in range(3):
        s_ref, l_ref = step_ref(s_ref, proj, counts)
        s_sh, l_sh = step_sh(s_sh, proj_sh, y_sh)
        assert float(l_ref) == pytest.approx(float(l_sh), rel=1e-9)
    np.testing.assert_allclose(np.asarray(s_sh.model.prior.V),
                               np.asarray(s_ref.model.prior.V), rtol=1e-9)


def test_lowrank_config_trains(key, rng):
    """SlideseqNSFConfig(rank>0) builds and trains through the precomputed
    fast path: loss descends and V leaves its near-zero init."""
    import optax

    from gpzoo_tpu.train import (TrainState, make_batched_train_step,
                                 train_batched)

    coords = jnp.asarray(rng.uniform(-2, 2, (N, 2)))
    counts = jnp.asarray(rng.poisson(3.0, (D, N)).astype(np.float64))
    cfg = gz.SlideseqNSFConfig(D=D, N=N, L=L, M=M, rank=R, batch_size=B)
    model = cfg.build(key, coords)
    assert isinstance(model.prior, gz.gps.LowRankWSVGP)
    proj = precompute_nsf_projection(model, coords)
    opt = optax.adam(1e-2)
    state = TrainState.create(model, opt, jax.random.PRNGKey(1))
    step = make_batched_train_step(
        nsf_negative_elbo_precomputed, opt, num_points=N, batch_size=B,
        static_kwargs={"E": cfg.E},
    )
    state, losses = train_batched(state, step, proj, counts, steps=120)
    assert float(losses[-1]) < float(losses[0])
    assert np.all(np.isfinite(np.asarray(losses)))
    v_norm0 = float(jnp.linalg.norm(model.prior.V))
    v_norm1 = float(jnp.linalg.norm(state.model.prior.V))
    assert v_norm1 > 2.0 * v_norm0  # V actually trains
