"""Negative-binomial likelihood (beyond-reference capability).

The reference is Poisson-only; :class:`gpzoo_tpu.dists.NegativeBinomial`
and the :class:`gpzoo_tpu.models.NBNSF` head add the overdispersed count
model the nsf-paper pipeline (which the reference's data prep descends
from) offers. Contract under test:

* ``log_prob`` matches ``torch.distributions.NegativeBinomial`` exactly
  (float64) over a dispersion × mean × count grid, INCLUDING the
  (x=0, μ=0) limit torch NaNs on;
* ``unnormalized_log_prob`` drops exactly the data-only ``−lgamma(x+1)``
  term (every dispersion-gradient-carrying term stays);
* Poisson is recovered in the r → ∞ limit;
* sampling matches the analytic mean/variance;
* the NBNSF head rides BOTH fast paths (blockwise and precomputed) and
  the VNNGP fast path with generic-ELBO-equal values and gradients —
  including a nonzero dispersion gradient;
* a short fit on overdispersed synthetic counts moves the dispersion
  toward the truth while the Poisson head cannot (the capability's
  point).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import gpzoo_tpu as gz
from gpzoo_tpu import dists
from gpzoo_tpu.bijectors import init_softplus, softplus
from gpzoo_tpu.train import negative_elbo_batched
from gpzoo_tpu.train.fast import (
    nsf_negative_elbo_batched,
    nsf_negative_elbo_precomputed,
    precompute_nsf_projection,
)


def _nb(r, mu):
    return dists.NegativeBinomial(jnp.asarray(r, jnp.float64),
                                  jnp.asarray(mu, jnp.float64))


def test_log_prob_matches_torch():
    torch = pytest.importorskip("torch")
    rs = np.array([0.3, 1.0, 4.5, 60.0])
    mus = np.array([0.05, 1.0, 8.0, 120.0])
    xs = np.array([0.0, 1.0, 7.0, 40.0])
    r, mu, x = np.meshgrid(rs, mus, xs, indexing="ij")
    ours = np.asarray(_nb(r, mu).log_prob(jnp.asarray(x, jnp.float64)))
    tdist = torch.distributions.NegativeBinomial(
        total_count=torch.tensor(r),
        logits=torch.log(torch.tensor(mu)) - torch.log(torch.tensor(r)),
    )
    theirs = tdist.log_prob(torch.tensor(x)).numpy()
    np.testing.assert_allclose(ours, theirs, rtol=1e-12, atol=1e-12)


def test_log_prob_zero_mean_zero_count_limit():
    # P(x=0 | μ=0) = 1 → log_prob 0; torch's logits form NaNs here.
    lp = _nb([2.0, 50.0], [0.0, 0.0]).log_prob(jnp.zeros(2, jnp.float64))
    np.testing.assert_allclose(np.asarray(lp), 0.0, atol=1e-12)
    # ... and stays -inf-free for positive counts at μ=0 is NOT required
    # (prob 0 → −inf is the correct limit); just assert no NaN:
    lp_pos = _nb([2.0], [0.0]).log_prob(jnp.asarray([3.0], jnp.float64))
    assert not np.isnan(np.asarray(lp_pos)).any()


def test_unnormalized_drops_only_lgamma_term():
    r = jnp.asarray([0.7, 5.0, 33.0], jnp.float64)
    mu = jnp.asarray([0.4, 6.0, 2.5], jnp.float64)
    x = jnp.asarray([0.0, 4.0, 11.0], jnp.float64)
    d = _nb(r, mu)
    gap = np.asarray(d.log_prob(x) - d.unnormalized_log_prob(x))
    np.testing.assert_allclose(
        gap, -np.asarray(jax.lax.lgamma(x + 1.0)), rtol=1e-12, atol=1e-12
    )


def test_poisson_limit():
    mu = jnp.asarray([0.3, 2.0, 9.0], jnp.float64)
    x = jnp.asarray([0.0, 2.0, 14.0], jnp.float64)
    nb = _nb(jnp.full(3, 1e8), mu).log_prob(x)
    po = dists.Poisson(mu).log_prob(x)
    np.testing.assert_allclose(np.asarray(nb), np.asarray(po),
                               rtol=1e-6, atol=1e-6)


def test_variance_and_sample_moments():
    r, mu = 3.0, 5.0
    d = _nb(r, mu)
    assert float(d.variance()) == pytest.approx(mu + mu * mu / r)
    draws = d.sample(jax.random.PRNGKey(0), (200_000,))
    draws = np.asarray(draws, np.float64)
    assert draws.mean() == pytest.approx(mu, rel=0.02)
    assert draws.var() == pytest.approx(mu + mu * mu / r, rel=0.05)
    assert (draws >= 0).all() and (draws == np.round(draws)).all()


# ---------------------------------------------------------------------------
# NBNSF head: generic ELBO ≡ fast paths
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def nb_setup():
    coords, counts, _ = gz.data.simulate_nsf_counts(N=300, D=12, L=3)
    x = jnp.asarray(coords, jnp.float64)
    y = jnp.asarray(counts, jnp.float64)
    key = jax.random.PRNGKey(3)
    base = gz.NSFConfig(D=12, N=300, L=3, M=20).build(key, X=x)
    model = gz.models.NBNSF(
        prior=base.prior, W_raw=base.W_raw, V_raw=base.V_raw,
        r_raw=jnp.asarray(init_softplus(np.full(12, 4.0)), jnp.float64),
    )
    idx = jax.random.choice(jax.random.PRNGKey(9), 300, (64,),
                            replace=False)
    return model, x, y, idx, key


def test_nbnsf_create_dtypes(key):
    kernel = gz.kernels.NSFRBF.create(L=3, lengthscale=1.0)
    gp = gz.gps.SVGP.create(key, kernel, dim=2, M=16, jitter=1e-1)
    model = gz.models.NBNSF.create(key, gp, D=10, N=50, L=3,
                                   total_count=7.0)
    assert model.r_raw.shape == (10,)
    assert not jnp.asarray(model.r_raw).weak_type
    np.testing.assert_allclose(np.asarray(softplus(model.r_raw)), 7.0,
                               rtol=1e-6)


def test_nbnsf_fast_matches_generic(nb_setup):
    model, x, y, idx, key = nb_setup
    ref = negative_elbo_batched(model, x, y, idx, key, E=2)
    for kw in ({"microbatch": 32}, {"microbatch": 16},
               {"microbatch": 16, "factored": True}):
        fast = nsf_negative_elbo_batched(model, x, y, idx, key, E=2, **kw)
        assert float(fast) == pytest.approx(float(ref), rel=1e-8), kw
    # normalized convention too (the lgamma(x+r) normalizer flows)
    ref_n = negative_elbo_batched(model, x, y, idx, key, E=2,
                                  unnormalized=False)
    fast_n = nsf_negative_elbo_batched(model, x, y, idx, key, E=2,
                                       microbatch=32, unnormalized=False)
    assert float(fast_n) == pytest.approx(float(ref_n), rel=1e-8)
    assert float(ref_n) != pytest.approx(float(ref), rel=1e-3)


def test_nbnsf_fast_gradients_match_generic(nb_setup):
    model, x, y, idx, key = nb_setup
    g_ref = jax.grad(
        lambda m: negative_elbo_batched(m, x, y, idx, key, E=2)
    )(model)
    g_fast = jax.grad(
        lambda m: nsf_negative_elbo_batched(m, x, y, idx, key, E=2,
                                            microbatch=16)
    )(model)
    # the dispersion actually trains
    assert float(jnp.max(jnp.abs(g_ref.r_raw))) > 0.0
    for a, b in zip(jax.tree_util.tree_leaves(g_ref),
                    jax.tree_util.tree_leaves(g_fast)):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), rtol=1e-6,
            atol=1e-9 * max(float(np.max(np.abs(np.asarray(a)))), 1.0),
        )


def test_nbnsf_precomputed_matches_generic(nb_setup):
    model, x, y, idx, key = nb_setup
    ref = negative_elbo_batched(model, x, y, idx, key, E=2)
    proj = precompute_nsf_projection(model, x)
    fast = nsf_negative_elbo_precomputed(model, proj, y, idx, key, E=2)
    assert float(fast) == pytest.approx(float(ref), rel=1e-9)
    g_ref = jax.grad(
        lambda m: negative_elbo_batched(m, x, y, idx, key, E=2)
    )(model)
    g_pre = jax.grad(
        lambda m: nsf_negative_elbo_precomputed(m, proj, y, idx, key, E=2)
    )(model)
    for name in ("mu", "Lu_raw"):
        np.testing.assert_allclose(
            np.asarray(getattr(g_pre.prior, name)),
            np.asarray(getattr(g_ref.prior, name)),
            rtol=1e-7, atol=1e-9, err_msg=name)
    for name in ("W_raw", "V_raw", "r_raw"):
        np.testing.assert_allclose(
            np.asarray(getattr(g_pre, name)),
            np.asarray(getattr(g_ref, name)),
            rtol=1e-7, atol=1e-9, err_msg=name)


def test_nbnsf_lowrank_precomputed_matches_generic(key, rng):
    """The two beyond-reference capabilities COMPOSE: an NB head over a
    low-rank-plus-diagonal q(u) (``SlideseqNSFConfig(rank=R,
    likelihood='nb')``) rides the precomputed fast path with
    generic-ELBO-equal value and gradients on every trainable leaf —
    the NB dispersion (r_raw) AND the low-rank variational parts
    (V, d_raw) at once."""
    N, D, L, M, R, B = 220, 12, 3, 24, 4, 64
    coords = jnp.asarray(rng.uniform(-2, 2, (N, 2)))
    counts = jnp.asarray(rng.poisson(3.0, (D, N)).astype(np.float64))
    model = gz.SlideseqNSFConfig(D=D, N=N, L=L, M=M, rank=R,
                                 likelihood="nb").build(key, coords)
    assert type(model).__name__ == "NBNSF"
    assert type(model.prior).__name__ == "LowRankWSVGP"
    idx = jax.random.choice(jax.random.PRNGKey(2), N, (B,), replace=False)
    kk = jax.random.PRNGKey(11)
    proj = precompute_nsf_projection(model, coords)
    gen_val, g_ref = jax.value_and_grad(
        lambda m: negative_elbo_batched(m, coords, counts, idx, kk, E=2)
    )(model)
    fast_val, g_pre = jax.value_and_grad(
        lambda m: nsf_negative_elbo_precomputed(m, proj, counts, idx, kk,
                                                E=2)
    )(model)
    assert float(fast_val) == pytest.approx(float(gen_val), rel=1e-9)
    for name in ("W_raw", "V_raw", "r_raw"):
        np.testing.assert_allclose(np.asarray(getattr(g_pre, name)),
                                   np.asarray(getattr(g_ref, name)),
                                   rtol=1e-7, atol=1e-9, err_msg=name)
    for name in ("mu", "V", "d_raw"):
        np.testing.assert_allclose(
            np.asarray(getattr(g_pre.prior, name)),
            np.asarray(getattr(g_ref.prior, name)),
            rtol=1e-7, atol=1e-9, err_msg=name)


def test_nbnsf_vnngp_fast_matches_generic(key, rng):
    from gpzoo_tpu.train.fast import vnngp_nsf_negative_elbo_batched

    N, D, L, M, K = 250, 10, 3, 24, 4
    coords = rng.uniform(-2, 2, (N, 2))
    counts = rng.poisson(3.0, (D, N)).astype(np.float64)
    x, y = jnp.asarray(coords), jnp.asarray(counts)
    kernel = gz.kernels.NSFRBF.create(L=L, sigma=1.1, lengthscale=1.0)
    gp = gz.gps.VNNGP.create(key, kernel, dim=2, M=M, K=K, jitter=1e-1)
    gp = gp.replace(mu=jax.random.normal(key, (L, M)),
                    Lu_raw=0.3 * jax.random.normal(key, (L, M, M)))
    model = gz.models.NBNSF.create(key, gp, D=D, N=N, L=L, total_count=5.0)
    idx = jax.random.choice(jax.random.PRNGKey(6), N, (64,), replace=False)
    ref = negative_elbo_batched(model, x, y, idx, key, E=2)
    fast = vnngp_nsf_negative_elbo_batched(model, x, y, idx, key, E=2)
    assert float(fast) == pytest.approx(float(ref), rel=1e-9)


def test_nbnsf_recovers_overdispersion(key):
    """Simulate NB counts at known dispersion r*=2 and a moderate rate;
    after a short fit the per-gene dispersion estimate must move from its
    r=20 init clearly toward the truth (the likelihood is what drives it
    — a Poisson head has no such parameter)."""
    import optax

    from gpzoo_tpu.train import TrainState, make_batched_train_step

    rng = np.random.default_rng(0)
    N, D, L = 400, 8, 2
    coords = rng.uniform(-2, 2, (N, 2))
    true_rate = 8.0
    r_true = 2.0
    lam = rng.gamma(shape=r_true, scale=true_rate / r_true, size=(D, N))
    counts = rng.poisson(lam).astype(np.float64)
    x, y = jnp.asarray(coords), jnp.asarray(counts)
    base = gz.NSFConfig(D=D, N=N, L=L, M=16).build(key, X=x)
    model = gz.models.NBNSF(
        prior=base.prior, W_raw=base.W_raw, V_raw=base.V_raw,
        r_raw=jnp.asarray(init_softplus(np.full(D, 20.0)), jnp.float64),
    )
    opt = optax.adam(5e-2)
    state = TrainState.create(model, opt, jax.random.PRNGKey(1))
    step = make_batched_train_step(negative_elbo_batched, opt, N, 128,
                                   static_kwargs={"E": 3})
    losses = []
    for _ in range(600):
        state, loss = step(state, x, y)
        losses.append(float(loss))
    assert np.isfinite(losses).all()
    assert np.mean(losses[-20:]) < np.mean(losses[:20])
    r_hat = np.asarray(softplus(state.model.r_raw))
    # moved at least halfway toward the truth in log space from r=20
    # (log-space midpoint of 20 → 2 is √40 ≈ 6.3)
    assert np.median(r_hat) < 7.0, r_hat


def test_nbnsf_sharded_step_matches_unsharded(key):
    """DP-sharded NBNSF train step ≡ single-device: the NB likelihood
    (incl. the dispersion leaf and its Adam moments) is sharding-neutral
    like every other head."""
    import optax

    from gpzoo_tpu.parallel import (data_parallel_mesh,
                                    make_sharded_batched_train_step,
                                    replicate, shard_columns)
    from gpzoo_tpu.train import TrainState, make_batched_train_step

    n = 512  # divisible by the 8-way data axis (shard_columns)
    coords, counts, _ = gz.data.simulate_nb_counts(N=n, D=12, L=3,
                                                   total_count=2.0)
    x = jnp.asarray(coords, jnp.float64)
    y = jnp.asarray(counts, jnp.float64)
    model = gz.NSFConfig(D=12, N=n, L=3, M=20,
                         likelihood="nb").build(key, X=x)
    mesh = data_parallel_mesh()
    opt = optax.adam(1e-3)
    step_ref = make_batched_train_step(
        negative_elbo_batched, opt, num_points=n, batch_size=64,
        static_kwargs={"E": 1})
    step_sh = make_sharded_batched_train_step(
        negative_elbo_batched, opt, num_points=n, batch_size=64,
        mesh=mesh, static_kwargs={"E": 1})
    s_ref = TrainState.create(model, opt, key)
    s_sh = replicate(mesh, TrainState.create(model, opt, key))
    x_sh, y_sh = replicate(mesh, x), shard_columns(mesh, y)
    for _ in range(3):
        s_ref, l_ref = step_ref(s_ref, x, y)
        s_sh, l_sh = step_sh(s_sh, x_sh, y_sh)
        assert float(l_ref) == pytest.approx(float(l_sh), rel=1e-9)
    np.testing.assert_allclose(np.asarray(s_sh.model.r_raw),
                               np.asarray(s_ref.model.r_raw), rtol=1e-9)


def test_nbnsf_checkpoint_roundtrip_deterministic(tmp_path, nb_setup):
    """Save/restore an NBNSF TrainState mid-run: the next step's loss is
    bit-identical (the deterministic-resume contract covers the r_raw
    leaf and its Adam moments)."""
    import optax

    from gpzoo_tpu.train import TrainState, make_batched_train_step
    from gpzoo_tpu.train.checkpoint import (restore_checkpoint,
                                            save_checkpoint)

    model, x, y, idx, key = nb_setup
    opt = optax.adam(1e-3)
    n = x.shape[0]
    state = TrainState.create(model, opt, jax.random.PRNGKey(1))
    step = make_batched_train_step(
        negative_elbo_batched, opt, num_points=n, batch_size=64,
        static_kwargs={"E": 1})
    for _ in range(3):
        state, _ = step(state, x, y)
    path = save_checkpoint(str(tmp_path / "nb.msgpack"), state)
    restored = restore_checkpoint(
        path, TrainState.create(model, opt, jax.random.PRNGKey(1)))
    assert int(restored.step) == 3
    _, la = step(state, x, y)
    _, lb = step(restored, x, y)
    assert float(la) == float(lb)
