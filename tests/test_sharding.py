"""Multi-device SPMD tests on the virtual 8-CPU mesh: the sharded train
step must match the single-device step numerically, and posteriors must be
shardable over the spot axis."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

import gpzoo_tpu as gz
from gpzoo_tpu.parallel import (
    data_parallel_mesh,
    create_mesh,
    hybrid_mesh,
    make_sharded_batched_train_step,
    replicate,
    shard_columns,
    shard_factor_params,
)
from gpzoo_tpu.train import (
    TrainState,
    make_batched_train_step,
    negative_elbo_batched,
)


@pytest.fixture(scope="module")
def mesh():
    assert len(jax.devices()) == 8, "conftest must provide 8 CPU devices"
    return data_parallel_mesh()


@pytest.fixture(scope="module")
def setup():
    coords, counts, _ = gz.data.simulate_nsf_counts(N=512, D=10, L=2)
    X, Y = jnp.asarray(coords), jnp.asarray(counts)
    key = jax.random.PRNGKey(7)
    model = gz.NSFConfig(D=10, N=512, L=2, M=16).build(key, X=X)
    return X, Y, key, model


def test_create_mesh_shapes():
    m = create_mesh({"data": 4, "factor": 2})
    assert m.shape == {"data": 4, "factor": 2}
    m2 = create_mesh({"data": -1})
    assert m2.shape == {"data": 8}
    with pytest.raises(ValueError):
        create_mesh({"data": 3})


def test_sharded_step_matches_unsharded(mesh, setup):
    X, Y, key, model = setup
    opt = optax.adam(1e-3)

    step_ref = make_batched_train_step(
        negative_elbo_batched, opt, num_points=512, batch_size=64,
        static_kwargs={"E": 1},
    )
    step_sh = make_sharded_batched_train_step(
        negative_elbo_batched, opt, num_points=512, batch_size=64,
        mesh=mesh, static_kwargs={"E": 1},
    )

    s_ref = TrainState.create(model, opt, key)
    s_sh = replicate(mesh, TrainState.create(model, opt, key))
    X_sh, Y_sh = replicate(mesh, X), shard_columns(mesh, Y)

    for _ in range(3):
        s_ref, l_ref = step_ref(s_ref, X, Y)
        s_sh, l_sh = step_sh(s_sh, X_sh, Y_sh)
        # identical PRNG stream → identical minibatch indices → same math
        assert float(l_ref) == pytest.approx(float(l_sh), rel=1e-9)

    np.testing.assert_allclose(
        np.asarray(s_sh.model.W_raw), np.asarray(s_ref.model.W_raw),
        rtol=1e-9,
    )


def test_sharded_full_posterior(mesh, setup):
    """Full-N posterior extraction with spots sharded over the mesh —
    the TPU answer to the reference's CPU fallback for the 45k-spot
    forward (Slideseq notebook cells 32-33)."""
    X, Y, key, model = setup
    x_sharded = jax.device_put(X, NamedSharding(mesh, P("data", None)))
    gp = replicate(mesh, model.prior)

    qf_mean = jax.jit(lambda g, x: g(x)[0].mean)(gp, x_sharded)
    qf_mean_ref = jax.jit(lambda g, x: g(x)[0].mean)(model.prior, X)
    np.testing.assert_allclose(np.asarray(qf_mean),
                               np.asarray(qf_mean_ref), rtol=1e-8)


def test_factor_axis_sharding(setup):
    """L-axis (tensor-parallel) sharding of the batched Choleskys: qF must
    match the replicated computation."""
    X, Y, key, model = setup
    mesh = create_mesh({"factor": 2, "data": 4})
    gp = model.prior
    # shard per-factor params over 'factor'
    gp_sh = gp.replace(
        kernel=gp.kernel.replace(
            sigma=jax.device_put(
                gp.kernel.sigma, NamedSharding(mesh, P("factor", None, None))
            ),
            lengthscale=jax.device_put(
                gp.kernel.lengthscale,
                NamedSharding(mesh, P("factor", None, None)),
            ),
        )
    )
    qf = jax.jit(lambda g, x: g(x)[0].mean)(gp_sh, X)
    qf_ref = jax.jit(lambda g, x: g(x)[0].mean)(gp, X)
    np.testing.assert_allclose(np.asarray(qf), np.asarray(qf_ref),
                               rtol=1e-8)


def test_hybrid_mesh_single_host_grouping():
    """DCN-aware mesh construction from an explicit device list: leading
    axes span 'hosts' (contiguous per-process blocks), trailing axes the
    local chips."""
    m = hybrid_mesh({"hosts": 2}, {"data": 4})
    assert m.shape == {"hosts": 2, "data": 4}
    devs = np.asarray(m.devices)
    # each 'hosts' row holds 4 consecutive devices (one fake host's chips)
    assert [d.id for d in devs[0]] == [0, 1, 2, 3]
    assert [d.id for d in devs[1]] == [4, 5, 6, 7]
    with pytest.raises(ValueError):
        hybrid_mesh({"data": 2}, {"data": 4})


def _per_factor_model(model, L, M, key):
    from gpzoo_tpu.bijectors import lower_cholesky_inverse

    return model.replace(prior=model.prior.replace(
        mu=0.1 * jax.random.normal(key, (L, M)),
        Lu_raw=lower_cholesky_inverse(
            jnp.broadcast_to(jnp.eye(M), (L, M, M))
        ),
    ))


def test_factor_tp_heavy_leaves_match_replicated(setup):
    """REAL tensor parallelism: the (L, M) mu, (L, M, M) Lu_raw and their
    Adam moments sharded over 'factor' must train identically to the
    fully-replicated step (SURVEY.md §2.7 TP contract)."""
    from gpzoo_tpu.train.fast import nsf_negative_elbo_batched

    X, Y, key, model = setup
    L, M = 2, 16
    model = _per_factor_model(model, L, M, jax.random.PRNGKey(3))
    mesh = create_mesh({"data": 4, "factor": 2})
    opt = optax.adam(1e-2)
    kwargs = {"E": 1, "microbatch": 32, "factored": True}

    step_ref = make_batched_train_step(
        nsf_negative_elbo_batched, opt, num_points=512, batch_size=64,
        static_kwargs=kwargs,
    )
    s_ref = TrainState.create(model, opt, key)

    s_sh, shardings = shard_factor_params(
        mesh, TrainState.create(model, opt, key), num_factors=L
    )
    # the heavy leaves and their Adam moments are actually partitioned
    lu = s_sh.model.prior.Lu_raw
    assert lu.sharding.is_equivalent_to(
        NamedSharding(mesh, P("factor", None, None)), lu.ndim
    )
    adam_mu = s_sh.opt_state[0].mu.prior.Lu_raw
    assert adam_mu.sharding.is_equivalent_to(
        NamedSharding(mesh, P("factor", None, None)), adam_mu.ndim
    )
    assert (
        max(s.data.nbytes for s in lu.addressable_shards) * 2 <= lu.nbytes
    )

    step_sh = make_sharded_batched_train_step(
        nsf_negative_elbo_batched, opt, num_points=512, batch_size=64,
        mesh=mesh, static_kwargs=kwargs, state_shardings=shardings,
    )
    X_sh, Y_sh = replicate(mesh, X), shard_columns(mesh, Y)

    for _ in range(3):
        s_ref, l_ref = step_ref(s_ref, X, Y)
        s_sh, l_sh = step_sh(s_sh, X_sh, Y_sh)
        assert float(l_ref) == pytest.approx(float(l_sh), rel=1e-9)

    # layout survives the update
    lu = s_sh.model.prior.Lu_raw
    assert lu.sharding.is_equivalent_to(
        NamedSharding(mesh, P("factor", None, None)), lu.ndim
    )
    np.testing.assert_allclose(
        np.asarray(s_sh.model.prior.Lu_raw),
        np.asarray(s_ref.model.prior.Lu_raw), rtol=1e-9,
    )
    np.testing.assert_allclose(
        np.asarray(s_sh.model.prior.mu),
        np.asarray(s_ref.model.prior.mu), rtol=1e-9,
    )


def test_sharded_fast_path_matches(mesh, setup):
    """The production fast loss must shard like the generic one."""
    from gpzoo_tpu.train.fast import nsf_negative_elbo_batched

    X, Y, key, model = setup
    opt = optax.adam(1e-3)
    kwargs = {"E": 1, "microbatch": 32, "factored": True,
              "shared_kernel": True}
    step_ref = make_batched_train_step(
        nsf_negative_elbo_batched, opt, num_points=512, batch_size=64,
        static_kwargs=kwargs,
    )
    step_sh = make_sharded_batched_train_step(
        nsf_negative_elbo_batched, opt, num_points=512, batch_size=64,
        mesh=mesh, static_kwargs=kwargs,
    )
    s_ref = TrainState.create(model, opt, key)
    s_sh = replicate(mesh, TrainState.create(model, opt, key))
    X_sh, Y_sh = replicate(mesh, X), replicate(mesh, Y)
    for _ in range(2):
        s_ref, l_ref = step_ref(s_ref, X, Y)
        s_sh, l_sh = step_sh(s_sh, X_sh, Y_sh)
        assert float(l_ref) == pytest.approx(float(l_sh), rel=1e-9)
