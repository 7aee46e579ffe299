"""Multi-device SPMD tests on the virtual 8-CPU mesh: the sharded train
step must match the single-device step numerically, and posteriors must be
shardable over the spot axis."""

import os

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


def test_sharded_mggp_fast_loss_matches(mesh):
    """The group-aware (MGGP) production fast loss under the mesh: group
    labels gathered by the sharded minibatch index must partition like
    every other batch-indexed tensor, and the loss must equal the
    unsharded step to 1e-9 (round-2 verdict item 5)."""
    from gpzoo_tpu.bijectors import lower_cholesky_inverse
    from gpzoo_tpu.train.fast import nsf_negative_elbo_batched

    N, D, L = 512, 10, 2
    rng = np.random.default_rng(5)
    coords = rng.uniform(-2, 2, size=(N, 2))
    counts = rng.poisson(2.0, size=(D, N)).astype(np.float64)
    groups = rng.integers(0, 3, size=N)
    cfg = gz.MGGPNSFConfig(D=D, N=N, L=L, M_per_group=6, n_groups=3,
                           batch_size=64)
    key = jax.random.PRNGKey(9)
    model = cfg.build(key, X=coords, groups=groups)
    M = cfg.M
    model = model.replace(gp=model.gp.replace(
        mu=0.1 * jax.random.normal(jax.random.PRNGKey(4), (L, M)),
        Lu_raw=lower_cholesky_inverse(
            jnp.broadcast_to(jnp.eye(M), (L, M, M))),
    ))
    X, Y = jnp.asarray(coords), jnp.asarray(counts)
    g = jnp.asarray(groups, jnp.int32)
    opt = optax.adam(1e-3)
    kwargs = {"E": 1, "microbatch": 32, "factored": True, "groups": g}

    step_ref = make_batched_train_step(
        nsf_negative_elbo_batched, opt, num_points=N, batch_size=64,
        static_kwargs=kwargs,
    )
    kwargs_sh = dict(kwargs, groups=replicate(mesh, g))
    step_sh = make_sharded_batched_train_step(
        nsf_negative_elbo_batched, opt, num_points=N, batch_size=64,
        mesh=mesh, static_kwargs=kwargs_sh,
    )
    s_ref = TrainState.create(model, opt, key)
    s_sh = replicate(mesh, TrainState.create(model, opt, key))
    X_sh, Y_sh = replicate(mesh, X), shard_columns(mesh, Y)
    for _ in range(3):
        s_ref, l_ref = step_ref(s_ref, X, Y)
        s_sh, l_sh = step_sh(s_sh, X_sh, Y_sh)
        assert float(l_ref) == pytest.approx(float(l_sh), rel=1e-9)
    np.testing.assert_allclose(
        np.asarray(s_sh.model.gp.kernel.lengthscale),
        np.asarray(s_ref.model.gp.kernel.lengthscale), rtol=1e-9,
    )


def test_sharded_vnngp_fast_loss_matches(mesh):
    """The VNNGP production fast loss (top-K neighbor conditioning)
    sharded over the mesh must match the unsharded step to 1e-9."""
    from gpzoo_tpu.train.fast import vnngp_nsf_negative_elbo_batched

    N, D, L = 512, 10, 3
    coords, counts, _ = gz.data.simulate_nsf_counts(N=N, D=D, L=L)
    X, Y = jnp.asarray(coords), jnp.asarray(counts)
    key = jax.random.PRNGKey(11)
    model = gz.VNNGPConfig(D=D, N=N, L=L, M=64, K=4).build(key, X=X)
    opt = optax.adam(1e-3)
    kwargs = {"E": 1, "shared_kernel": True}

    step_ref = make_batched_train_step(
        vnngp_nsf_negative_elbo_batched, opt, num_points=N, batch_size=64,
        static_kwargs=kwargs,
    )
    step_sh = make_sharded_batched_train_step(
        vnngp_nsf_negative_elbo_batched, opt, num_points=N, batch_size=64,
        mesh=mesh, static_kwargs=kwargs,
    )
    s_ref = TrainState.create(model, opt, key)
    s_sh = replicate(mesh, TrainState.create(model, opt, key))
    X_sh, Y_sh = replicate(mesh, X), shard_columns(mesh, Y)
    for _ in range(3):
        s_ref, l_ref = step_ref(s_ref, X, Y)
        s_sh, l_sh = step_sh(s_sh, X_sh, Y_sh)
        # 1e-8 (vs 1e-9 elsewhere): GSPMD partitions the M×M triangular
        # solve inside the VNNGP conditioning, whose reassociation error
        # carries the Gram's condition number (measured ~1.1e-9 rel on
        # the 8-device mesh — roundoff class, not a logic difference).
        assert float(l_ref) == pytest.approx(float(l_sh), rel=1e-8)


def test_checkpoint_roundtrip_factor_sharded(setup, tmp_path):
    """save → restore(shardings=) of a TP-sharded TrainState: values to
    1e-9 AND the restored layout actually partitioned on the mesh
    (round-2 verdict item 3 — the restored state must not come back
    replicated)."""
    from gpzoo_tpu.train.checkpoint import (make_restore_template,
                                            restore_checkpoint,
                                            save_checkpoint)
    from gpzoo_tpu.train.fast import nsf_negative_elbo_batched

    X, Y, key, model = setup
    L, M = 2, 16
    model = _per_factor_model(model, L, M, jax.random.PRNGKey(3))
    mesh = create_mesh({"data": 4, "factor": 2})
    opt = optax.adam(1e-2)
    step = make_sharded_batched_train_step(
        nsf_negative_elbo_batched, opt, num_points=512, batch_size=64,
        mesh=mesh, static_kwargs={"E": 1, "microbatch": 32,
                                  "factored": True},
    )
    state, shardings = shard_factor_params(
        mesh, TrainState.create(model, opt, key), num_factors=L
    )
    for _ in range(2):
        state, _ = step(state, X, Y)

    path = str(tmp_path / "ckpt.msgpack")
    save_checkpoint(path, state)

    template = make_restore_template(state)
    restored = restore_checkpoint(path, template, shardings=shardings)

    # restored layout is the sharded one, not replicated
    lu = restored.model.prior.Lu_raw
    assert lu.sharding.is_equivalent_to(
        NamedSharding(mesh, P("factor", None, None)), lu.ndim
    )
    assert max(s.data.nbytes for s in lu.addressable_shards) * 2 <= lu.nbytes
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-9
        ),
        jax.device_get(restored), jax.device_get(state),
    )

    # deterministic resume: the next step from the restored state is the
    # next step of the live run, bit-identically
    _, l_live = step(state, X, Y)
    _, l_restored = step(restored, X, Y)
    assert float(l_live) == float(l_restored)


def test_async_checkpoint_factor_sharded(setup, tmp_path):
    """AsyncCheckpointer on a TP-sharded TrainState (single process, 8
    virtual devices): the on-device snapshot must respect the factor
    sharding, the write must equal the synchronous save, and the
    restored state must land partitioned and resume bit-identically —
    while the live state's buffers are donated into further steps."""
    from gpzoo_tpu.train.checkpoint import (AsyncCheckpointer,
                                            make_restore_template,
                                            restore_checkpoint,
                                            save_checkpoint)
    from gpzoo_tpu.train.fast import nsf_negative_elbo_batched
    from gpzoo_tpu.train.loop import make_scan_runner

    X, Y, key, model = setup
    L, M = 2, 16
    model = _per_factor_model(model, L, M, jax.random.PRNGKey(3))
    # The runner below DONATES its state, whose non-factor leaves (Z,
    # W_raw, ...) and PRNG key come straight from the module-scope
    # fixture — donate copies, or every later test in this module finds
    # the fixture's buffers deleted (caught 2026-08-18: two downstream
    # tests failed with "Array has been deleted").
    model = gz.utils.copy_arrays(model)
    key = jnp.copy(key)
    mesh = create_mesh({"data": 4, "factor": 2})
    opt = optax.adam(1e-2)
    step = make_sharded_batched_train_step(
        nsf_negative_elbo_batched, opt, num_points=512, batch_size=64,
        mesh=mesh, static_kwargs={"E": 1, "microbatch": 32,
                                  "factored": True},
    )
    state, shardings = shard_factor_params(
        mesh, TrainState.create(model, opt, key), num_factors=L
    )
    runner = make_scan_runner(step, 2, donate=True)
    state, _ = runner(state, X, Y)

    p_sync = str(tmp_path / "sync.msgpack")
    p_async = str(tmp_path / "async.msgpack")
    save_checkpoint(p_sync, state)
    ck = AsyncCheckpointer()
    ck.save(p_async, state)
    state, l_live = runner(state, X, Y)  # donates while the write drains
    ck.wait()

    template = make_restore_template(state)
    r_sync = restore_checkpoint(p_sync, template, shardings=shardings)
    r_async = restore_checkpoint(p_async, template, shardings=shardings)
    for a, b in zip(jax.tree_util.tree_leaves(jax.device_get(r_sync)),
                    jax.tree_util.tree_leaves(jax.device_get(r_async))):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    lu = r_async.model.prior.Lu_raw
    assert lu.sharding.is_equivalent_to(
        NamedSharding(mesh, P("factor", None, None)), lu.ndim
    )
    _, l_resumed = runner(r_async, X, Y)
    np.testing.assert_array_equal(np.asarray(jax.device_get(l_live)),
                                  np.asarray(jax.device_get(l_resumed)))


def test_checkpoint_restore_without_shardings_matches(setup, tmp_path):
    """The plain (no-mesh) path still round-trips exactly."""
    from gpzoo_tpu.train.checkpoint import (make_restore_template,
                                            restore_checkpoint,
                                            save_checkpoint)

    X, Y, key, model = setup
    opt = optax.adam(1e-3)
    state = TrainState.create(model, opt, key)
    path = str(tmp_path / "ckpt.msgpack")
    save_checkpoint(path, state)
    template = make_restore_template(state)
    restored = restore_checkpoint(path, template)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(
            np.asarray(a), np.asarray(b)
        ),
        jax.device_get(restored), jax.device_get(state),
    )


@pytest.mark.slow
def test_two_process_distributed(tmp_path):
    """REAL ``jax.distributed`` execution (round-2 verdict item 2): two
    OS processes × 4 virtual CPU devices join a coordination service,
    build the DCN-aware hybrid mesh, run DP+TP-sharded train steps, and
    round-trip a multi-process checkpoint (per-process shard files).
    Their losses must match this process's single-device reference."""
    import json
    import socket
    import subprocess
    import sys as _sys

    import gpzoo_tpu as gz
    from gpzoo_tpu.train import make_batched_train_step
    from gpzoo_tpu.train.fast import nsf_negative_elbo_batched

    # --- single-process reference (identical seeds/config to the child) --
    L, M = 2, 16
    coords, counts, _ = gz.data.simulate_nsf_counts(N=512, D=10, L=L)
    X, Y = jnp.asarray(coords), jnp.asarray(counts)
    key = jax.random.PRNGKey(7)
    model = gz.NSFConfig(D=10, N=512, L=L, M=M).build(key, X=X)
    model = _per_factor_model(model, L, M, jax.random.PRNGKey(3))
    opt = optax.adam(1e-2)
    step = make_batched_train_step(
        nsf_negative_elbo_batched, opt, num_points=512, batch_size=64,
        static_kwargs={"E": 1, "microbatch": 32, "factored": True},
    )
    state = TrainState.create(model, opt, key)
    ref_losses = []
    for _ in range(3):
        state, loss = step(state, X, Y)
        ref_losses.append(float(loss))

    # group-aware (MGGP) reference, mirrored by the child
    from gpzoo_tpu.bijectors import lower_cholesky_inverse

    mggp_rng = np.random.default_rng(5)
    m_coords = mggp_rng.uniform(-2, 2, size=(256, 2))
    m_counts = mggp_rng.poisson(2.0, size=(8, 256)).astype(np.float64)
    m_groups = mggp_rng.integers(0, 3, size=256)
    m_cfg = gz.MGGPNSFConfig(D=8, N=256, L=2, M_per_group=6, n_groups=3,
                             batch_size=32)
    m_model = m_cfg.build(jax.random.PRNGKey(21), X=m_coords,
                          groups=m_groups)
    m_model = m_model.replace(gp=m_model.gp.replace(
        mu=0.1 * jax.random.normal(jax.random.PRNGKey(22), (2, m_cfg.M)),
        Lu_raw=lower_cholesky_inverse(
            jnp.broadcast_to(jnp.eye(m_cfg.M),
                             (2, m_cfg.M, m_cfg.M))),
    ))
    m_step = make_batched_train_step(
        nsf_negative_elbo_batched, optax.adam(1e-3), num_points=256,
        batch_size=32,
        static_kwargs={"E": 1, "microbatch": 16, "factored": True,
                       "groups": jnp.asarray(m_groups, jnp.int32)},
    )
    m_state = TrainState.create(m_model, optax.adam(1e-3),
                                jax.random.PRNGKey(23))
    ref_mggp = []
    for _ in range(2):
        m_state, m_loss = m_step(m_state, jnp.asarray(m_coords),
                                 jnp.asarray(m_counts))
        ref_mggp.append(float(m_loss))

    # VNNGP reference, mirrored by the child (same coords/counts as MGGP)
    from gpzoo_tpu.train.fast import vnngp_nsf_negative_elbo_batched

    v_model = gz.VNNGPConfig(D=8, N=256, L=2, M=32, K=4).build(
        jax.random.PRNGKey(31), X=jnp.asarray(m_coords))
    v_step = make_batched_train_step(
        vnngp_nsf_negative_elbo_batched, optax.adam(1e-3), num_points=256,
        batch_size=32, static_kwargs={"E": 1, "shared_kernel": True},
    )
    v_state = TrainState.create(v_model, optax.adam(1e-3),
                                jax.random.PRNGKey(32))
    ref_vnngp = []
    for _ in range(2):
        v_state, v_loss = v_step(v_state, jnp.asarray(m_coords),
                                 jnp.asarray(m_counts))
        ref_vnngp.append(float(v_loss))

    # --- two coordinated child processes ---------------------------------
    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    child = os.path.join(repo, "tests", "_distributed_child.py")
    env = dict(os.environ)
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
    procs = [
        subprocess.Popen(
            [_sys.executable, child, f"localhost:{port}", str(i),
             str(tmp_path)],
            env=env, cwd=repo, stdout=subprocess.PIPE,
            stderr=subprocess.PIPE, text=True,
        )
        for i in range(2)
    ]
    outs = []
    for p in procs:
        out, err = p.communicate(timeout=600)
        assert p.returncode == 0, f"child failed:\n{err[-4000:]}"
        outs.append(json.loads(out.strip().splitlines()[-1]))

    for rec in outs:
        assert rec["ckpt_ok"], rec
        for got, want in zip(rec["losses"], ref_losses):
            assert got == pytest.approx(want, rel=1e-9), (
                rec, ref_losses
            )
        for got, want in zip(rec["mggp_losses"], ref_mggp):
            assert got == pytest.approx(want, rel=1e-9), (
                rec, ref_mggp
            )
        # 1e-8: GSPMD repartitions the M×M solve inside the VNNGP
        # conditioning (same roundoff class as
        # test_sharded_vnngp_fast_loss_matches)
        for got, want in zip(rec["vnngp_losses"], ref_vnngp):
            assert got == pytest.approx(want, rel=1e-8), (
                rec, ref_vnngp
            )
    # both checkpoint shard files exist (the multi-process layout)
    assert os.path.exists(str(tmp_path / "dist_ckpt.shard0"))
    assert os.path.exists(str(tmp_path / "dist_ckpt.shard1"))


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
