"""Training-layer behavior: optimization progress, freeze masks, the W
clamp projection, scan fusion, and deterministic checkpoint/resume."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

import gpzoo_tpu as gz
from gpzoo_tpu.train import (
    TrainState,
    clamp_nonnegative,
    make_batched_train_step,
    make_scan_runner,
    make_restore_template,
    make_train_step,
    negative_elbo,
    negative_elbo_batched,
    negative_elbo_hybrid,
    pnmf_negative_elbo,
    partition_optimizer,
    restore_checkpoint,
    save_checkpoint,
    trainable_mask,
)


@pytest.fixture(scope="module")
def nsf_data():
    coords, counts, _ = gz.data.simulate_nsf_counts(N=300, D=15, L=4)
    return jnp.asarray(coords), jnp.asarray(counts)


def _build(key, X, **kw):
    cfg = gz.NSFConfig(D=15, N=300, L=4, M=24, **kw)
    return cfg.build(key, X=X)


def test_full_batch_training_decreases_loss(key, nsf_data):
    X, Y = nsf_data
    model = _build(key, X)
    opt = optax.adam(5e-3)
    state = TrainState.create(model, opt, key)
    step = make_train_step(negative_elbo, opt, static_kwargs={"E": 3})
    first = None
    for _ in range(150):
        state, loss = step(state, X, Y)
        first = first if first is not None else float(loss)
    assert float(loss) < 0.25 * first


def test_freeze_mask_keeps_leaves_fixed(key, nsf_data):
    X, Y = nsf_data
    model = _build(key, X)
    mask = trainable_mask(
        model, lambda p: not (p.endswith(".Z") or "kernel" in p)
    )
    opt = partition_optimizer(optax.adam(1e-2), mask)
    state = TrainState.create(model, opt, key)
    step = make_batched_train_step(
        negative_elbo_batched, opt, num_points=300, batch_size=64,
        static_kwargs={"E": 1},
    )
    for _ in range(5):
        state, _ = step(state, X, Y)
    assert np.array_equal(np.asarray(state.model.prior.Z),
                          np.asarray(model.prior.Z))
    assert np.array_equal(np.asarray(state.model.prior.kernel.lengthscale),
                          np.asarray(model.prior.kernel.lengthscale))
    assert not np.array_equal(np.asarray(state.model.prior.mu),
                              np.asarray(model.prior.mu))


def test_clamp_nonnegative_projection(key, nsf_data):
    X, _ = nsf_data
    model = _build(key, X)
    model = model.replace(W_raw=model.W_raw - 10.0)  # make negative
    clamped = clamp_nonnegative(model)
    assert float(jnp.min(clamped.W_raw)) >= 0.0
    # other leaves untouched
    np.testing.assert_array_equal(np.asarray(clamped.V_raw),
                                  np.asarray(model.V_raw))


def test_scan_runner_matches_stepwise(key, nsf_data):
    X, Y = nsf_data
    model = _build(key, X)
    opt = optax.adam(1e-3)
    step = make_train_step(negative_elbo, opt, static_kwargs={"E": 1})

    s1 = TrainState.create(model, opt, key)
    losses = []
    for _ in range(4):
        s1, l = step(s1, X, Y)
        losses.append(float(l))

    runner = make_scan_runner(step, 4)
    s2, scan_losses = runner(TrainState.create(model, opt, key), X, Y)
    np.testing.assert_allclose(np.asarray(scan_losses), losses, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(s2.model.W_raw),
                               np.asarray(s1.model.W_raw), rtol=1e-6)


def test_checkpoint_roundtrip_deterministic(tmp_path, key, nsf_data):
    X, Y = nsf_data
    model = _build(key, X)
    opt = optax.adam(1e-3)
    state = TrainState.create(model, opt, key)
    step = make_batched_train_step(
        negative_elbo_batched, opt, num_points=300, batch_size=64,
        static_kwargs={"E": 1},
    )
    for _ in range(3):
        state, _ = step(state, X, Y)

    path = save_checkpoint(str(tmp_path / "ck.msgpack"), state)
    restored = restore_checkpoint(path, TrainState.create(model, opt, key))
    assert int(restored.step) == 3
    _, la = step(state, X, Y)
    _, lb = step(restored, X, Y)
    assert float(la) == float(lb)


def test_pnmf_training(key):
    rng = np.random.default_rng(1)
    D, N, L = 12, 200, 3
    y = jnp.asarray(rng.poisson(3.0, (D, N)).astype(np.float64))
    cfg = gz.PNMFConfig(D=D, N=N, L=L)
    model = cfg.build(key)
    opt = cfg.optimizer()
    state = TrainState.create(model, opt, key)

    def loss_fn(m, y, key):
        return pnmf_negative_elbo(m, y, key, E=3)

    step = make_train_step(loss_fn, opt)
    first = None
    for _ in range(100):
        state, loss = step(state, y)
        first = first if first is not None else float(loss)
    assert float(loss) < first


def test_hybrid_training_runs(key, nsf_data):
    X, Y = nsf_data
    k1, k2, k3 = jax.random.split(key, 3)
    kernel = gz.kernels.NSFRBF.create(L=2, lengthscale=1.0)
    gp = gz.gps.SVGP.create(k1, kernel, dim=2, M=16, jitter=1e-1)
    prior = gz.gps.GaussianPrior.create(k2, N=300, L=3)
    model = gz.models.HybridNSF.create(k3, gp, prior, D=15, N=300, L=2, T=3)
    opt = optax.adam(1e-2)
    state = TrainState.create(model, opt, key)
    step = make_train_step(negative_elbo_hybrid, opt,
                           static_kwargs={"E": 2})
    first = None
    for _ in range(30):
        state, loss = step(state, X, Y)
        first = first if first is not None else float(loss)
    assert np.isfinite(float(loss)) and float(loss) < first


def test_vnngp_training_runs(key):
    x, y = gz.data.simulate_1d_regression(n=500)
    k1, k2 = jax.random.split(key)
    kernel = gz.kernels.NSFRBF.create(L=1, sigma=1.0, lengthscale=1.0)
    gp = gz.gps.VNNGP.create(k1, kernel, dim=1, M=50, K=4, jitter=1e-2)
    gp = gp.replace(mu=jnp.zeros((1, 50)),
                    Lu_raw=jax.random.normal(k2, (1, 50, 50)) * 0.1)
    model = gz.models.GaussianLikelihood.create(gp, noise=0.5)
    opt = optax.adam(1e-2)
    state = TrainState.create(model, opt, key)
    step = make_train_step(negative_elbo, opt, static_kwargs={"E": 3})
    X, Yj = jnp.asarray(x), jnp.asarray(y)
    first = None
    for _ in range(60):
        state, loss = step(state, X, Yj)
        first = first if first is not None else float(loss)
    assert np.isfinite(float(loss)) and float(loss) < first


def test_freeze_loss_stop_gradient(key, nsf_data):
    """stop-gradient freezing must zero frozen-leaf grads and leave
    trainable-leaf grads unchanged."""
    import jax
    from gpzoo_tpu.train import freeze_loss, trainable_mask
    from gpzoo_tpu.train.fast import nsf_negative_elbo_batched

    X, Y = nsf_data
    model = _build(key, X)
    idx = jnp.arange(64)
    mask = trainable_mask(
        model, lambda p: not (p.endswith(".Z") or ".kernel." in p)
    )
    loss = freeze_loss(nsf_negative_elbo_batched, mask)
    g = jax.grad(lambda m: loss(m, X, Y, idx, key, E=1, microbatch=32))(model)
    g_ref = jax.grad(
        lambda m: nsf_negative_elbo_batched(m, X, Y, idx, key, E=1,
                                            microbatch=32)
    )(model)
    assert float(jnp.max(jnp.abs(g.prior.Z))) == 0.0
    assert float(jnp.max(jnp.abs(g.prior.kernel.lengthscale))) == 0.0
    np.testing.assert_allclose(np.asarray(g.prior.mu),
                               np.asarray(g_ref.prior.mu), rtol=1e-10)
    np.testing.assert_allclose(np.asarray(g.W_raw),
                               np.asarray(g_ref.W_raw), rtol=1e-10)


def test_mggp_nsf_with_whitened_prior(key, rng):
    """MGGPNSF must work over both MGGPSVGP and MGGPWSVGP priors
    (groups threaded as keywords)."""
    import gpzoo_tpu as gz
    from gpzoo_tpu.train import negative_elbo_batched

    N, D, L, G = 120, 8, 2, 3
    x = jnp.asarray(rng.uniform(-2, 2, (N, 2)))
    y = jnp.asarray(rng.poisson(3.0, (D, N)).astype(float))
    groups = jnp.asarray(rng.integers(0, G, N))
    idx = jnp.arange(32)

    kernel = gz.kernels.MGGPNSFRBF.create(n_groups=G, L=L)
    for gp_cls in (gz.gps.MGGPSVGP, gz.gps.MGGPWSVGP):
        gp = gp_cls.create(key, kernel, dim=2, M=12, n_groups=G,
                           jitter=1e-1)
        model = gz.models.MGGPNSF.create(key, gp, D=D, N=N, L=L)
        loss = negative_elbo_batched(model, x, y, idx, key, E=1,
                                     groups_x=groups)
        assert np.isfinite(float(loss)), gp_cls.__name__


def test_legacy_hybrid_with_clamp_projection(key, nsf_data):
    """Hybrid_NSF-style training: raw (unsoftplus'd) loadings + post-step
    W/W2 clamping (utilities.py:498-526 trainer behavior)."""
    from gpzoo_tpu.train import negative_elbo_hybrid_batched

    X, Y = nsf_data
    k1, k2 = jax.random.split(key)
    kernel = gz.kernels.NSFRBF.create(L=2, lengthscale=1.0)
    gp = gz.gps.SVGP.create(k1, kernel, dim=2, M=16, jitter=1e-1)
    model = gz.models.LegacyHybridNSF.create(k2, gp, D=15, N=300, L=2,
                                             non_spatial_factors=3)
    opt = optax.adam(1e-2)
    state = TrainState.create(model, opt, key)
    step = make_batched_train_step(
        negative_elbo_hybrid_batched, opt, num_points=300, batch_size=64,
        project=clamp_nonnegative, static_kwargs={"E": 2},
    )
    first = None
    for _ in range(25):
        state, loss = step(state, X, Y)
        first = first if first is not None else float(loss)
    assert np.isfinite(float(loss))
    # the raw loadings stay nonnegative after every update
    assert float(jnp.min(state.model.W_raw)) >= 0.0
    assert float(jnp.min(state.model.W2_raw)) >= 0.0


def test_deep_gp_composition_trains(key):
    """The (qF,qU,pU) contract composes: a 2-layer deep GP (the
    Coordinates/Deep-Coordinates notebook pattern) trains as user code."""
    import runpy
    import sys

    x_np, y_np = gz.data.simulate_1d_regression(n=300)
    x, y = jnp.asarray(x_np), jnp.asarray(y_np)

    from gpzoo_tpu import dists as gzd

    k1, k2 = jax.random.split(key)
    kern = gz.kernels.RBF(sigma=jnp.asarray(1.0),
                          lengthscale=jnp.asarray(2.0))
    gp1 = gz.gps.SVGP.create(k1, kern, dim=1, M=16, jitter=1e-3)
    gp2 = gz.gps.SVGP.create(k2, kern, dim=1, M=16, jitter=1e-3)

    def loss_fn(params, x, y, key):
        g1, g2 = params
        qf1, qu1, pu1 = g1(x)
        k_a, k_b = jax.random.split(key)
        h = qf1.sample(k_a, (2,))
        qf2, qu2, pu2 = jax.vmap(lambda hh: g2(hh[:, None]))(h)
        f = qf2.sample(k_b)
        ll = jnp.sum(jnp.mean(gzd.Normal(f, 0.5).log_prob(y), axis=0))
        kl1 = jnp.sum(gzd.kl_divergence(qu1, pu1))
        kl2 = jnp.mean(jnp.sum(gzd.kl_divergence(qu2, pu2), axis=-1))
        return -(ll - kl1 - kl2)

    params = (gp1, gp2)
    opt = optax.adam(3e-3)
    opt_state = opt.init(params)
    first = None
    step_f = jax.jit(
        lambda p, s, k: _deep_step(p, s, k, x, y, opt, loss_fn)
    )

    def _deep_step(p, s, k, x, y, opt, loss_fn):
        k, sub = jax.random.split(k)
        l, g = jax.value_and_grad(loss_fn)(p, x, y, sub)
        u, s = opt.update(g, s, p)
        return optax.apply_updates(p, u), s, k, l

    k = key
    for _ in range(30):
        params, opt_state, k, loss = step_f(params, opt_state, k)
        first = first if first is not None else float(loss)
    assert np.isfinite(float(loss)) and float(loss) < first


def test_posterior_snapshot_hook(key, nsf_data, tmp_path):
    """The on_chunk snapshot hook (reference: per-10-step posterior
    captures for training animations, Slideseq notebook cells 36-39):
    one snapshot per chunk, finite percentile records, frames persisted."""
    from gpzoo_tpu.train import PosteriorSnapshotter
    from gpzoo_tpu.utils import MetricLogger

    X, Y = nsf_data
    model = _build(key, X)
    opt = optax.adam(5e-3)
    state = TrainState.create(model, opt, key)
    step = make_batched_train_step(
        negative_elbo_batched, opt, num_points=300, batch_size=64,
        static_kwargs={"E": 1},
    )
    probe = X[:100]
    logger = MetricLogger()
    snap = PosteriorSnapshotter(probe, every=2, logger=logger)
    runner = make_scan_runner(step, 5, on_chunk=snap)
    for _ in range(4):
        state, losses = runner(state, X, Y)
    # every=2 over 4 chunks -> 2 snapshots, at steps 10 and 20
    assert [s for s, _ in snap.history] == [10, 20]
    assert snap.history[0][1].shape == (4, 100)
    for rec in snap.records:
        assert np.isfinite(rec["qf_mean_p50"])
        assert np.isfinite(rec["qf_scale_p95"])
    assert len(logger.history) == 2
    out = snap.save(str(tmp_path / "frames.npz"))
    data = np.load(out)
    assert data["frames"].shape == (2, 4, 100)
    assert list(data["steps"]) == [10, 20]


@pytest.mark.parametrize("async_save", [True, False])
def test_checkpoint_hook_rotates_and_resumes(key, nsf_data, tmp_path,
                                             async_save):
    """CheckpointHook: periodic saves via the on_chunk slot, rotation to
    `keep` files, and a `.latest` that resumes bit-identically — in both
    the async (single-process default) and synchronous modes."""
    from gpzoo_tpu.train.checkpoint import CheckpointHook

    X, Y = nsf_data
    model = _build(key, X)
    opt = optax.adam(5e-3)
    state = TrainState.create(model, opt, key)
    step = make_batched_train_step(
        negative_elbo_batched, opt, num_points=300, batch_size=64,
        static_kwargs={"E": 1},
    )
    hook = CheckpointHook(str(tmp_path / "run"), every=1, keep=2,
                          async_save=async_save)
    runner = make_scan_runner(step, 5, on_chunk=hook)
    for _ in range(4):
        state, losses = runner(state, X, Y)
    hook.wait()  # flush the in-flight async write before reading files
    import glob as _glob

    tagged = sorted(_glob.glob(str(tmp_path / "run.step*")))
    assert len(tagged) == 2  # rotated down to keep=2
    assert str(tmp_path / "run.step15") in tagged
    assert str(tmp_path / "run.step20") in tagged

    template = make_restore_template(state)
    restored = restore_checkpoint(hook.latest_path, template)
    s_live, l_live = runner(state, X, Y)
    s_res, l_res = runner(restored, X, Y)
    np.testing.assert_array_equal(np.asarray(l_live), np.asarray(l_res))


def test_restore_ignores_stale_tmp_shard(key, nsf_data, tmp_path):
    """A crash mid-save can leave `<ckpt>.shard<p>.tmp` beside good shard
    files; restore must skip it (the .shard* glob used to pick it up and
    crash on the sort key — the recovery path failing in exactly the
    crash scenario it exists for)."""
    from gpzoo_tpu.train.checkpoint import _load_multiprocess

    X, Y = nsf_data
    model = _build(key, X)
    state = TrainState.create(model, optax.adam(1e-3), key)
    path = str(tmp_path / "ckpt")
    # fabricate the single-shard multi-process layout + a stale tmp file
    from flax import serialization

    flat, _ = jax.tree_util.tree_flatten(state)
    local = {f"{i}|": np.asarray(leaf) for i, leaf in enumerate(flat)}
    with open(path + ".shard0", "wb") as f:
        f.write(serialization.msgpack_serialize(local))
    with open(path + ".shard0.tmp", "wb") as f:
        f.write(b"garbage from a killed save")

    template = make_restore_template(state)
    restored = _load_multiprocess(path, template)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(
            np.asarray(a), np.asarray(b)),
        jax.device_get(state), restored,
    )


def test_restore_rejects_incomplete_or_mixed_shard_set(key, nsf_data,
                                                       tmp_path):
    """A lost shard file or a crash between two processes' atomic
    replaces must fail loudly at restore — never resume from
    uninitialized regions or a mix of two different saves."""
    from flax import serialization

    from gpzoo_tpu.train.checkpoint import _load_multiprocess

    X, Y = nsf_data
    model = _build(key, X)
    state = TrainState.create(model, optax.adam(1e-3), key)
    flat, _ = jax.tree_util.tree_flatten(state)
    template = make_restore_template(state)

    def meta(p, nprocs, save_id):
        return {"process_index": np.int64(p),
                "process_count": np.int64(nprocs),
                "save_id": np.int64(save_id)}

    def write(path, local):
        with open(path, "wb") as f:
            f.write(serialization.msgpack_serialize(local))

    # 2-process layout: leaf 0 split in half across the two files
    lead = np.asarray(flat[0])
    rest = {f"{i}|": np.asarray(leaf) for i, leaf in enumerate(flat[1:], 1)}
    h = lead.shape[0] // 2
    sl0 = f"0:{h}" + "".join(f",0:{d}" for d in lead.shape[1:])
    sl1 = f"{h}:{lead.shape[0]}" + "".join(
        f",0:{d}" for d in lead.shape[1:])
    shard0 = {"__meta__": meta(0, 2, 42), f"0|{sl0}": lead[:h], **rest}
    shard1 = {"__meta__": meta(1, 2, 42), f"0|{sl1}": lead[h:]}

    # complete pair restores fine
    path = str(tmp_path / "ok")
    write(path + ".shard0", shard0)
    write(path + ".shard1", shard1)
    restored = _load_multiprocess(path, template)
    np.testing.assert_array_equal(
        jax.tree_util.tree_leaves(restored)[0], lead)

    # missing shard1 -> leaf 0 only partially covered -> raise
    path = str(tmp_path / "lost")
    write(path + ".shard0", shard0)
    with pytest.raises(ValueError, match="2.*process|partially"):
        _load_multiprocess(path, template)

    # shard1 from a DIFFERENT save -> raise
    path = str(tmp_path / "mixed")
    write(path + ".shard0", shard0)
    write(path + ".shard1", {**shard1, "__meta__": meta(1, 2, 43)})
    with pytest.raises(ValueError, match="different +saves"):
        _load_multiprocess(path, template)


def test_checkpoint_rotation_is_prefix_safe(key, nsf_data, tmp_path):
    """Rotating out 'run.step5' must not glob away 'run.step50'/'.step55'
    (newer checkpoints sharing the string prefix)."""
    from gpzoo_tpu.train.checkpoint import CheckpointHook

    X, Y = nsf_data
    model = _build(key, X)
    state = TrainState.create(model, optax.adam(1e-3), key)

    hook = CheckpointHook(str(tmp_path / "run"), every=1, keep=10)
    # drive the hook directly with states at steps 5, 10, ..., 60:
    # rotating out step5 while step50/step55 exist exercises the prefix
    for step in range(5, 61, 5):
        hook.keep = 10 if step <= 55 else 1  # force rotation at the end
        hook(state.replace(step=jnp.asarray(step)), None)
    hook.wait()
    import glob as _glob

    remaining = sorted(_glob.glob(str(tmp_path / "run.step*")))
    assert remaining == [str(tmp_path / "run.step60")], remaining
    # .latest still restores (it tracks the newest save, cloned bytes)
    template = make_restore_template(state)
    restored = restore_checkpoint(hook.latest_path, template)
    assert int(restored.step) == 60


def test_async_checkpoint_matches_sync_and_survives_donation(
        key, nsf_data, tmp_path):
    """AsyncCheckpointer must write the exact state at the save call even
    when the live state's buffers are immediately donated into further
    training steps (the on-device snapshot is donation-safe), and the
    resumed trajectory must be bit-identical to a sync-save resume."""
    from gpzoo_tpu.train import AsyncCheckpointer

    X, Y = nsf_data
    model = _build(key, X)
    opt = optax.adam(1e-3)
    state = TrainState.create(model, opt, key)
    step = make_batched_train_step(
        negative_elbo_batched, opt, num_points=300, batch_size=64,
        static_kwargs={"E": 1},
    )
    runner = make_scan_runner(step, 3, donate=True)
    state, _ = runner(state, X, Y)

    p_sync = str(tmp_path / "sync.msgpack")
    p_async = str(tmp_path / "async.msgpack")
    save_checkpoint(p_sync, state)
    ck = AsyncCheckpointer()
    ck.save(p_async, state)
    # stress: donate the live buffers into more steps while the write
    # drains — the snapshot must be unaffected
    state, losses_live = runner(state, X, Y)
    ck.wait()

    template = make_restore_template(state)
    r_sync = restore_checkpoint(p_sync, template)
    r_async = restore_checkpoint(p_async, template)
    for a, b in zip(jax.tree_util.tree_leaves(r_sync),
                    jax.tree_util.tree_leaves(r_async)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # resume contract: the async-saved state continues the exact
    # trajectory the live (donating) run produced
    _, losses_resumed = runner(r_async, X, Y)
    np.testing.assert_array_equal(np.asarray(losses_live),
                                  np.asarray(losses_resumed))


def test_async_checkpoint_wait_reraises(key, nsf_data, tmp_path):
    """A failed background write must surface at wait() (or the next
    save), never pass silently."""
    from gpzoo_tpu.train import AsyncCheckpointer

    X, _ = nsf_data
    model = _build(key, X)
    state = TrainState.create(model, optax.adam(1e-3), key)
    ck = AsyncCheckpointer()
    ck.save(str(tmp_path / "no_such_dir" / "ck.msgpack"), state)
    with pytest.raises(RuntimeError, match="async checkpoint"):
        ck.wait()
    # the checkpointer stays usable after a failure
    ck.save(str(tmp_path / "ok.msgpack"), state)
    ck.wait()
    restored = restore_checkpoint(str(tmp_path / "ok.msgpack"),
                                  make_restore_template(state))
    assert int(restored.step) == int(state.step)


def test_async_checkpoint_crash_leaves_only_tmp(key, nsf_data, tmp_path):
    """Atomicity across the async boundary: a write interrupted before
    os.replace leaves `<path>.tmp` only; a previously completed
    checkpoint at the same path is untouched and still restores."""
    from gpzoo_tpu.train import AsyncCheckpointer
    from gpzoo_tpu.train import checkpoint as ckpt_mod

    X, _ = nsf_data
    model = _build(key, X)
    state = TrainState.create(model, optax.adam(1e-3), key)
    path = str(tmp_path / "ck.msgpack")
    save_checkpoint(path, state)  # the good previous checkpoint

    bumped = state.replace(step=jnp.asarray(999))
    orig_replace = ckpt_mod.os.replace

    def crash(*a, **k):
        raise OSError("simulated crash between async write and replace")

    ck = AsyncCheckpointer()
    ckpt_mod.os.replace = crash
    try:
        ck.save(path, bumped)
        with pytest.raises(RuntimeError):
            ck.wait()
    finally:
        ckpt_mod.os.replace = orig_replace
    # the interrupted write left the .tmp, not a corrupt checkpoint
    assert ckpt_mod.os.path.exists(path + ".tmp")
    restored = restore_checkpoint(path, make_restore_template(state))
    assert int(restored.step) == int(state.step)  # the OLD save


def test_restore_rejects_ambiguous_layouts(key, nsf_data, tmp_path):
    """Both a single-file checkpoint AND .shard* files under one name
    (a run that changed process count) must fail loudly, not silently
    prefer one layout (advisor round 3)."""
    from flax import serialization

    X, _ = nsf_data
    model = _build(key, X)
    state = TrainState.create(model, optax.adam(1e-3), key)
    path = str(tmp_path / "ck")
    save_checkpoint(path, state)
    flat, _ = jax.tree_util.tree_flatten(state)
    local = {f"{i}|": np.asarray(leaf) for i, leaf in enumerate(flat)}
    with open(path + ".shard0", "wb") as f:
        f.write(serialization.msgpack_serialize(local))
    with pytest.raises(ValueError, match="ambiguous"):
        restore_checkpoint(path, make_restore_template(state))
