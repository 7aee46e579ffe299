"""Real-TPU pytest lane (round-2 verdict item 6).

Run with::

    GPZOO_TPU_TESTS=1 python -m pytest -m tpu -q

The default CI lane pins ``JAX_PLATFORMS=cpu`` (tests/conftest.py), so a
Mosaic-compilation regression in the Pallas kernels — or a TPU-only
numeric/layout bug in the production fast losses — would ship green.
This lane closes that: it verifies every Pallas kernel value+gradient in
the Mosaic-compiled path (the ``benchmarks/pallas_ab.py`` harness) and
runs one smoke step of each production fast loss on the device.

Serialize with other TPU users (the tunnel wedges under concurrent
processes — docs/PERFORMANCE.md).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

pytestmark = [
    pytest.mark.tpu,
    pytest.mark.skipif(
        jax.default_backend() not in ("tpu", "axon"),
        reason="requires real TPU (set GPZOO_TPU_TESTS=1 and run -m tpu)",
    ),
]


def _fetch(x):
    return float(np.asarray(jax.device_get(jnp.ravel(
        jax.tree_util.tree_leaves(x)[0])[0])))


def test_pallas_kernels_mosaic_verified():
    """Values + gradients of every Pallas kernel vs its XLA oracle in the
    Mosaic-compiled path."""
    import os
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, os.path.join(repo, "benchmarks"))
    import pallas_ab

    assert pallas_ab.main(["--no-time"]) == 0


def _smoke_steps(model, loss_fn, x, y_t, static_kwargs, n_points, batch,
                 steps=3, trainable=None):
    import optax

    from gpzoo_tpu.train import (TrainState, freeze_loss,
                                 make_batched_train_step,
                                 partition_optimizer, trainable_mask)

    mask = trainable_mask(model, trainable or (lambda p: True))
    opt = partition_optimizer(optax.adam(1e-3), mask)
    step = make_batched_train_step(
        freeze_loss(loss_fn, mask), opt, num_points=n_points,
        batch_size=batch, static_kwargs=static_kwargs,
    )
    state = TrainState.create(model, opt, jax.random.PRNGKey(0))
    losses = []
    for _ in range(steps):
        state, loss = step(state, x, y_t)
        losses.append(_fetch(loss))
    assert np.all(np.isfinite(losses)), losses
    return losses


@pytest.fixture(scope="module")
def nsf_data():
    rng = np.random.default_rng(0)
    N, D = 2048, 64
    coords = rng.uniform(-2, 2, size=(N, 2)).astype(np.float32)
    counts_t = rng.poisson(3.0, size=(N, D)).astype(np.float32)
    return jnp.asarray(coords), jnp.asarray(counts_t), N, D


def test_nsf_fast_loss_on_device(nsf_data):
    import gpzoo_tpu as gz
    from gpzoo_tpu.train.fast import nsf_negative_elbo_batched

    x, y_t, N, D = nsf_data
    cfg = gz.SlideseqNSFConfig(D=D, N=N, L=4, M=512, batch_size=512)
    model = cfg.build(jax.random.PRNGKey(1), x)
    _smoke_steps(
        model, nsf_negative_elbo_batched, x, y_t,
        {"E": 1, "microbatch": 512, "y_transposed": True,
         "factored": True, "shared_kernel": True},
        N, 512, trainable=cfg.trainable,
    )


def test_nsf_precomputed_loss_on_device(nsf_data):
    import gpzoo_tpu as gz
    from gpzoo_tpu.train.fast import (nsf_negative_elbo_precomputed,
                                      precompute_nsf_projection)

    x, y_t, N, D = nsf_data
    cfg = gz.SlideseqNSFConfig(D=D, N=N, L=4, M=512, batch_size=512)
    model = cfg.build(jax.random.PRNGKey(1), x)
    proj = precompute_nsf_projection(model, x)
    _smoke_steps(
        model, lambda m, p, y, idx, key, **kw:
            nsf_negative_elbo_precomputed(m, p, y, idx, key, **kw),
        proj, y_t, {"E": 1, "y_transposed": True}, N, 512,
        trainable=cfg.trainable,
    )


def test_mggp_fast_loss_on_device(nsf_data):
    """Group-threaded W-form path (per-factor trainable kernels)."""
    import gpzoo_tpu as gz
    from gpzoo_tpu.bijectors import lower_cholesky_inverse
    from gpzoo_tpu.train.fast import nsf_negative_elbo_batched

    x, y_t, N, D = nsf_data
    rng = np.random.default_rng(3)
    groups = jnp.asarray(rng.integers(0, 4, size=N), jnp.int32)
    L = 4
    cfg = gz.MGGPNSFConfig(D=D, N=N, L=L, M_per_group=64, n_groups=4,
                           batch_size=512)
    model = cfg.build(jax.random.PRNGKey(2), X=np.asarray(x),
                      groups=np.asarray(groups))
    M = cfg.M
    model = model.replace(gp=model.gp.replace(
        mu=0.1 * jax.random.normal(jax.random.PRNGKey(5), (L, M)),
        Lu_raw=lower_cholesky_inverse(
            jnp.broadcast_to(jnp.eye(M), (L, M, M))),
    ))
    _smoke_steps(
        model, nsf_negative_elbo_batched, x, y_t,
        {"E": 1, "microbatch": 512, "y_transposed": True,
         "factored": True, "groups": groups},
        N, 512, trainable=lambda p: not p.endswith(".Z"),
    )


def test_vnngp_fast_loss_on_device(nsf_data):
    """VNNGP fast loss — exercises the Pallas SoA conditioning dispatch
    (float32, K <= 16 on TPU)."""
    import gpzoo_tpu as gz
    from gpzoo_tpu.train.fast import vnngp_nsf_negative_elbo_batched

    x, y_t, N, D = nsf_data
    model = gz.VNNGPConfig(D=D, N=N, L=4, M=256, K=8).build(
        jax.random.PRNGKey(4), X=x)
    _smoke_steps(
        model, vnngp_nsf_negative_elbo_batched, x, y_t,
        {"E": 1, "shared_kernel": True, "y_transposed": True},
        N, 512,
    )


def test_vnngp_precomputed_loss_on_device(nsf_data):
    """Frozen-geometry VNNGP tier (round 4): the precomputed
    conditioning + per-step S-gather loss on device."""
    import gpzoo_tpu as gz
    from gpzoo_tpu.train.fast_vnngp import (
        precompute_vnngp_conditioning, vnngp_nsf_negative_elbo_precomputed)

    x, y_t, N, D = nsf_data
    model = gz.VNNGPConfig(D=D, N=N, L=4, M=256, K=8).build(
        jax.random.PRNGKey(4), X=x)
    cond = precompute_vnngp_conditioning(model, x)
    _smoke_steps(
        model, lambda m, c, y, idx, key, **kw:
            vnngp_nsf_negative_elbo_precomputed(m, c, y, idx, key, **kw),
        cond, y_t, {"E": 1, "y_transposed": True}, N, 512,
    )


def test_async_checkpoint_on_device(nsf_data, tmp_path):
    """AsyncCheckpointer on the real device: snapshot-under-donation +
    background device->host transfer through the tunnel, restored state
    resumes the exact trajectory."""
    import optax

    import gpzoo_tpu as gz
    from gpzoo_tpu.train import (AsyncCheckpointer, TrainState,
                                 make_batched_train_step,
                                 make_restore_template, make_scan_runner,
                                 restore_checkpoint)
    from gpzoo_tpu.train.fast import nsf_negative_elbo_batched

    x, y_t, N, D = nsf_data
    cfg = gz.SlideseqNSFConfig(D=D, N=N, L=4, M=256, batch_size=512)
    model = cfg.build(jax.random.PRNGKey(1), x)
    opt = optax.adam(1e-3)
    step = make_batched_train_step(
        nsf_negative_elbo_batched, opt, num_points=N, batch_size=512,
        static_kwargs={"E": 1, "microbatch": 512, "y_transposed": True,
                       "factored": True, "shared_kernel": True},
    )
    runner = make_scan_runner(step, 3, donate=True)
    state = TrainState.create(model, opt, jax.random.PRNGKey(0))
    state, _ = runner(state, x, y_t)
    template = make_restore_template(state)
    ck = AsyncCheckpointer()
    path = str(tmp_path / "dev_ck.msgpack")
    ck.save(path, state)
    # donate the live buffers into more steps while the write drains
    state, losses_live = runner(state, x, y_t)
    losses_live = np.asarray(jax.device_get(losses_live))
    ck.wait()
    restored = restore_checkpoint(path, template)
    _, losses_resumed = runner(restored, x, y_t)
    np.testing.assert_array_equal(
        losses_live, np.asarray(jax.device_get(losses_resumed)))
