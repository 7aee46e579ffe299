"""Child process for the 2-process ``jax.distributed`` bring-up test.

Executed by tests/test_sharding.py::test_two_process_distributed — each of
two processes forces 4 virtual CPU devices, joins the coordination service
via :func:`gpzoo_tpu.parallel.initialize_distributed`, lays a DCN-aware
``hybrid_mesh({"hosts": 2}, {"data": 2, "factor": 2})`` over the 8 global
devices, runs sharded DP+TP train steps, and round-trips a multi-process
checkpoint (per-process shard files). Prints one JSON line with the losses
and checkpoint verdict; the parent asserts they match its single-process
reference.

Usage: python tests/_distributed_child.py <coordinator> <process_id> <dir>
"""

import json
import os
import sys

coordinator, proc_id, workdir = sys.argv[1], int(sys.argv[2]), sys.argv[3]

os.environ["JAX_PLATFORMS"] = "cpu"
flags = [f for f in os.environ.get("XLA_FLAGS", "").split()
         if "xla_force_host_platform_device_count" not in f]
flags.append("--xla_force_host_platform_device_count=4")
os.environ["XLA_FLAGS"] = " ".join(flags)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")
jax.config.update("jax_enable_x64", True)

from gpzoo_tpu.parallel import initialize_distributed  # noqa: E402

initialize_distributed(coordinator_address=coordinator, num_processes=2,
                       process_id=proc_id)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
import optax  # noqa: E402

import gpzoo_tpu as gz  # noqa: E402
from gpzoo_tpu.bijectors import lower_cholesky_inverse  # noqa: E402
from gpzoo_tpu.parallel import (hybrid_mesh, put_sharded, replicate,  # noqa: E402
                                shard_columns, shard_factor_params,
                                make_sharded_batched_train_step)
from gpzoo_tpu.train import TrainState  # noqa: E402
from gpzoo_tpu.train.checkpoint import (make_restore_template,  # noqa: E402
                                        restore_checkpoint,
                                        save_checkpoint)
from gpzoo_tpu.train.fast import nsf_negative_elbo_batched  # noqa: E402

assert jax.process_count() == 2, jax.process_count()
assert len(jax.devices()) == 8, jax.devices()

mesh = hybrid_mesh({"hosts": 2}, {"data": 2, "factor": 2})

# Identical setup to the parent's reference (seeded) -----------------------
L, M = 2, 16
coords, counts, _ = gz.data.simulate_nsf_counts(N=512, D=10, L=L)
X, Y = jnp.asarray(coords), jnp.asarray(counts)
key = jax.random.PRNGKey(7)
model = gz.NSFConfig(D=10, N=512, L=L, M=M).build(key, X=X)
model = model.replace(prior=model.prior.replace(
    mu=0.1 * jax.random.normal(jax.random.PRNGKey(3), (L, M)),
    Lu_raw=lower_cholesky_inverse(jnp.broadcast_to(jnp.eye(M), (L, M, M))),
))

opt = optax.adam(1e-2)
state, shardings = shard_factor_params(
    mesh, TrainState.create(model, opt, key), num_factors=L
)
lu = state.model.prior.Lu_raw
assert not lu.sharding.is_fully_addressable  # true cross-process layout
assert max(s.data.nbytes for s in lu.addressable_shards) * 2 <= lu.nbytes

# Batch sharded over ("hosts", "data") — the outer axis is the real
# cross-process (DCN) data-parallel dimension, so the gradient psum runs
# hierarchically across the two OS processes.
step = make_sharded_batched_train_step(
    nsf_negative_elbo_batched, opt, num_points=512, batch_size=64,
    mesh=mesh, axis_name=("hosts", "data"),
    static_kwargs={"E": 1, "microbatch": 32, "factored": True},
    state_shardings=shardings,
)
X_sh, Y_sh = replicate(mesh, X), shard_columns(mesh, Y)

losses = []
for _ in range(3):
    state, loss = step(state, X_sh, Y_sh)
    losses.append(float(loss))

# Multi-process checkpoint round-trip: per-process shard files -------------
ckpt = os.path.join(workdir, "dist_ckpt")
save_checkpoint(ckpt, state)
assert os.path.exists(f"{ckpt}.shard{proc_id}")
template = make_restore_template(state)
restored = restore_checkpoint(ckpt, template, shardings=shardings)
r_lu = restored.model.prior.Lu_raw
assert r_lu.sharding.is_equivalent_to(lu.sharding, r_lu.ndim)
for got, want in zip(r_lu.addressable_shards,
                     state.model.prior.Lu_raw.addressable_shards):
    np.testing.assert_array_equal(np.asarray(got.data),
                                  np.asarray(want.data))
# one more step from the restored state matches one from the live state
state2, l_live = step(state, X_sh, Y_sh)
_, l_restored = step(restored, X_sh, Y_sh)
ckpt_ok = float(l_live) == float(l_restored)

# Group-aware (MGGP) fast loss across the two processes -------------------
mggp_rng = np.random.default_rng(5)
m_coords = mggp_rng.uniform(-2, 2, size=(256, 2))
m_counts = mggp_rng.poisson(2.0, size=(8, 256)).astype(np.float64)
m_groups = mggp_rng.integers(0, 3, size=256)
m_cfg = gz.MGGPNSFConfig(D=8, N=256, L=2, M_per_group=6, n_groups=3,
                         batch_size=32)
m_model = m_cfg.build(jax.random.PRNGKey(21), X=m_coords, groups=m_groups)
m_model = m_model.replace(gp=m_model.gp.replace(
    mu=0.1 * jax.random.normal(jax.random.PRNGKey(22), (2, m_cfg.M)),
    Lu_raw=lower_cholesky_inverse(
        jnp.broadcast_to(jnp.eye(m_cfg.M), (2, m_cfg.M, m_cfg.M))),
))
mX = replicate(mesh, jnp.asarray(m_coords))
mY = shard_columns(mesh, jnp.asarray(m_counts))
mg = replicate(mesh, jnp.asarray(m_groups, jnp.int32))
m_step = make_sharded_batched_train_step(
    nsf_negative_elbo_batched, optax.adam(1e-3), num_points=256,
    batch_size=32, mesh=mesh, axis_name=("hosts", "data"),
    static_kwargs={"E": 1, "microbatch": 16, "factored": True,
                   "groups": mg},
)
m_state = replicate(mesh, TrainState.create(m_model, optax.adam(1e-3),
                                            jax.random.PRNGKey(23)))
mggp_losses = []
for _ in range(2):
    m_state, m_loss = m_step(m_state, mX, mY)
    mggp_losses.append(float(m_loss))

# VNNGP fast loss across the two processes (top-K neighbor conditioning
# under DP sharding; reuses the MGGP section's coords/counts) -------------
from gpzoo_tpu.train.fast import vnngp_nsf_negative_elbo_batched  # noqa: E402

v_model = gz.VNNGPConfig(D=8, N=256, L=2, M=32, K=4).build(
    jax.random.PRNGKey(31), X=jnp.asarray(m_coords))
v_step = make_sharded_batched_train_step(
    vnngp_nsf_negative_elbo_batched, optax.adam(1e-3), num_points=256,
    batch_size=32, mesh=mesh, axis_name=("hosts", "data"),
    static_kwargs={"E": 1, "shared_kernel": True},
)
v_state = replicate(mesh, TrainState.create(v_model, optax.adam(1e-3),
                                            jax.random.PRNGKey(32)))
vnngp_losses = []
for _ in range(2):
    v_state, v_loss = v_step(v_state, mX, mY)
    vnngp_losses.append(float(v_loss))

print(json.dumps({"proc": proc_id, "losses": losses, "ckpt_ok": ckpt_ok,
                  "mggp_losses": mggp_losses,
                  "vnngp_losses": vnngp_losses}),
      flush=True)
