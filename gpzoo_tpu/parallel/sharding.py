"""SPMD-sharded training steps.

Layout (the scaling-book recipe — annotate, let XLA insert collectives):

* model parameters (Z, mu, Lu, W, kernel hyperparams) — **replicated**;
  the inducing set is small (M ≪ N), so replicating it makes the batch
  dimension embarrassingly parallel,
* the minibatch index vector — **sharded over "data"**, which makes every
  downstream batch-indexed tensor (X[idx] gather, the L×M×B cross-Gram,
  the triangular-solve RHS, the E×D×B rate matmul, the per-spot
  log-likelihood) partition over its B axis,
* the scalar loss / gradients — reduced by XLA with ``psum`` /
  reduce-scatter over ICI.

Cross-chip traffic per step is therefore one gradient reduction of the
(replicated-size) parameter pytree — no Gram or likelihood tensor ever
moves between chips.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import optax
from jax.sharding import NamedSharding, PartitionSpec as P

from gpzoo_tpu.train.loop import _value_and_grad


def replicate(mesh, tree):
    """Place a pytree fully replicated on ``mesh``."""
    sharding = NamedSharding(mesh, P())
    return jax.device_put(tree, sharding)


def shard_columns(mesh, array, axis_name="data"):
    """Place a (D, N) matrix with columns sharded over the mesh axis —
    used for the counts matrix y so each chip holds only its spots."""
    spec = [None] * array.ndim
    spec[-1] = axis_name
    return jax.device_put(array, NamedSharding(mesh, P(*spec)))


def make_sharded_batched_train_step(loss_fn, optimizer, num_points,
                                    batch_size, mesh, axis_name="data",
                                    project=None, static_kwargs=None,
                                    donate=False):
    """Sharded analog of
    :func:`gpzoo_tpu.train.loop.make_batched_train_step`.

    The minibatch index vector is sampled on-device and constrained to
    ``P(axis_name)``; XLA's SPMD partitioner propagates that sharding
    through the whole ELBO/gradient computation. ``batch_size`` must be a
    multiple of the mesh axis size.
    """
    static_kwargs = dict(static_kwargs or {})
    if batch_size % mesh.shape[axis_name] != 0:
        raise ValueError(
            f"batch_size={batch_size} not divisible by mesh axis "
            f"{axis_name}={mesh.shape[axis_name]}"
        )
    idx_sharding = NamedSharding(mesh, P(axis_name))

    @functools.partial(jax.jit, donate_argnums=(0,) if donate else ())
    def step(state, *args):
        next_key, k_idx, k_sample = jax.random.split(state.key, 3)
        idx = jax.random.choice(
            k_idx, num_points, shape=(batch_size,), replace=False
        )
        idx = jax.lax.with_sharding_constraint(idx, idx_sharding)
        loss, grads = _value_and_grad(
            lambda m: loss_fn(m, *args, idx=idx, key=k_sample,
                              **static_kwargs),
            state.model,
        )
        updates, opt_state = optimizer.update(grads, state.opt_state,
                                              state.model)
        model = optax.apply_updates(state.model, updates)
        if project is not None:
            model = project(model)
        return (
            state.replace(
                model=model, opt_state=opt_state, step=state.step + 1,
                key=next_key,
            ),
            loss,
        )

    return step
