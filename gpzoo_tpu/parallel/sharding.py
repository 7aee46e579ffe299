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


def _put_leaf(leaf, sharding):
    """Place one host/device array under ``sharding`` — multi-process
    safe: when the sharding spans non-addressable devices (a
    ``jax.distributed`` job), every process contributes its addressable
    pieces from the (process-identical) host value."""
    if sharding.is_fully_addressable:
        return jax.device_put(leaf, sharding)
    import numpy as np

    arr = np.asarray(leaf)
    return jax.make_array_from_callback(
        arr.shape, sharding, lambda idx: arr[idx]
    )


def put_sharded(tree, shardings):
    """``device_put`` a pytree under a matching shardings pytree (or one
    sharding for all leaves), multi-process safe."""
    if isinstance(shardings, jax.sharding.Sharding):
        return jax.tree_util.tree_map(
            lambda leaf: _put_leaf(leaf, shardings), tree
        )
    return jax.tree_util.tree_map(_put_leaf, tree, shardings)


def replicate(mesh, tree):
    """Place a pytree fully replicated on ``mesh``."""
    return put_sharded(tree, NamedSharding(mesh, P()))


def shard_columns(mesh, array, axis_name="data"):
    """Place a (D, N) matrix with columns sharded over the mesh axis —
    used for the counts matrix y so each chip holds only its spots."""
    spec = [None] * array.ndim
    spec[-1] = axis_name
    return put_sharded(array, NamedSharding(mesh, P(*spec)))


# Per-factor parameter leaves: the L-batched inducing means (L, M), raw
# Choleskys (L, M, M) and kernel hyperparameters (L, 1, 1). Sharding these
# over a "factor" mesh axis is the tensor-parallel strategy of SURVEY.md
# §2.7 — L independent M×M Choleskys partitioned across chips when L×M³
# (plus Adam moments: ×3) exceeds one chip's HBM.
FACTOR_PARAM_NAMES = ("mu", "Lu_raw", "sigma", "lengthscale",
                      "V", "d_raw",  # LowRankWSVGP's (L, M, r) factor
                                     # and (L, M) diagonal
                      "prec", "prec_chol")  # NGDTrainState's per-factor
                                            # (L, M, M) precision pair


def _leaf_name(path):
    last = path[-1]
    if isinstance(last, jax.tree_util.GetAttrKey):
        return last.name
    if isinstance(last, jax.tree_util.DictKey):
        return str(last.key)
    return None


def factor_shardings(mesh, tree, num_factors, axis_name="factor",
                     param_names=FACTOR_PARAM_NAMES):
    """Sharding pytree for ``tree`` (a model or whole TrainState): leaves
    whose final attribute is in ``param_names`` AND whose leading dim is
    ``num_factors`` get ``P(axis_name, None, ...)``; everything else is
    replicated.

    Because optax's Adam moments mirror the model pytree (their leaf paths
    end in the model attribute names), passing a TrainState shards the
    (L, M, M) first/second moments identically — at the north-star shape
    that is 3 × 720 MB of per-factor state partitioned instead of
    replicated.
    """
    rep = NamedSharding(mesh, P())

    def spec(path, leaf):
        shape = getattr(leaf, "shape", ())
        dtype = getattr(leaf, "dtype", None)
        if (
            _leaf_name(path) in param_names
            and len(shape) >= 1
            and shape[0] == num_factors
            and dtype is not None
            and jnp.issubdtype(dtype, jnp.inexact)
        ):
            return NamedSharding(
                mesh, P(axis_name, *([None] * (len(shape) - 1)))
            )
        return rep

    return jax.tree_util.tree_map_with_path(spec, tree)


def shard_factor_params(mesh, state, num_factors, axis_name="factor",
                        param_names=FACTOR_PARAM_NAMES):
    """Place a TrainState with its per-factor leaves (model + Adam
    moments) sharded over ``axis_name`` and everything else replicated.
    Returns ``(state, shardings)``; pass ``shardings`` as
    ``state_shardings=`` to :func:`make_sharded_batched_train_step` so the
    updated state keeps the layout across steps."""
    shardings = factor_shardings(mesh, state, num_factors, axis_name,
                                 param_names)
    return put_sharded(state, shardings), shardings


def make_sharded_batched_train_step(loss_fn, optimizer, num_points,
                                    batch_size, mesh, axis_name="data",
                                    project=None, static_kwargs=None,
                                    donate=False, state_shardings=None):
    """Sharded analog of
    :func:`gpzoo_tpu.train.loop.make_batched_train_step`.

    The minibatch index vector is sampled on-device and constrained to
    ``P(axis_name)``; XLA's SPMD partitioner propagates that sharding
    through the whole ELBO/gradient computation. ``batch_size`` must be a
    multiple of the mesh axis size.

    ``state_shardings`` (optional): the sharding pytree of the input state
    (e.g. from :func:`shard_factor_params`), pinned as the output sharding
    so tensor-parallel parameter layouts survive the optimizer update
    instead of depending on XLA's propagation choices.

    ``axis_name`` may be a tuple of mesh axes — e.g.
    ``("hosts", "data")`` on a :func:`hybrid_mesh` — to partition the
    minibatch over their product: the outer (DCN) axis then carries real
    cross-host data parallelism and XLA routes the gradient reduction
    hierarchically (ICI within a host, DCN across).
    """
    static_kwargs = dict(static_kwargs or {})
    axes = (axis_name,) if isinstance(axis_name, str) else tuple(axis_name)
    n_way = 1
    for a in axes:
        n_way *= mesh.shape[a]
    if batch_size % n_way != 0:
        raise ValueError(
            f"batch_size={batch_size} not divisible by mesh axes "
            f"{axes}={n_way}"
        )
    idx_sharding = NamedSharding(mesh, P(axes))
    jit_kwargs = {}
    if donate:
        jit_kwargs["donate_argnums"] = (0,)
    if state_shardings is not None:
        jit_kwargs["out_shardings"] = (state_shardings,
                                       NamedSharding(mesh, P()))

    @functools.partial(jax.jit, **jit_kwargs)
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
