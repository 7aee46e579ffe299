"""Jitted training steps and reference-shaped training loops.

The reference trains with a host Python loop issuing one op at a time
(``utilities.py:471-632``). Here the entire step — minibatch index
sampling, forward, ELBO, gradients, optimizer update, post-step projection
— is one jitted function of an immutable :class:`TrainState`, and
:func:`make_scan_runner` additionally fuses K steps into a single
``lax.scan`` program so long runs pay one dispatch per chunk instead of per
step.

Reference idioms and their equivalents here:

* ``requires_grad`` flipping (freezing Z / kernel hyperparams,
  ``Slideseq_NSF_newest_version.ipynb (cell 25)``) →
  :func:`trainable_mask` + :func:`partition_optimizer` (optax
  ``multi_transform`` with ``set_to_zero`` on frozen leaves; no retracing).
* post-step ``model.W.data.clamp_(min=0)`` (utilities.py:523-524, 623) →
  :func:`clamp_nonnegative` passed as the step's ``project`` hook.
* ``torch.multinomial(ones(N), B, replacement=False)`` (utilities.py:605)
  → ``jax.random.choice(key, N, (B,), replace=False)`` *inside* the jitted
  step.
"""

from __future__ import annotations

import functools

from typing import Any, Callable, Sequence

import jax
import jax.numpy as jnp
import optax
from flax import struct


@struct.dataclass
class TrainState:
    model: Any
    opt_state: Any
    step: Any  # int32 scalar
    key: Any  # PRNG key

    @classmethod
    def create(cls, model, optimizer, key):
        return cls(
            model=model,
            opt_state=optimizer.init(model),
            step=jnp.asarray(0, jnp.int32),
            # Defensive copy: donating the TrainState (make_scan_runner
            # donate=True) would otherwise delete the CALLER's key buffer
            # — a later jax.random call on it raises an opaque backend
            # error. Copying the few bytes here makes the common
            # "create state, keep using my key" pattern safe. (The model
            # buffers are intentionally NOT copied — they are exactly
            # what donation is for.)
            key=jnp.copy(key),
        )


# --------------------------------------------------------------------------
# Trainability masks (the `requires_grad` replacement)
# --------------------------------------------------------------------------

def _path_str(path):
    parts = []
    for p in path:
        if isinstance(p, jax.tree_util.GetAttrKey):
            parts.append(p.name)
        elif isinstance(p, jax.tree_util.DictKey):
            parts.append(str(p.key))
        elif isinstance(p, jax.tree_util.SequenceKey):
            parts.append(str(p.idx))
        else:
            parts.append(str(p))
    return ".".join(parts)


def trainable_mask(model, trainable: Callable[[str], bool]):
    """Boolean pytree with the same structure as ``model``; ``trainable``
    receives dotted paths like ``"prior.kernel.lengthscale"``."""
    return jax.tree_util.tree_map_with_path(
        lambda path, _: bool(trainable(_path_str(path))), model
    )


def partition_optimizer(optimizer, mask):
    """Wrap ``optimizer`` so leaves masked False receive zero updates.

    Non-float leaves (e.g. MGGP ``groupsZ`` labels) are force-frozen
    regardless of the mask — momentum-style optimizers would otherwise
    promote their integer state to float (breaking scan carries).

    Labels are produced by a function of the params (not a bare pytree):
    the labels pytree is model-shaped, and model dataclasses define
    ``__call__``, which ``optax.multi_transform`` would mistake for a
    label factory.
    """

    def labels(params):
        return jax.tree_util.tree_map(
            lambda m, p: "train"
            if (m and jnp.issubdtype(jnp.asarray(p).dtype, jnp.inexact))
            else "freeze",
            mask,
            params,
        )

    return optax.multi_transform(
        {"train": optimizer, "freeze": optax.set_to_zero()}, labels
    )


def apply_stop_gradient(model, mask):
    """``lax.stop_gradient`` on leaves masked False.

    Complements :func:`partition_optimizer`: the optimizer mask only zeroes
    *updates*, so XLA still differentiates through the frozen leaves'
    computations. Stopping gradients at the leaves lets XLA prune those
    backward branches entirely — for the north-star NSF run (kernel
    hyperparams + Z frozen, Slideseq notebook cells 25-26) this removes
    every transposed triangular solve from the step's backward pass.
    """
    return jax.tree_util.tree_map(
        lambda leaf, m: leaf if m else jax.lax.stop_gradient(leaf),
        model,
        mask,
    )


def freeze_loss(loss_fn, mask):
    """Wrap a loss so frozen leaves are stop-gradiented before the forward
    (use together with :func:`partition_optimizer` on the same mask)."""

    def wrapped(model, *args, **kwargs):
        return loss_fn(apply_stop_gradient(model, mask), *args, **kwargs)

    return wrapped


def clamp_nonnegative(model, field_names: Sequence[str] = ("W_raw", "W2_raw")):
    """Clamp the named leaf fields to ≥ 0 (post-step projection replicating
    utilities.py:523-524, 553-554, 623)."""
    names = tuple(field_names)

    def clamp(path, leaf):
        if _path_str(path).split(".")[-1] in names:
            return jnp.maximum(leaf, 0.0)
        return leaf

    return jax.tree_util.tree_map_with_path(clamp, model)


# --------------------------------------------------------------------------
# Step factories
# --------------------------------------------------------------------------

def _value_and_grad(loss, model):
    """value_and_grad over a model pytree that may hold integer leaves
    (e.g. MGGP ``groupsZ`` group labels — the reference's
    ``requires_grad=False`` buffers). Integer leaves get zero updates."""
    value, grads = jax.value_and_grad(loss, allow_int=True)(model)
    grads = jax.tree_util.tree_map(
        lambda g, p: g if jnp.issubdtype(jnp.asarray(p).dtype, jnp.inexact)
        else jnp.zeros_like(p),
        grads,
        model,
    )
    return value, grads


def make_train_step(loss_fn, optimizer, project=None, static_kwargs=None,
                    donate=False):
    """Build a jitted ``step(state, *args) → (state, loss)``.

    ``loss_fn(model, *args, key=subkey, **static_kwargs)`` must be a pure
    scalar loss. ``project`` (optional) maps the updated model to a
    projected model (e.g. :func:`clamp_nonnegative`).
    """
    static_kwargs = dict(static_kwargs or {})

    @functools.partial(jax.jit, donate_argnums=(0,) if donate else ())
    def step(state, *args):
        next_key, sub = jax.random.split(state.key)
        loss, grads = _value_and_grad(
            lambda m: loss_fn(m, *args, key=sub, **static_kwargs),
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


def make_batched_train_step(loss_fn, optimizer, num_points, batch_size,
                            project=None, static_kwargs=None, donate=False):
    """Like :func:`make_train_step`, but samples a without-replacement
    minibatch index vector inside the step (utilities.py:605) and passes it
    as ``loss_fn(model, *args, idx=idx, key=subkey, ...)``."""
    static_kwargs = dict(static_kwargs or {})

    @functools.partial(jax.jit, donate_argnums=(0,) if donate else ())
    def step(state, *args):
        next_key, k_idx, k_sample = jax.random.split(state.key, 3)
        idx = jax.random.choice(
            k_idx, num_points, shape=(batch_size,), replace=False
        )
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


def make_scan_runner(step_fn, chunk_size, donate=False, on_chunk=None):
    """Fuse ``chunk_size`` applications of a step into one compiled
    ``lax.scan`` program: ``runner(state, *args) → (state, losses[chunk])``.

    This is the TPU-throughput path: one dispatch and one host sync per
    chunk. ``step_fn`` must be the *unjitted* shape ``(state, *args) →
    (state, loss)`` (the functions returned by the factories above work —
    nesting jit is harmless).

    ``on_chunk`` (optional): a host callback ``on_chunk(state, losses)``
    invoked after each compiled chunk with the post-chunk state — the
    periodic-snapshot hook replacing the reference's every-10-steps
    posterior captures for training animations
    (Slideseq_NSF_newest_version.ipynb cells 36-39); see
    :class:`gpzoo_tpu.train.snapshot.PosteriorSnapshotter`. The callback
    runs between device dispatches (one per chunk), so it does not
    perturb the compiled step."""

    @functools.partial(jax.jit, donate_argnums=(0,) if donate else ())
    def jitted(state, *args):
        def body(carry, _):
            new_state, loss = step_fn(carry, *args)
            return new_state, loss

        return jax.lax.scan(body, state, None, length=chunk_size)

    if on_chunk is None:
        return jitted

    def runner(state, *args):
        state, losses = jitted(state, *args)
        on_chunk(state, losses)
        return state, losses

    return runner


# --------------------------------------------------------------------------
# Reference-shaped loops (host-driven, loss history returned)
# --------------------------------------------------------------------------

def _run_loop(step, state, args, steps):
    losses = []
    for _ in range(steps):
        state, loss = step(state, *args)
        losses.append(loss)
    return state, [float(l) for l in jax.device_get(losses)]


def train(state, optimizer_step, x, y, steps=200):
    """Full-batch loop (utilities.py:471-493): ``optimizer_step`` from
    :func:`make_train_step` over :func:`gpzoo_tpu.train.elbo.negative_elbo`."""
    return _run_loop(optimizer_step, state, (x, y), steps)


def train_batched(state, optimizer_step, x, y, steps=200):
    """Minibatch loop (utilities.py:600-632): ``optimizer_step`` from
    :func:`make_batched_train_step`; index sampling happens on-device."""
    return _run_loop(optimizer_step, state, (x, y), steps)


train_hybrid = train
train_hybrid_batched = train_batched


def train_closure_batched(state, optimizer_step, x, y, steps=200):
    """Reference ``train_closure_batched`` (utilities.py:566-596) exists to
    serve closure-style optimizers (LBFGS). optax's LBFGS consumes plain
    ``(value, grad)`` pairs, so the same jitted step shape works; this alias
    documents the mapping."""
    return _run_loop(optimizer_step, state, (x, y), steps)
