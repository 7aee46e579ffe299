"""Checkpoint / deterministic resume.

The reference checkpoints with notebook-level ``torch.save(state_dict)``
and never saves optimizer state (SURVEY.md §5). Here one artifact holds the
complete resume state — model pytree, optax state, step counter, PRNG key —
so a restored run continues bit-identically (same minibatch indices, same
sample noise).

Serialization is flax msgpack (``flax.serialization``): a single file,
no directory layout, restorable with only a template pytree of matching
structure.
"""

from __future__ import annotations

import os

import jax
from flax import serialization


def save_checkpoint(path, state):
    """Serialize a :class:`gpzoo_tpu.train.loop.TrainState` (or any pytree)
    to ``path``."""
    data = serialization.to_bytes(jax.device_get(state))
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(data)
    os.replace(tmp, path)
    return path


def restore_checkpoint(path, template):
    """Restore a pytree saved by :func:`save_checkpoint`; ``template`` must
    have the same structure (e.g. a freshly-built TrainState)."""
    with open(path, "rb") as f:
        data = f.read()
    return serialization.from_bytes(template, data)
