"""Shared tunnel-safe timing helpers for the benchmark harnesses.

`block_until_ready` under-syncs through the axon TPU tunnel — always
chain dispatches and fetch a scalar value at the end
(docs/PERFORMANCE.md timing note). One copy of the pattern, imported by
mggp_anatomy.py / vnngp_anatomy.py / pallas_ab.py-style harnesses.
"""

from __future__ import annotations

import sys
import time

import numpy as np

import jax
import jax.numpy as jnp


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def _fetch(out):
    leaf = jax.tree_util.tree_leaves(out)[0]
    np.asarray(jax.device_get(jnp.ravel(leaf)[0]))


def _timeit(fn, *args, iters=4, warmup=1, jit=True):
    jfn = jax.jit(fn) if jit else fn
    out = jfn(*args)  # compile
    _fetch(out)
    for _ in range(warmup):
        out = jfn(*args)
    _fetch(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = jfn(*args)
    _fetch(out)
    return (time.perf_counter() - t0) / iters * 1e3


def copy_model(model):
    """Fresh device buffers for every array leaf — needed before handing
    a model to a donating scan runner when the original must stay live
    for a later leg (the runner donates the TrainState, which shares the
    model's device arrays). Canonical implementation:
    ``gpzoo_tpu.utils.copy_arrays``."""
    from gpzoo_tpu.utils import copy_arrays

    return copy_arrays(model)
