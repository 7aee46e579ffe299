"""Observability: profiling, metric logging, numerical tripwires.

The reference's only instrumentation is ad-hoc ``%time`` cells, per-step
``loss.item()`` lists, and leftover ``verbose=True`` prints (SURVEY.md §5).
This module provides the structured equivalents:

* :func:`profile_trace` — ``jax.profiler`` trace capture around a block
  (view with TensorBoard or xprof).
* :class:`MetricLogger` — step/loss/rate series with optional JSONL sink;
  the structured replacement for the reference's ``losses.append(...)``.
* :func:`find_nonfinite` / :func:`debug_nans` — NaN/Inf tripwires around
  the Cholesky-heavy paths (SURVEY.md §5 "race detection / sanitizers"
  equivalent: ``jax_debug_nans`` + pytree inspection).
"""

from __future__ import annotations

import contextlib
import json
import time

import jax
import jax.numpy as jnp
import numpy as np


@contextlib.contextmanager
def profile_trace(log_dir="/tmp/gpzoo_tpu_trace"):
    """Capture a profiler trace for the enclosed block.

    with profile_trace("/tmp/tr"):
        state, losses = runner(state, x, y)
        jax.block_until_ready(losses)
    """
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


class MetricLogger:
    """Scalar series logger: ELBO/KL/steps-per-sec per step or chunk.

    Keeps everything in memory (``.history``) and optionally appends JSONL
    records to ``path``. Host-side only; call it with already-fetched
    floats (e.g. once per scan chunk, not per step, to avoid syncs).
    """

    def __init__(self, path=None):
        self.path = path
        self.history = []
        self._t0 = time.perf_counter()
        self._last_step = 0

    def log(self, step, **scalars):
        now = time.perf_counter()
        rec = {"step": int(step), "wall": now - self._t0}
        if step > self._last_step:
            rec["steps_per_sec"] = (step - self._last_step) / max(
                now - getattr(self, "_last_time", self._t0), 1e-9
            )
        self._last_step = int(step)
        self._last_time = now
        for k, v in scalars.items():
            rec[k] = float(v)
        self.history.append(rec)
        if self.path:
            with open(self.path, "a") as f:
                f.write(json.dumps(rec) + "\n")
        return rec

    def losses(self, key="loss"):
        return [r[key] for r in self.history if key in r]


def find_nonfinite(tree, prefix=""):
    """Paths of leaves containing NaN/Inf — inspect a model or gradient
    pytree after a suspect step."""
    bad = []

    def visit(path, leaf):
        arr = np.asarray(jax.device_get(leaf))
        if np.issubdtype(arr.dtype, np.floating) and not np.all(
            np.isfinite(arr)
        ):
            name = jax.tree_util.keystr(path)
            bad.append(f"{prefix}{name}")
        return leaf

    jax.tree_util.tree_map_with_path(visit, tree)
    return bad


@contextlib.contextmanager
def debug_nans(enable=True):
    """Temporarily enable jax_debug_nans (fail fast inside jit at the op
    that produced the first NaN — e.g. a Cholesky on a non-PSD Gram)."""
    prev = jax.config.read("jax_debug_nans")
    jax.config.update("jax_debug_nans", enable)
    try:
        yield
    finally:
        jax.config.update("jax_debug_nans", prev)


def assert_finite(tree, name="tree"):
    bad = find_nonfinite(tree)
    if bad:
        raise FloatingPointError(f"non-finite values in {name}: {bad}")


def tree_size_bytes(tree):
    """Total parameter bytes of a pytree (capacity planning helper)."""
    return sum(
        np.asarray(x).nbytes
        for x in jax.tree_util.tree_leaves(tree)
        if hasattr(x, "dtype")
    )


def copy_arrays(tree):
    """Fresh device buffers for every array leaf of a pytree.

    The donation-safe copy: needed before handing a model/state to a
    buffer-donating step or scan runner when the original arrays must
    stay live for a later use (a second bench leg, a module-scope test
    fixture, ...). One canonical copy of the pattern — bench.py, the
    benchmark harnesses (benchmarks/_timing.py) and the sharding tests
    all import this."""
    return jax.tree_util.tree_map(
        lambda a: jnp.copy(a) if hasattr(a, "dtype") else a, tree)
