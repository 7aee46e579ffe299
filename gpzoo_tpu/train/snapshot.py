"""Periodic posterior snapshots during training.

The reference captures the GP posterior every ~10 steps inside its
notebook train loops and assembles the snapshots into factor-map
animations (Slideseq_NSF_newest_version.ipynb cells 36-39). Here the
equivalent is a host-side hook for :func:`make_scan_runner`'s
``on_chunk=`` slot: every chunk (= every ``chunk_size`` steps — pick 10
to match the reference cadence), it evaluates the latent posterior at a
fixed probe set of spots, logs summary percentiles to a
:class:`gpzoo_tpu.utils.MetricLogger`, and keeps the full (L, n_probe)
mean arrays for the animation artifact.

The snapshot forward compiles once (fixed probe shapes) and runs between
chunk dispatches, so the training step program itself is untouched.

Example producing the factor-evolution artifact:
``examples/nsf_snapshot_animation.py``.
"""

from __future__ import annotations

import numpy as np

import jax


class PosteriorSnapshotter:
    """``on_chunk`` callback capturing qF posterior snapshots.

    Parameters
    ----------
    x_probe : (n_probe, dim) probe spot coordinates (keep n_probe modest —
        the snapshot forward is an extra device program per chunk).
    groups : optional (n_probe,) group labels for MGGP priors.
    every : capture every ``every``-th chunk (default 1 — every chunk).
    logger : optional :class:`gpzoo_tpu.utils.MetricLogger`; each snapshot
        appends a record with qF mean/scale percentiles.
    keep_arrays : keep full (L, n_probe) posterior means in ``history``
        (the animation frames); set False for long runs where only the
        logged percentiles matter.
    """

    def __init__(self, x_probe, groups=None, every=1, logger=None,
                 keep_arrays=True):
        import jax.numpy as jnp

        self.x_probe = jnp.asarray(x_probe)
        self.groups = None if groups is None else jnp.asarray(groups)
        self.every = int(every)
        self.logger = logger
        self.keep_arrays = keep_arrays
        self.history = []  # list of (step, mean (L, n_probe) np.ndarray)
        self.records = []  # list of dict summaries
        self._chunks = 0
        self._fwd = jax.jit(self._forward)

    @staticmethod
    def _forward(gp, x, groups):
        from gpzoo_tpu.predict import latent_posterior

        return latent_posterior(gp, x, groups=groups)

    def __call__(self, state, losses):
        self._chunks += 1
        if self._chunks % self.every:
            return
        model = state.model
        gp = model.prior if hasattr(model, "prior") else model.gp
        mean, scale = self._fwd(gp, self.x_probe, self.groups)
        mean = np.asarray(mean)
        scale = np.asarray(scale)
        step = int(state.step)
        rec = {
            "step": step,
            "loss": float(np.asarray(losses)[-1]),
            "qf_mean_p05": float(np.percentile(mean, 5)),
            "qf_mean_p50": float(np.percentile(mean, 50)),
            "qf_mean_p95": float(np.percentile(mean, 95)),
            "qf_scale_p50": float(np.percentile(scale, 50)),
            "qf_scale_p95": float(np.percentile(scale, 95)),
        }
        self.records.append(rec)
        if self.logger is not None:
            self.logger.log(**rec)
        if self.keep_arrays:
            self.history.append((step, mean))

    def save(self, path):
        """Persist the animation frames + records to an ``.npz``."""
        steps = np.asarray([s for s, _ in self.history], np.int64)
        frames = np.stack([m for _, m in self.history]) if self.history \
            else np.zeros((0,))
        np.savez_compressed(path, steps=steps, frames=frames)
        return path
