"""Spatial-autocorrelation metrics.

The reference ranks latent factors by Moran's I computed through squidpy
(``dims_autocorr``, utilities.py:131-156) — the library's main
model-quality metric. squidpy isn't a dependency here; :func:`morans_i`
implements the same statistic natively (row-normalized KNN weights, the
squidpy ``spatial_neighbors`` default of 6 neighbors) so factor ranking
works out of the box, and :func:`dims_autocorr` keeps the reference's
(idx, I) return contract.
"""

from __future__ import annotations

import numpy as np


def poisson_deviance(y, rate):
    """Mean per-entry Poisson deviance ``2[y log(y/μ) − (y − μ)]`` of
    counts ``y`` under a plug-in rate ``μ``.

    The held-out quality guard shared by ``bench.py`` and
    ``benchmarks/mggp_anatomy.py`` (one definition so "fast-but-wrong"
    means the same thing across workloads). jax-traceable; also accepts
    numpy arrays.
    """
    import jax.numpy as jnp

    d = 2.0 * (jnp.where(y > 0,
                         y * jnp.log(jnp.clip(y, min=1e-12) / rate),
                         0.0) - (y - rate))
    return jnp.mean(d)


def _knn_weights(coords, n_neighs=6):
    """Row-normalized symmetrized KNN adjacency (squidpy-style weights)."""
    coords = np.asarray(coords)
    n = coords.shape[0]
    d2 = (
        np.sum(coords**2, axis=1)[:, None]
        - 2.0 * coords @ coords.T
        + np.sum(coords**2, axis=1)[None, :]
    )
    np.fill_diagonal(d2, np.inf)
    nbr = np.argpartition(d2, n_neighs, axis=1)[:, :n_neighs]
    w = np.zeros((n, n), dtype=np.float64)
    rows = np.repeat(np.arange(n), n_neighs)
    w[rows, nbr.ravel()] = 1.0
    w = np.maximum(w, w.T)  # symmetrize (mutual neighbors counted once)
    row_sums = w.sum(axis=1, keepdims=True)
    row_sums[row_sums == 0] = 1.0
    return w / row_sums


def morans_i(values, coords=None, weights=None, n_neighs=6):
    """Moran's I of one or more variables over spatial coordinates.

    values: (N,) or (N, P); returns a scalar or (P,) array.
    I = (N/ΣW) · (zᵀ W z) / (zᵀ z) with z the centered variable.
    """
    v = np.asarray(values, dtype=np.float64)
    squeeze = v.ndim == 1
    if squeeze:
        v = v[:, None]
    if weights is None:
        weights = _knn_weights(coords, n_neighs=n_neighs)
    n = v.shape[0]
    z = v - v.mean(axis=0, keepdims=True)
    num = np.einsum("np,nm,mp->p", z, weights, z)
    den = np.sum(z * z, axis=0)
    i = (n / weights.sum()) * num / den
    return i[0] if squeeze else i


def dims_autocorr(factors, coords, sort=True, n_neighs=6):
    """Rank latent dimensions by Moran's I (utilities.py:131-156 contract):
    factors (N, L), coords (N, D) → (idx, I) with ``factors[:, idx]`` in
    decreasing spatial autocorrelation when ``sort=True``."""
    i_vals = morans_i(factors, coords, n_neighs=n_neighs)
    idx = np.argsort(-i_vals) if sort else np.arange(len(i_vals))
    return idx, i_vals[idx] if sort else i_vals


def best_match_correlation(true_components, factors):
    """Optimal without-replacement best-match Pearson correlation of each
    row of ``true_components`` against the rows of ``factors``.

    The factor-recovery metric for simulated workloads (e.g. the
    toy-image NMF dictionary, Fake_nmf.ipynb analog): returns one
    correlation per true component, each matched to a distinct factor
    by Hungarian assignment (maximizing the summed correlation) — unlike
    greedy matching, the result is independent of component order.
    Requires ``factors`` to have at least as many rows as
    ``true_components``.

    scipy provides the assignment solver (part of the ``data`` extra);
    without it the function falls back to greedy without-replacement
    matching in true-component order — the pre-round-3 behavior, which
    can under-report recovery when two true parts prefer the same
    factor.
    """
    try:
        from scipy.optimize import linear_sum_assignment
    except ImportError:
        linear_sum_assignment = None

    p = np.asarray(true_components, np.float64)
    f = np.asarray(factors, np.float64)
    if f.shape[0] < p.shape[0]:
        raise ValueError(
            f"need >= {p.shape[0]} factors to match without replacement, "
            f"got {f.shape[0]}"
        )
    p = p - p.mean(axis=1, keepdims=True)
    f = f - f.mean(axis=1, keepdims=True)
    corr = (p @ f.T) / (
        np.linalg.norm(p, axis=1)[:, None]
        * np.linalg.norm(f, axis=1)[None, :] + 1e-12
    )
    if linear_sum_assignment is not None:
        rows, cols = linear_sum_assignment(-corr)
        return corr[rows, cols]
    # greedy fallback (no scipy): best remaining factor per true
    # component, in order
    taken = np.zeros(f.shape[0], bool)
    out = np.empty(p.shape[0])
    for i in range(p.shape[0]):
        j = int(np.argmax(np.where(taken, -np.inf, corr[i])))
        taken[j] = True
        out[i] = corr[i, j]
    return out
