"""Panel-blocked triangular contractions (pure XLA).

The north-star step's dominant FLOPs multiply structural zeros: the
variational Cholesky factor Lu is lower-triangular, but XLA's einsum
cannot exploit that — `c = Luᵀã` and the KL trace `tr(K⁻¹ Lu Luᵀ)` run
as dense contractions. Cutting the M axis into P panels and skipping the
strictly-upper panel pairs recovers most of the triangular saving with
plain XLA dots, which keeps every property the fast path relies on
(float64 parity on CPU, autodiff, vmap/shard_map, no Mosaic surface):

    FLOPs(c)      → (P+1)/2P of dense      (P=6: 58%)
    FLOPs(trace)  → ≈ Σ (P−p)²/P³ of dense (P=4: 47%)

Measured on v5e at the north-star shape (L=20, M=3000, B=7000), mean of
chained jitted calls (see benchmarks/pallas_ab.py):

    sq-colsum fwd        : dense 17.8 ms → blocked(P=6) 11.6 ms
    sq-colsum fwd+bwd(Lu): dense 47.6 ms → blocked(P=6) 26.6 ms

A Pallas tile-skipping kernel of the same contraction
(`ops/tri_pallas.py`) only ties dense XLA (~17 ms — per-grid-step
overhead eats the skip), so this blocked XLA form is the production
path; the Pallas kernel is kept measured-but-off, like the Gram kernels.

Values equal the dense einsum up to float reassociation (the panel sums
reassociate the k-reduction); same matmul precision class as the dense
call sites (caller's default).
"""

from __future__ import annotations

import jax.numpy as jnp

# Panel count for the M (inducing points) axis. Diminishing returns past
# ~6 (measured: P=6 edges P=4/P=8 on v5e); more panels = more dispatches.
PANELS = 6

# Below this M the contraction is dispatch-bound and blocking only adds
# launches (also keeps tiny CPU test shapes on the single-dot path).
MIN_DIM = 1024


def _bounds(m, panels):
    edges = [round(m * p / panels) for p in range(panels + 1)]
    return [(s, e) for s, e in zip(edges[:-1], edges[1:]) if e > s]


def tri_sq_colsum(lu, a, panels=None):
    """Σ_m (Σ_k lu[..., k, m] a[..., k, b])² — the posterior-variance
    term colsum((Luᵀã)²) — skipping the strictly-upper (k < m) panels of
    the lower-triangular lu.

    lu: (..., M, M) lower-triangular; a: (..., M, B) broadcast-compatible
    in the leading dims (the shared-kernel fast path passes lu (L, M, M)
    with a (M, B)). Returns (..., B) like
    ``jnp.sum(jnp.square(jnp.einsum("...km,...kn->...mn", lu, a)), -2)``
    up to reassociation roundoff.
    """
    m_dim = lu.shape[-1]
    if panels is None:
        panels = PANELS if m_dim >= MIN_DIM else 1
    if panels <= 1:
        c = jnp.einsum("...km,...kn->...mn", lu, a)
        return jnp.sum(jnp.square(c), axis=-2)
    out = None
    for s, e in _bounds(m_dim, panels):
        # output rows m ∈ [s, e) only see k ≥ s
        c_p = jnp.einsum("...km,...kn->...mn",
                         lu[..., s:, s:e], a[..., s:, :])
        term = jnp.sum(jnp.square(c_p), axis=-2)
        out = term if out is None else out + term
    return out


def tri_kl_trace(k_inv, lu, panels=None):
    """tr(K⁻¹ Lu Luᵀ) per leading batch index, panel-blocked: column
    panel k ∈ [s, e) of the lower-triangular Lu only touches the
    trailing (M−s)×(M−s) block of K⁻¹ — ≈ 1/3 of the dense FLOPs.

    k_inv: (M, M) shared or (L, M, M) per-factor; lu: (L, M, M) or
    (M, M). Returns (L,), identical to the dense einsum
    ``einsum("[l]ij,ljk,lik->l", k_inv, lu, lu)`` up to reassociation.
    """
    lu_l = lu if lu.ndim == 3 else lu[None]
    spec = "lij,ljk,lik->l" if k_inv.ndim == 3 else "ij,ljk,lik->l"
    if k_inv.ndim == 3 and lu_l.shape[0] != k_inv.shape[0]:
        lu_l = jnp.broadcast_to(lu_l, k_inv.shape)
    m_dim = lu_l.shape[-1]
    if panels is None:
        panels = PANELS if m_dim >= MIN_DIM else 1
    if panels <= 1:
        return jnp.einsum(spec, k_inv, lu_l, lu_l)
    out = None
    for s, e in _bounds(m_dim, panels):
        term = jnp.einsum(spec, k_inv[..., s:, s:],
                          lu_l[:, s:, s:e], lu_l[:, s:, s:e])
        out = term if out is None else out + term
    return out


def tri_matmul(w, rhs, panels=None):
    """``W @ rhs`` with W (..., M, M) lower-triangular, panel-blocked:
    output row panel [s, e) only reads rhs rows k < e, skipping the
    strictly-upper structural zeros — ≈ (P+1)/2P of the dense FLOPs.

    The per-chunk projection matmul of the per-factor W-form fast path
    (``a = W Kzx`` with W = Lzz⁻¹). rhs: (..., M, B); returns (..., M, B)
    equal to the dense einsum up to reassociation.
    """
    m_dim = w.shape[-1]
    if panels is None:
        panels = PANELS if m_dim >= MIN_DIM else 1
    if panels <= 1:
        return jnp.einsum("...ik,...kb->...ib", w, rhs)
    parts = [
        jnp.einsum("...ik,...kb->...ib", w[..., s:e, :e], rhs[..., :e, :])
        for s, e in _bounds(m_dim, panels)
    ]
    return jnp.concatenate(parts, axis=-2)


def tri_tri_matmul(w, lu, panels=None):
    """``C = W @ Lu`` with BOTH factors (..., M, M) lower-triangular —
    C is lower-triangular; row panel [s, e) of C only touches the leading
    e×e blocks of both factors (≈ 1/3 of dense FLOPs).

    The per-factor fast path computes C = Lzz⁻¹ Lu once per step: the KL
    trace is ‖C‖²_F and the chunk variance term is colsum((Cᵀ a)²) via
    :func:`tri_sq_colsum` — the whitening factor materialized explicitly,
    so no per-chunk ã = K⁻¹Kzx matmul is needed.
    """
    m_dim = w.shape[-1]
    if panels is None:
        panels = PANELS if m_dim >= MIN_DIM else 1
    if panels <= 1:
        return jnp.tril(jnp.einsum("...ik,...kj->...ij", w, lu))
    batch = jnp.broadcast_shapes(w.shape[:-2], lu.shape[:-2])
    parts = []
    for s, e in _bounds(m_dim, panels):
        blk = jnp.einsum("...ik,...kj->...ij",
                         w[..., s:e, :e], lu[..., :e, :e])
        if s == 0:
            blk = jnp.tril(blk)
        else:
            # rows s..e: tril boundary sits inside the leading e columns
            row = jnp.arange(s, e)[:, None]
            col = jnp.arange(e)[None, :]
            blk = jnp.where(col <= row, blk, 0.0)
        pad = jnp.zeros(batch + (e - s, m_dim - e), blk.dtype)
        parts.append(jnp.concatenate(
            [jnp.broadcast_to(blk, batch + blk.shape[-2:]), pad], axis=-1))
    return jnp.concatenate(parts, axis=-2)


def tri_t_matmul_b(w, rhs, panels=None):
    """``Wᵀ @ rhs`` for lower-triangular W, panel-blocked: output row
    panel [s, e) only reads rhs rows k ≥ s (Wᵀ is upper-triangular).

    History: ``cholesky_inverse_mm``'s backward was first built on this
    family (Wᵀ dW, Lᵀ L̄, Wᵀ Φ) but the concat assembly OOM'd at the MGGP
    full scale — concatenate holds the parts AND the result live
    (+90 MB over the 15.75 GB HBM budget). The VJP now uses
    ``linalg._panel_bwd_products`` (dynamic-update-slice assembly, fits)
    when the backward runs at HIGHEST where the FLOP skip wins 1.22×,
    and dense einsums at bf16 where it measured a wash (0.98×) —
    docs/PERFORMANCE.md. This concat version stays for shapes with
    headroom, verified in tests/test_ops.py."""
    m_dim = w.shape[-1]
    if panels is None:
        panels = PANELS if m_dim >= MIN_DIM else 1
    if panels <= 1:
        return jnp.einsum("...ki,...kb->...ib", w, rhs)
    parts = [
        jnp.einsum("...ki,...kb->...ib", w[..., s:, s:e], rhs[..., s:, :])
        for s, e in _bounds(m_dim, panels)
    ]
    return jnp.concatenate(parts, axis=-2)


def matmul_tri(a, w, panels=None):
    """``A @ W`` for lower-triangular W: output column panel [s, e) only
    reads A columns l ≥ s."""
    m_dim = w.shape[-1]
    if panels is None:
        panels = PANELS if m_dim >= MIN_DIM else 1
    if panels <= 1:
        return jnp.einsum("...il,...lj->...ij", a, w)
    parts = [
        jnp.einsum("...il,...lj->...ij", a[..., s:], w[..., s:, s:e])
        for s, e in _bounds(m_dim, panels)
    ]
    return jnp.concatenate(parts, axis=-1)


def matmul_tri_t(a, w, panels=None):
    """``A @ Wᵀ`` for lower-triangular W: output column panel [s, e) only
    reads A columns l < e (Wᵀ is upper-triangular)."""
    m_dim = w.shape[-1]
    if panels is None:
        panels = PANELS if m_dim >= MIN_DIM else 1
    if panels <= 1:
        return jnp.einsum("...il,...jl->...ij", a, w)
    parts = [
        jnp.einsum("...il,...jl->...ij", a[..., :, :e], w[..., s:e, :e])
        for s, e in _bounds(m_dim, panels)
    ]
    return jnp.concatenate(parts, axis=-1)
