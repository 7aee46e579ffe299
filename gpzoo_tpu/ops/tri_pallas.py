"""Tile-skipping triangular matmul Pallas kernels for the NSF fast path.

The dominant op of the north-star training step (docs/PERFORMANCE.md,
"Remaining step anatomy") is the L-batched contraction against the
variational Cholesky factor

    c[l, m, b] = Σ_k Lu[l, k, m] · ã[k, b]        (c = Luᵀ ã per factor)

with Lu lower-triangular — half of a dense matmul's FLOPs multiply
structural zeros, and XLA cannot exploit the triangularity. Worse, in the
precomputed-projection path XLA compiles the *backward* dLu = ã·hᵀ dot
into a ~45 ms fusion (vs ~20 ms for the same math inside the scan path).

This kernel iterates only the lower-triangular (m, k) tile pairs — the
pair list is passed as scalar-prefetch tables so the grid contains no
skipped iterations — with bf16 MXU tiles and float32 accumulation (the
same precision class as XLA's default-precision einsum on this op; the
result feeds the posterior *variance*, where bf16 error is a ~1% squared
term — see the precision-policy note in docs/PERFORMANCE.md).

STATUS — measured, not dispatched. At the north-star shape (L=20,
M=3000, B=7000, v5e) the kernel only TIES dense XLA (17.1 vs 17.8 ms
fwd): ~1.5 µs of per-grid-step overhead eats the 2× FLOP skip at
MXU-saturating tile sizes (5 880 grid steps × 1.4 µs MXU each), and
larger tiles exceed VMEM. The production triangular saving comes from
panel-blocked XLA instead (ops/tri_blocked.py: 11.6 ms fwd, 26.6 vs
47.6 ms fwd+bwd), which the fast path calls directly. The kernel is kept
correct, differentiable (custom VJP: dLu via the panel-blocked form,
tril-masked — exact for tril-consumed lu; dã dead-code-eliminated when
ã is a constant) and verified on device by benchmarks/pallas_ab.py, as
the substrate for future Mosaic tuning.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# MXU tile sizes. (TM, TK) tile the two M axes, TB the spot axis.
_TM = 512
_TK = 512
_TB = 1024


def _cdiv(a, b):
    return -(-a // b)


def _tri_pairs(nm, nk):
    """(m, k) tile pairs with k ≥ m, m-major k-ascending."""
    pairs = [(m, k) for m in range(nm) for k in range(m, nk)]
    m_tab = np.asarray([p[0] for p in pairs], np.int32)
    k_tab = np.asarray([p[1] for p in pairs], np.int32)
    return m_tab, k_tab


def _mask_rows(t, valid):
    """Zero rows ≥ valid. (Unconditional — ``lax.cond`` around tile masks
    hangs the Mosaic compiler; the select is VPU-cheap and overlaps MXU.)"""
    rows = jax.lax.broadcasted_iota(jnp.int32, t.shape, 0)
    return jnp.where(rows < valid, t, jnp.zeros_like(t))



# ---------------------------------------------------------------------------
# Forward: c[l, m, b] = Σ_{k≥m} lu[l, k, m] a[k, b]
# ---------------------------------------------------------------------------

def _fwd_kernel(m_tab, k_tab, lu_ref, a_ref, out_ref, acc,
                *, nk, tk, m_dim, out_dtype):
    t = pl.program_id(2)
    m_idx = m_tab[t]
    k_idx = k_tab[t]

    lu_t = lu_ref[0]  # (TK, TM) bf16
    a_t = a_ref[:]    # (TK, TB) bf16
    if m_dim % tk:
        # K-edge tile: rows beyond m_dim are out-of-bounds garbage in BOTH
        # operands (garbage × 0 would still be NaN-unsafe) — zero them.
        # valid = full tile except on the last k tile.
        valid = jnp.where(k_idx == nk - 1, m_dim - (nk - 1) * tk, tk)
        lu_t = _mask_rows(lu_t, valid)
        a_t = _mask_rows(a_t, valid)

    # precision pinned: an ambient default_matmul_precision("highest")
    # context would otherwise force an fp32-contract on the bf16 tiles,
    # which Mosaic rejects ("Bad lhs type")
    prod = jax.lax.dot_general(
        lu_t, a_t, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.DEFAULT,
    )

    @pl.when(k_idx == m_idx)
    def _():
        acc[:] = prod

    @pl.when(k_idx != m_idx)
    def _():
        acc[:] += prod

    @pl.when(k_idx == nk - 1)
    def _():
        out_ref[0] = acc[:].astype(out_dtype)


def _fwd_impl(lu_bf, a_bf, out_dtype, interpret=False,
              tm=None, tk=None, tb=None):
    l_dim, m_dim, _ = lu_bf.shape
    b_dim = a_bf.shape[1]
    tm, tk, tb = tm or _TM, tk or _TK, tb or _TB
    nm, nk, nb = _cdiv(m_dim, tm), _cdiv(m_dim, tk), _cdiv(b_dim, tb)
    assert tm == tk, "triangular skip assumes square (m, k) tiling"
    m_tab, k_tab = _tri_pairs(nm, nk)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(nb, l_dim, len(m_tab)),
        in_specs=[
            pl.BlockSpec((1, tk, tm),
                         lambda b, l, t, mt, kt: (l, kt[t], mt[t]),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tk, tb),
                         lambda b, l, t, mt, kt: (kt[t], b),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tm, tb),
                               lambda b, l, t, mt, kt: (l, mt[t], b),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((tm, tb), jnp.float32)],
    )
    return pl.pallas_call(
        functools.partial(_fwd_kernel, nk=nk, tk=tk, m_dim=m_dim,
                          out_dtype=out_dtype),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((l_dim, m_dim, b_dim), out_dtype),
        interpret=interpret,
    )(m_tab, k_tab, lu_bf, a_bf)


# ---------------------------------------------------------------------------
# Public op
# ---------------------------------------------------------------------------

@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5))
def tri_t_matmul(lu, a, interpret=False, tm=None, tk=None, tb=None):
    """c = einsum("lkm,kb->lmb", lu, a) for lower-triangular lu, skipping
    the strictly-upper (k < m) tile pairs.

    lu: (L, M, M) lower-triangular float32; a: (M, B) float32 shared
    across L. Operands run on the MXU as bfloat16 with float32
    accumulation (the dispatching call sites run this contraction at
    default = bf16 matmul precision already).

    Gradient contract: lu is treated as STRUCTURALLY lower-triangular —
    the returned dlu is tril(dense-grad). Identical to autodiff through
    any tril-consuming parameterization (the `lower_cholesky` bijector's
    VJP masks the same entries); differs from the dense einsum's grad
    only in the strictly-upper entries that multiply structural zeros.
    """
    lu_bf = lu.astype(jnp.bfloat16)
    a_bf = a.astype(jnp.bfloat16)
    return _fwd_impl(lu_bf, a_bf, jnp.float32, interpret, tm, tk, tb)


def _tri_fwd(lu, a, interpret, tm, tk, tb):
    out = tri_t_matmul(lu, a, interpret, tm, tk, tb)
    return out, (lu, a)


def _tri_bwd(interpret, tm, tk, tb, res, g):
    """Backward in panel-blocked XLA (ops/tri_blocked.py rationale): the
    per-panel dots skip the strictly-upper panels and avoid the
    monolithic-fusion pathology. (A Pallas dlu kernel was tried and
    removed — Mosaic rejects its bf16 masked-operand layout at edge
    shapes, and blocked XLA matches its projected rate anyway.)"""
    from gpzoo_tpu.ops.tri_blocked import MIN_DIM, PANELS, _bounds

    lu, a = res
    m_dim = lu.shape[-1]
    dlu_parts = []
    da = None
    for s, e in _bounds(m_dim, PANELS if m_dim >= MIN_DIM else 1):
        # c rows m ∈ [s, e) touch only k ≥ s
        dlu_p = jnp.einsum("kb,lmb->lkm", a[s:], g[:, s:e])  # (L, M−s, T)
        dlu_parts.append((s, e, dlu_p))
        da_p = jnp.einsum("lkm,lmb->kb", lu[:, s:, s:e], g[:, s:e])
        pad = jnp.zeros((s,) + da_p.shape[1:], da_p.dtype)
        da_p = jnp.concatenate([pad, da_p], axis=0) if s else da_p
        da = da_p if da is None else da + da_p
    cols = [
        jnp.pad(p, ((0, 0), (s, 0), (0, 0)))
        for s, e, p in dlu_parts
    ]
    dlu = jnp.tril(jnp.concatenate(cols, axis=-1))
    return dlu, da


tri_t_matmul.defvjp(_tri_fwd, _tri_bwd)


# ---------------------------------------------------------------------------
# Fused c² variant: out[l, b] = Σ_m (Σ_{k≥m} lu[l, k, m] a[k, b])²
# ---------------------------------------------------------------------------

def _fused_kernel(m_tab, k_tab, lu_ref, a_ref, out_ref, acc_c, acc_o,
                  *, nm, nk, tm, tk, m_dim, n_pairs):
    """Same tile-skipping grid as ``tri_t_matmul``, but each completed
    c-tile is squared and column-summed into a (1, TB) accumulator in
    VMEM — the (L, M, B) c tensor never reaches HBM (the round-2 verdict's
    "fused c2" lever: ~3.4 GB/step of write+read traffic)."""
    t = pl.program_id(2)
    m_idx = m_tab[t]
    k_idx = k_tab[t]

    lu_t = lu_ref[0]
    a_t = a_ref[:]
    if m_dim % tk:
        valid = jnp.where(k_idx == nk - 1, m_dim - (nk - 1) * tk, tk)
        lu_t = _mask_rows(lu_t, valid)
        a_t = _mask_rows(a_t, valid)

    prod = jax.lax.dot_general(
        lu_t, a_t, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.DEFAULT,
    )

    @pl.when(k_idx == m_idx)
    def _():
        acc_c[:] = prod

    @pl.when(k_idx != m_idx)
    def _():
        acc_c[:] += prod

    @pl.when(k_idx == nk - 1)
    def _():
        # c-tile for row block m complete: fold its squares into the
        # output accumulator. Rows beyond m_dim on the last m tile are
        # garbage — mask before squaring.
        c_t = acc_c[:]
        if m_dim % tm:
            c_valid = jnp.where(m_idx == nm - 1, m_dim - (nm - 1) * tm, tm)
            c_t = _mask_rows(c_t, c_valid)
        sq = jnp.sum(jnp.square(c_t), axis=0, keepdims=True)

        @pl.when(m_idx == 0)
        def _():
            acc_o[:] = sq

        @pl.when(m_idx != 0)
        def _():
            acc_o[:] += sq

    @pl.when(t == n_pairs - 1)
    def _():
        out_ref[0] = acc_o[:]


def _fused_impl(lu_bf, a_bf, interpret=False, tm=None, tk=None, tb=None):
    l_dim, m_dim, _ = lu_bf.shape
    b_dim = a_bf.shape[1]
    tm, tk, tb = tm or _TM, tk or _TK, tb or _TB
    nm, nk, nb = _cdiv(m_dim, tm), _cdiv(m_dim, tk), _cdiv(b_dim, tb)
    assert tm == tk, "triangular skip assumes square (m, k) tiling"
    m_tab, k_tab = _tri_pairs(nm, nk)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(nb, l_dim, len(m_tab)),
        in_specs=[
            pl.BlockSpec((1, tk, tm),
                         lambda b, l, t, mt, kt: (l, kt[t], mt[t]),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tk, tb),
                         lambda b, l, t, mt, kt: (kt[t], b),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, tb),
                               lambda b, l, t, mt, kt: (l, 0, b),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((tm, tb), jnp.float32),
                        pltpu.VMEM((1, tb), jnp.float32)],
    )
    out = pl.pallas_call(
        functools.partial(_fused_kernel, nm=nm, nk=nk, tm=tm, tk=tk,
                          m_dim=m_dim, n_pairs=len(m_tab)),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((l_dim, 1, b_dim), jnp.float32),
        interpret=interpret,
    )(m_tab, k_tab, lu_bf, a_bf)
    return out[:, 0, :]


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5))
def tri_sq_colsum_fused(lu, a, interpret=False, tm=None, tk=None, tb=None):
    """Fused ``colsum((Luᵀa)²)`` — the c intermediate stays in VMEM.

    Same value contract as ``ops.tri_blocked.tri_sq_colsum`` at bf16 MXU
    precision (the production call sites run this contraction at default
    precision). Gradient: the panel-blocked XLA backward of
    ``tri_sq_colsum`` (tril-masked dlu; da live) — the fused forward is a
    pure forward-bandwidth experiment. See docs/PERFORMANCE.md for the
    measured verdict.
    """
    return _fused_impl(lu.astype(jnp.bfloat16), a.astype(jnp.bfloat16),
                       interpret, tm, tk, tb)


def _fused_fwd(lu, a, interpret, tm, tk, tb):
    return tri_sq_colsum_fused(lu, a, interpret, tm, tk, tb), (lu, a)


def _fused_bwd(interpret, tm, tk, tb, res, g):
    from gpzoo_tpu.ops.tri_blocked import tri_sq_colsum

    lu, a = res
    _, vjp = jax.vjp(lambda l_, a_: tri_sq_colsum(l_, a_), lu, a)
    return vjp(g)


tri_sq_colsum_fused.defvjp(_fused_fwd, _fused_bwd)
