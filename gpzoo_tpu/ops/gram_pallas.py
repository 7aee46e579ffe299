"""Fused Gram-matrix construction as Pallas TPU kernels.

Motivation (SURVEY.md §7.6): building the L-batched covariance
``K[l] = σ_l² · exp(−½ d²/ℓ_l²)`` the XLA way materializes the (N, M)
squared-distance matrix in HBM and re-reads it once per factor; the MGGP
variant adds a second (N, M) distance matrix, an embedding gather and a
``pow`` epilogue — several full HBM round-trips for what is arithmetically
one pass. These kernels compute the distance tile *in VMEM* from the raw
coordinates (D ≤ a few: unrolled broadcast subtractions on the VPU) and
apply all L per-factor epilogues while the tile is resident, writing only
the final (L, N, M) covariance to HBM.

Layout trick: the kernel takes ``x`` as (N, D) and ``z`` transposed as
(D, M), so the per-coordinate broadcast is a natural (tn, 1) − (1, tm)
outer difference — no in-kernel transposes.

Gradients: the public entry points carry a ``jax.custom_vjp`` whose
backward recomputes distances with plain XLA ops (the backward is
matmul-shaped and fuses well; recompute beats storing d²).

These kernels are value-exact replacements (same float32 ops in a
different order), used when ``enabled_for()`` says the shapes/backend
qualify; the pure-XLA path in :mod:`gpzoo_tpu.kernels` remains the
fallback and the parity oracle.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Default OFF: on-device A/B at the north-star Gram shape (L=20, M=3000,
# B=7000, TPU v5e) measured XLA at 4.0 ms vs this kernel at 9.1 ms — XLA's
# cdist+exp fusion is already within ~2x of the HBM write floor, and the
# custom-VJP residual doubles live memory in the training step. The kernel
# is kept (correct, tested, differentiable) as the substrate for future
# tile tuning; flip to True or call rbf_gram/mggp_gram directly to use it.
ENABLED = False

_TILE_N = 256
_TILE_M = 256


def _cdiv(a, b):
    return -(-a // b)


def _round_up(a, b):
    return _cdiv(a, b) * b


def enabled_for(n, m, d, dtype) -> bool:
    """Use the Pallas path only where it wins: TPU backend, float32,
    real tile counts, and small coordinate dimension."""
    if not ENABLED:
        return False
    try:
        backend = jax.default_backend()
    except RuntimeError:  # no backend initialized yet
        return False
    if backend not in ("tpu", "axon"):
        return False
    return dtype == jnp.float32 and d <= 8 and n >= _TILE_N and m >= _TILE_M


# ---------------------------------------------------------------------------
# RBF family
# ---------------------------------------------------------------------------

def _rbf_kernel(x_ref, zt_ref, sigma2_ref, scale_ref, out_ref, *, dim, L):
    """One (tn, tm) tile: d² from coordinates, then L fused epilogues.

    x_ref (tn, dim), zt_ref (dim, tm), sigma2/scale (L,) in SMEM with
    scale = −½/ℓ², out_ref (L, tn, tm).
    """
    d2 = jnp.zeros(out_ref.shape[1:], dtype=jnp.float32)
    for k in range(dim):
        diff = x_ref[:, k][:, None] - zt_ref[k, :][None, :]
        d2 = d2 + diff * diff
    for l in range(L):
        out_ref[l] = sigma2_ref[l] * jnp.exp(d2 * scale_ref[l])


def _rbf_gram_fwd_impl(x, z, sigma2, scale, *, interpret=False):
    n, dim = x.shape
    m = z.shape[0]
    L = sigma2.shape[0]
    np_, mp_ = _round_up(n, _TILE_N), _round_up(m, _TILE_M)
    x_p = jnp.pad(x, ((0, np_ - n), (0, 0)))
    zt_p = jnp.pad(z.T, ((0, 0), (0, mp_ - m)))

    out = pl.pallas_call(
        functools.partial(_rbf_kernel, dim=dim, L=L),
        grid=(np_ // _TILE_N, mp_ // _TILE_M),
        in_specs=[
            pl.BlockSpec((_TILE_N, dim), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((dim, _TILE_M), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((L, _TILE_N, _TILE_M),
                               lambda i, j: (0, i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((L, np_, mp_), jnp.float32),
        interpret=interpret,
    )(x_p, zt_p, sigma2, scale)
    return out[:, :n, :m]


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def rbf_gram(x, z, sigma, lengthscale, interpret=False):
    """(L, N, M) RBF Gram: σ_l² exp(−½‖x−z‖²/ℓ_l²), Pallas-fused.

    sigma/lengthscale: (L,) vectors (callers broadcast scalars/(L,1,1)).
    """
    sigma2 = jnp.square(sigma).astype(jnp.float32)
    scale = (-0.5 / jnp.square(lengthscale)).astype(jnp.float32)
    return _rbf_gram_fwd_impl(x, z, sigma2, scale, interpret=interpret)


def _rbf_gram_fwd(x, z, sigma, lengthscale, interpret):
    out = rbf_gram(x, z, sigma, lengthscale, interpret)
    return out, (x, z, sigma, lengthscale, out)


def _rbf_gram_bwd(interpret, res, g):
    """Backward in plain XLA (matmul-shaped; recompute beats storing d²).

    dk/dσ_l = 2 k / σ_l ;  dk/dℓ_l = k · d²/ℓ_l³ ;
    dk/dx_i = Σ_m g·k·(−(x_i−z_m)/ℓ²) etc.
    """
    x, z, sigma, lengthscale, k = res
    gk = g * k  # (L, N, M)
    d2 = (
        jnp.sum(jnp.square(x), -1)[:, None]
        - 2.0 * x @ z.T
        + jnp.sum(jnp.square(z), -1)[None, :]
    )
    d2 = jnp.maximum(d2, 0.0)
    inv_ell2 = 1.0 / jnp.square(lengthscale)  # (L,)

    d_sigma = 2.0 * jnp.sum(gk, axis=(1, 2)) / sigma
    d_ell = jnp.einsum("lnm,nm->l", gk, d2) * inv_ell2 / lengthscale

    # dk/d x_n = Σ_{l,m} gk[l,n,m] · (z_m − x_n) · inv_ell2[l]
    w = jnp.einsum("lnm,l->nm", gk, inv_ell2)  # (N, M)
    dx = w @ z - jnp.sum(w, axis=1, keepdims=True) * x
    dz = w.T @ x - jnp.sum(w, axis=0)[:, None] * z
    return dx, dz, d_sigma, d_ell


rbf_gram.defvjp(_rbf_gram_fwd, _rbf_gram_bwd)


# ---------------------------------------------------------------------------
# MGGP family
# ---------------------------------------------------------------------------

def _mggp_kernel(x_ref, zt_ref, ex_ref, ezt_ref, sigma2_ref, inv_ell2_ref,
                 alpha_ref, out_ref, *, dim, edim, L, half_p):
    """MGGP tile: spatial d² + group-embedding g² + fused per-L epilogue
    k = σ² · exp(−½ (d²/ℓ²)/(α g²+1)) · (α g²+1)^(−p/2)."""
    d2 = jnp.zeros(out_ref.shape[1:], dtype=jnp.float32)
    for k in range(dim):
        diff = x_ref[:, k][:, None] - zt_ref[k, :][None, :]
        d2 = d2 + diff * diff
    g2 = jnp.zeros(out_ref.shape[1:], dtype=jnp.float32)
    for k in range(edim):
        diff = ex_ref[:, k][:, None] - ezt_ref[k, :][None, :]
        g2 = g2 + diff * diff
    for l in range(L):
        denom = alpha_ref[l] * g2 + 1.0
        out_ref[l] = (
            sigma2_ref[l]
            * jnp.exp(-0.5 * d2 * inv_ell2_ref[l] / denom)
            * denom ** (-half_p)
        )


def _mggp_gram_xla(x, z, ex, ez, sigma, lengthscale, alpha_eff, input_dim):
    """Reference XLA expression of the same Gram — used as the VJP
    recompute path for the Pallas forward."""
    d2 = jnp.maximum(
        jnp.sum(jnp.square(x), -1)[:, None] - 2.0 * x @ z.T
        + jnp.sum(jnp.square(z), -1)[None, :], 0.0,
    )
    g2 = jnp.maximum(
        jnp.sum(jnp.square(ex), -1)[:, None] - 2.0 * ex @ ez.T
        + jnp.sum(jnp.square(ez), -1)[None, :], 0.0,
    )
    denom = alpha_eff[:, None, None] * g2 + 1.0
    return (
        jnp.square(sigma)[:, None, None]
        * jnp.exp(-0.5 * d2 / jnp.square(lengthscale)[:, None, None] / denom)
        * denom ** (-0.5 * input_dim)
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8))
def mggp_gram(x, z, ex, ez, sigma, lengthscale, alpha_eff, input_dim,
              interpret=False):
    """(L, N, M) multi-group Gram, Pallas-fused forward.

    ex/ez: per-point group embeddings (already gathered, (N, De)/(M, De));
    alpha_eff: (L,) with the positivity convention pre-applied;
    input_dim: the ``p`` in the (αg²+1)^(−p/2) normalization.

    Backward: jax.vjp of the equivalent XLA expression (recompute; the
    backward is matmul-shaped and fuses well in XLA).
    """
    n, dim = x.shape
    m = z.shape[0]
    edim = ex.shape[1]
    L = sigma.shape[0]
    np_, mp_ = _round_up(n, _TILE_N), _round_up(m, _TILE_M)
    x_p = jnp.pad(x, ((0, np_ - n), (0, 0)))
    zt_p = jnp.pad(z.T, ((0, 0), (0, mp_ - m)))
    ex_p = jnp.pad(ex, ((0, np_ - n), (0, 0)))
    ezt_p = jnp.pad(ez.T, ((0, 0), (0, mp_ - m)))

    sigma2 = jnp.square(sigma).astype(jnp.float32)
    inv_ell2 = (1.0 / jnp.square(lengthscale)).astype(jnp.float32)

    out = pl.pallas_call(
        functools.partial(_mggp_kernel, dim=dim, edim=edim, L=L,
                          half_p=0.5 * input_dim),
        grid=(np_ // _TILE_N, mp_ // _TILE_M),
        in_specs=[
            pl.BlockSpec((_TILE_N, dim), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((dim, _TILE_M), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_TILE_N, edim), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((edim, _TILE_M), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((L, _TILE_N, _TILE_M),
                               lambda i, j: (0, i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((L, np_, mp_), jnp.float32),
        interpret=interpret,
    )(x_p, zt_p, ex_p, ezt_p, sigma2, inv_ell2,
      alpha_eff.astype(jnp.float32))
    return out[:, :n, :m]


def _mggp_gram_fwd(x, z, ex, ez, sigma, lengthscale, alpha_eff, input_dim,
                   interpret):
    out = mggp_gram(x, z, ex, ez, sigma, lengthscale, alpha_eff, input_dim,
                    interpret)
    return out, (x, z, ex, ez, sigma, lengthscale, alpha_eff)


def _mggp_gram_bwd(input_dim, interpret, res, g):
    _, vjp = jax.vjp(
        lambda *a: _mggp_gram_xla(*a, input_dim=input_dim), *res
    )
    return vjp(g)


mggp_gram.defvjp(_mggp_gram_fwd, _mggp_gram_bwd)
