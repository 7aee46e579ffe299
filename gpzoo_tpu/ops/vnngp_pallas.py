"""Pallas kernel for VNNGP's per-point K×K conditioning.

The VNNGP marginal posterior solves one tiny SPD system per query point:

    w   = little_Kxzₙ · little_Kzzₙ⁻¹               (1×K row)
    mean = w · little_muₙ
    cov  = Kxxₙ + w (little_Sₙ − little_Kzzₙ) wᵀ

XLA executes the batched (N, K, K) Cholesky/solve with K padded onto
128-wide tiles — ~94% wasted lanes at K=8. This kernel transposes the
problem to structure-of-arrays: every K×K matrix element becomes an
N-vector, the Cholesky/solves are fully unrolled over the static K
(O(K³) fused vector ops on (8, 128) tiles), and the point dimension fills
the VPU lanes exactly.

Layouts: callers pass element-major arrays — kzz/s as (K², N'), kxz/mu
as (K, N'), kxx as (N'), with N' = N (or L·N) padded to a multiple of
the tile size. :func:`block_conditional` handles the reshaping/padding
and exposes a plain batched API with a custom VJP (backward = jax.vjp of
the equivalent XLA computation — recompute, matmul-shaped).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LANES = 128
_SUBLANES = 8
_TILE = _LANES * _SUBLANES  # points per grid cell

# Default ON: unlike the Gram kernels, this one wins decisively — XLA's
# batched (N, K, K) linalg pads K onto 128-lane tiles.
ENABLED = True


def enabled_for(n, k, dtype) -> bool:
    if not ENABLED:
        return False
    try:
        backend = jax.default_backend()
    except RuntimeError:
        return False
    if backend not in ("tpu", "axon"):
        return False
    return dtype == jnp.float32 and k <= 16 and n >= _TILE


def _cdiv(a, b):
    return -(-a // b)


def _kernel(kzz_ref, s_ref, kxz_ref, mu_ref, kxx_ref, mean_ref, cov_ref,
            *, K, jitter):
    """One tile of points. Element refs are (idx, 8, 128) vector slabs."""

    def at(ref, i, j=None):
        return ref[i * K + j] if j is not None else ref[i]

    # --- unrolled Cholesky of (Kzz + jitter·I) ---------------------------
    l = [[None] * K for _ in range(K)]
    inv_diag = [None] * K
    for i in range(K):
        for j in range(i + 1):
            acc = at(kzz_ref, i, j)
            if i == j:
                acc = acc + jitter
            for k in range(j):
                acc = acc - l[i][k] * l[j][k]
            if i == j:
                l[i][j] = jnp.sqrt(acc)
                inv_diag[i] = 1.0 / l[i][j]
            else:
                l[i][j] = acc * inv_diag[j]

    # --- w = Kzz⁻¹ kxz via forward+back substitution ---------------------
    y = [None] * K
    for i in range(K):
        acc = at(kxz_ref, i)
        for k in range(i):
            acc = acc - l[i][k] * y[k]
        y[i] = acc * inv_diag[i]
    w = [None] * K
    for i in reversed(range(K)):
        acc = y[i]
        for k in range(i + 1, K):
            acc = acc - l[k][i] * w[k]
        w[i] = acc * inv_diag[i]

    # --- mean and cov -----------------------------------------------------
    mean = w[0] * at(mu_ref, 0)
    for i in range(1, K):
        mean = mean + w[i] * at(mu_ref, i)
    mean_ref[:] = mean

    # cov = kxx + Σ_j (Σ_k w_k (S − Kzz − jitter·I_block)[k, j]) w_j
    # NOTE: the reference conditions on (Kzz + jitter) but subtracts the
    # *same jittered blocks* inside svgp_forward (mutated in place,
    # gp.py:77,106) — replicate by including the jitter in the diff diag.
    cov = at(kxx_ref, 0) * 0.0
    for j in range(K):
        acc = None
        for k in range(K):
            d = at(s_ref, k, j) - at(kzz_ref, k, j)
            if k == j:
                d = d - jitter
            term = w[k] * d
            acc = term if acc is None else acc + term
        cov = cov + acc * w[j]
    cov_ref[:] = at(kxx_ref, 0) + cov


def _xla_reference(kzz, s, kxz, mu, kxx, jitter):
    """Equivalent batched XLA computation (also the VJP recompute path).

    kzz/s: (N, K, K); kxz/mu: (N, K); kxx: (N,).
    """
    n, k, _ = kzz.shape
    blocks = kzz + jitter * jnp.eye(k, dtype=kzz.dtype)
    chol = jnp.linalg.cholesky(blocks)
    w = jax.scipy.linalg.cho_solve((chol, True), kxz[..., None])[..., 0]
    mean = jnp.sum(w * mu, axis=-1)
    diff = s - blocks
    wd = jnp.einsum("nk,nkj->nj", w, diff)
    cov = kxx + jnp.sum(wd * w, axis=-1)
    return mean, cov


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6))
def block_conditional(kzz, s, kxz, mu, kxx, jitter, interpret=False):
    """VNNGP per-point conditioning, Pallas-fused.

    kzz, s: (N, K, K) gathered blocks (kzz WITHOUT the extra block jitter
    — it is added inside, matching ``add_jitter`` at gp.py:77);
    kxz, mu: (N, K); kxx: (N,) → (mean (N,), cov (N,)).
    """
    n, k, _ = kzz.shape
    n_pad = _cdiv(n, _TILE) * _TILE

    def elem_major(a, rows):
        a = a.reshape(n, rows)
        a = jnp.pad(a, ((0, n_pad - n), (0, 0)))
        # (rows, n_pad/128/8, 8, 128): element-major vector slabs
        return jnp.moveaxis(
            a.reshape(n_pad // _TILE, _SUBLANES, _LANES, rows), 3, 0
        )

    kzz_e = elem_major(kzz, k * k)
    s_e = elem_major(s, k * k)
    kxz_e = elem_major(kxz, k)
    mu_e = elem_major(mu, k)
    kxx_e = elem_major(kxx[:, None], 1)

    grid = (n_pad // _TILE,)
    out_shape = (n_pad // _TILE, _SUBLANES, _LANES)
    mean_p, cov_p = pl.pallas_call(
        functools.partial(_kernel, K=k, jitter=jitter),
        grid=grid,
        in_specs=[
            pl.BlockSpec((k * k, 1, _SUBLANES, _LANES),
                         lambda i: (0, i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((k * k, 1, _SUBLANES, _LANES),
                         lambda i: (0, i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((k, 1, _SUBLANES, _LANES),
                         lambda i: (0, i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((k, 1, _SUBLANES, _LANES),
                         lambda i: (0, i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, _SUBLANES, _LANES),
                         lambda i: (0, i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, _SUBLANES, _LANES), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, _SUBLANES, _LANES), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct(out_shape, kzz.dtype),
            jax.ShapeDtypeStruct(out_shape, kzz.dtype),
        ),
        interpret=interpret,
    )(kzz_e, s_e, kxz_e, mu_e, kxx_e)
    return mean_p.reshape(-1)[:n], cov_p.reshape(-1)[:n]


def _fwd(kzz, s, kxz, mu, kxx, jitter, interpret):
    out = block_conditional(kzz, s, kxz, mu, kxx, jitter, interpret)
    return out, (kzz, s, kxz, mu, kxx)


def _bwd(jitter, interpret, res, g):
    _, vjp = jax.vjp(
        lambda *a: _xla_reference(*a, jitter=jitter), *res
    )
    return vjp(g)


block_conditional.defvjp(_fwd, _bwd)
