"""Shared GP linear algebra.

Functional counterparts of the reference's L0 math utilities
(``/root/reference/gpzoo/utilities.py``). The reference's ``add_jitter``
mutates its argument in place (utilities.py:407-418) and callers depend on
the mutated matrix flowing downstream (e.g. ``gp.py:360`` → ``gp.py:373``);
here every function is pure and callers explicitly thread the jittered
matrix to every consumer — the GP layer replicates the *effective* data
flow, not the mutation.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def add_jitter(mat, jitter=1e-3):
    """Return ``mat + jitter·I`` on the trailing two dims (pure).

    Functional analog of utilities.py:407-418 for any batch rank.
    """
    n = mat.shape[-1]
    return mat + jitter * jnp.eye(n, dtype=mat.dtype)


def safe_sqrt(x, eps=1e-12):
    """sqrt(x + eps): avoids the NaN gradient of sqrt at 0
    (utilities.py:450-456)."""
    return jnp.sqrt(x + eps)


def sqrt_safe_grad(x):
    """sqrt(x) with a ZERO gradient at x == 0 instead of NaN, and the value
    unchanged everywhere (unlike :func:`safe_sqrt`, which perturbs values
    by ε). The ε-free double-``where`` idiom: the inner ``where`` keeps the
    primal sqrt off x=0 so its VJP never produces inf, the outer one pins
    the value. Serves the same purpose as the reference's ``_torch_sqrt``
    (utilities.py:450-456) — finite d(sqrt ‖x−z‖²)/dx at coincident points
    (every Kzz diagonal) — without shifting Gram values."""
    pos = x > 0
    return jnp.where(pos, jnp.sqrt(jnp.where(pos, x, 1.0)), 0.0)


def svgp_forward(kxx_diag, kzz, w, inducing_mean, inducing_cov):
    """Marginal posterior projection shared by all SVGP variants.

    mean = W μᵤ,  cov_diag = Kxx_diag + rowsum((W (S − Kzz)) ⊙ W)
    (utilities.py:382-397). Shapes, batched over any leading dims:
      kxx_diag (..., N), kzz (..., M, M), w (..., N, M),
      inducing_mean (..., M), inducing_cov (..., M, M)
    → mean (..., N), cov_diag (..., N).
    """
    mean = jnp.einsum("...nm,...m->...n", w, inducing_mean)
    diff = inducing_cov - kzz
    wd = jnp.einsum("...nm,...mk->...nk", w, diff)
    cov_diag = kxx_diag + jnp.sum(wd * w, axis=-1)
    return mean, cov_diag


def reshape_param(param):
    """Flatten leading batch dims of a ``(..., M, M)`` array to
    ``(B, M, M)`` (utilities.py:377-380).

    Host-side convenience for code migrating from the reference; the
    functional pytree design never reshapes parameters in place, so the
    library itself has no call site (matching the reference, where it is
    also unused).
    """
    return jnp.reshape(param, (-1,) + param.shape[-2:])


def tril_logdet(l):
    """``Σ log diag(L)`` over the trailing two dims, batched.

    Mask-based instead of ``jnp.diagonal``: on TPU, diagonal extraction of
    a tiled (L, M, M) tensor lowers to a flat reshape + strided slice —
    two full relayout copies of the tensor (~36 ms/step for the 720 MB
    north-star Lu). ``where(eye, L, 1)`` keeps everything an elementwise
    fusion (log 1 = 0 off-diagonal; the 1-fill also keeps the backward of
    ``log`` NaN-free off the diagonal).
    """
    eye = jnp.eye(l.shape[-1], dtype=bool)
    return jnp.sum(jnp.log(jnp.where(eye, l, 1.0)), axis=(-2, -1))


def whitened_kl(mz, lz):
    """Closed-form KL(N(m, LLᵀ) ‖ N(0, I)) (utilities.py:27-36).

    Batched over leading dims of ``lz`` (..., M, M) / ``mz`` (..., M);
    the reference version is correct only for the unbatched 2-D case — this
    one reduces the trailing event dims so it also covers (L, M, M).
    """
    m = lz.shape[-1]
    kl = (
        -2.0 * tril_logdet(lz)
        + jnp.sum(jnp.square(lz), axis=(-2, -1))
        + jnp.sum(jnp.square(mz), axis=-1)
        - m
    )
    return 0.5 * kl


def lowrank_whitened_kl(mz, v, var_diag):
    """Closed-form KL(N(m, D + VVᵀ) ‖ N(0, I)) for the low-rank-plus-
    diagonal variational family (``var_diag`` = diag(D), variances).

    KL = ½[tr(D) + ‖V‖²_F + ‖m‖² − M − logdet(D + VVᵀ)], with the logdet
    by the matrix determinant lemma:
    logdet = Σ log D_ii + logdet(I_r + Vᵀ D⁻¹ V) — an r×r Cholesky, so
    the whole KL is O(M r² + r³); no M×M tensor exists anywhere (the
    point of :class:`gpzoo_tpu.gps.LowRankWSVGP`). Batched over leading
    dims of ``v`` (..., M, r) / ``var_diag`` (..., M) / ``mz`` (..., M).
    """
    m = v.shape[-2]
    r = v.shape[-1]
    cap = jnp.eye(r, dtype=v.dtype) + jnp.einsum(
        "...mi,...mj->...ij", v, v / var_diag[..., None]
    )
    logdet = jnp.sum(jnp.log(var_diag), axis=-1) + 2.0 * tril_logdet(
        jnp.linalg.cholesky(cap)
    )
    kl = (
        jnp.sum(var_diag, axis=-1)
        + jnp.sum(jnp.square(v), axis=(-2, -1))
        + jnp.sum(jnp.square(mz), axis=-1)
        - m
        - logdet
    )
    return 0.5 * kl


def embed_distance_matrix(distance_matrix, eps=1e-6):
    """Classical MDS embedding of a distance matrix (utilities.py:459-469).

    Double-center −½D², eigendecompose, zero negative eigenvalues, return
    ``Q diag(sqrt(λ + eps))``. Used to embed MGGP group distances.
    """
    d = jnp.asarray(distance_matrix)
    n = d.shape[-1]
    d2 = jnp.square(d)
    c = jnp.eye(n, dtype=d.dtype) - jnp.ones((n, n), dtype=d.dtype) / n
    b = -0.5 * (c @ d2 @ c)
    eigvals, eigvecs = jnp.linalg.eigh(b)
    eigvals = jnp.maximum(eigvals, 0.0)
    return eigvecs @ jnp.diag(safe_sqrt(eigvals, eps))


def build_group_distances(x, groups, n_groups):
    """Distance matrix between per-group mean positions (utilities.py:14-23).

    Note the reference averages over *all* coordinates into a scalar per
    group (``torch.mean(X[mask])`` with no axis, utilities.py:19 — both
    columns of the (N,2) slice collapse to one number, broadcast back to the
    (2,) row). We replicate that exact behavior for parity.
    """
    x = jnp.asarray(x)

    def group_mean(g):
        mask = groups == g
        total = jnp.sum(jnp.where(mask[:, None], x, 0.0))
        count = jnp.sum(mask) * x.shape[1]
        return jnp.full((x.shape[1],), total / count)

    avg = jax.vmap(group_mean)(jnp.arange(n_groups))
    from gpzoo_tpu.ops.distance import cdist

    return cdist(avg, avg)


def tri_inverse(l, block=512, precision="highest"):
    """Lower-triangular inverse via 2×2 block recursion — matmuls instead
    of a full-width triangular solve.

        [[A, 0], [B, C]]⁻¹ = [[A⁻¹, 0], [−C⁻¹ B A⁻¹, C⁻¹]]

    The classic blocked trtri: only the ≤``block``-sized diagonal
    inversions run as triangular solves; everything else is matmuls.
    On v5e, batched triangular solves sustain ~6 TF/s vs ~94 TF/s for
    matmuls (docs/PERFORMANCE.md), so the per-step K⁻¹ = Lzz⁻ᵀLzz⁻¹
    construction drops by roughly the matmul/solve rate ratio.

    Accuracy: same O(κ·ε) class as solving against the identity — the
    off-diagonal block is one extra product — at ``precision``
    ("highest" default; the explicit argument matters because a pinned
    inner ``default_matmul_precision`` context would silently override
    any caller's outer context — the round-4 ``chol_precision`` A/B
    no-op'd exactly that way). ``l``: (..., M, M) lower-triangular, any
    batch rank. Returns the lower-triangular (..., M, M) inverse.
    """
    m = l.shape[-1]
    if m <= block:
        eye = jnp.broadcast_to(
            jnp.eye(m, dtype=l.dtype), l.shape
        )
        with jax.default_matmul_precision(precision):
            return jax.scipy.linalg.solve_triangular(l, eye, lower=True)
    # split at a tile-aligned midpoint (multiples of 128 keep every
    # block's trailing dims on clean MXU/VPU tiles)
    h = ((m // 2 + 127) // 128) * 128
    if h >= m:
        h = m // 2
    a_inv = tri_inverse(l[..., :h, :h], block, precision)
    c_inv = tri_inverse(l[..., h:, h:], block, precision)
    with jax.default_matmul_precision(precision):
        b_inv = -jnp.einsum(
            "...ij,...jk,...kl->...il", c_inv, l[..., h:, :h], a_inv
        )
    top = jnp.concatenate(
        [a_inv, jnp.zeros(l.shape[:-2] + (h, m - h), l.dtype)], axis=-1
    )
    bottom = jnp.concatenate([b_inv, c_inv], axis=-1)
    return jnp.concatenate([top, bottom], axis=-2)


def cholesky_blocked(k, block=512):
    """Batched Cholesky via right-looking 2×2 block recursion — matmuls
    instead of XLA's serialized blocked loop.

        K = [[K11, K21ᵀ], [K21, K22]]
        L11 = chol(K11)                 (recurse; ≤``block`` → stock)
        L21 = K21 L11⁻ᵀ                 (tri_inverse + one matmul)
        L22 = chol(K22 − L21 L21ᵀ)      (recurse on the Schur complement)

    XLA's TPU Cholesky lowers to a column-blocked ``while`` loop that
    leaves the MXU mostly idle on large batched operands (the same op
    class as the ~6 TF/s batched triangular solves, docs/PERFORMANCE.md);
    here only ≤``block``-wide diagonal panels run the stock factorization
    — the L21 panel and the Schur update are HIGHEST-precision matmuls.
    Accuracy is the standard blocked-Cholesky O(κ·ε) class (asserted
    against stock in tests/test_ops.py). ``k``: (..., M, M) SPD, any batch
    rank. Returns the lower-triangular factor.

    Measured negative result (v5e, benchmarks/mggp_anatomy.py, round 3):
    at the MGGP full-scale (20, 3010, 3010) batch the stock forward runs
    36.5 ms vs 43.3 ms blocked — XLA's batched Cholesky is NOT in the
    ~6 TF/s solve class at this shape (the L=20 batch keeps its inner
    loop fed), so the blocked form's extra recursion/concat overhead
    loses. Kept tested and dispatchable for shapes where stock degrades
    (unbatched very large M); the production paths use the stock forward.
    """
    m = k.shape[-1]
    if m <= block:
        return jnp.linalg.cholesky(k)
    h = ((m // 2 + 127) // 128) * 128
    if h >= m:
        h = m // 2
    l11 = cholesky_blocked(k[..., :h, :h], block)
    w11 = tri_inverse(l11, block)
    with jax.default_matmul_precision("highest"):
        l21 = jnp.einsum("...ij,...kj->...ik", k[..., h:, :h], w11)
        schur = k[..., h:, h:] - jnp.einsum(
            "...ij,...kj->...ik", l21, l21
        )
    l22 = cholesky_blocked(schur, block)
    top = jnp.concatenate(
        [l11, jnp.zeros(k.shape[:-2] + (h, m - h), k.dtype)], axis=-1
    )
    bottom = jnp.concatenate([l21, l22], axis=-1)
    return jnp.concatenate([top, bottom], axis=-2)


def spd_inverse_from_cholesky(lz, block=512, precision="highest"):
    """K⁻¹ = Lzz⁻ᵀ Lzz⁻¹ from the Cholesky factor, via the blocked
    triangular inverse + one (..., M, M) matmul — the matmul-form-KL /
    precomputed-projection building block, without the ~6 TF/s full-width
    ``cho_solve(·, I)`` solve. ``precision`` threads to the blocked
    inverse and the WᵀW product (explicit for the same
    outer-context-override reason as ``tri_inverse``)."""
    w = tri_inverse(lz, block, precision)
    with jax.default_matmul_precision(precision):
        return jnp.einsum("...ki,...kj->...ij", w, w)


@jax.custom_vjp
def cholesky_mm(k):
    """``jnp.linalg.cholesky`` with a matmul-form backward.

    XLA's Cholesky VJP runs two full-width triangular solves per matrix —
    ~6 TF/s batched on v5e. This variant reverse-differentiates via the
    blocked triangular inverse instead (Murray 2016, "Differentiation of
    the Cholesky decomposition"):

        K̄ = ½ W ᵀ (Φ(Lᵀ L̄) + Φ(Lᵀ L̄)ᵀ) W,   W = L⁻¹,
        Φ(X) = tril(X) with the diagonal halved

    — one blocked inverse + three batched matmuls, all on the MXU at
    HIGHEST precision. Values are identical to ``jnp.linalg.cholesky``;
    gradients match to roundoff (tests/test_ops.py). Use on the training
    hot path when the Gram argument is trainable (per-factor MGGP
    kernels); with frozen kernels the backward is dead-code-eliminated
    either way.

    Reverse-mode only: like any ``custom_vjp`` without a JVP rule,
    forward-mode autodiff (``jax.jvp``/``jacfwd``/Hessians) through this
    op raises — use ``jnp.linalg.cholesky`` for curvature computations.

    (The forward stays stock: :func:`cholesky_blocked` measured *slower*
    at the MGGP full-scale batch — see its docstring.)
    """
    return jnp.linalg.cholesky(k)


def _cholesky_mm_fwd(k):
    l = jnp.linalg.cholesky(k)
    return l, l


def _cholesky_mm_bwd(l, dl):
    m = l.shape[-1]
    eye = jnp.eye(m, dtype=bool)
    w = tri_inverse(l)
    with jax.default_matmul_precision("highest"):
        p = jnp.einsum("...ki,...kj->...ij", l, dl)  # Lᵀ L̄
        phi = jnp.where(eye, 0.5 * p, jnp.tril(p))
        phi = 0.5 * (phi + jnp.swapaxes(phi, -1, -2))
        kbar = jnp.einsum("...ki,...kl,...lj->...ij", w, phi, w)
    return (kbar,)


cholesky_mm.defvjp(_cholesky_mm_fwd, _cholesky_mm_bwd)


def _panel_bwd_products(l, w, dl, dw, eye):
    """The five VJP products of :func:`cholesky_inverse_mm`, panel-blocked
    over the triangular operand (≈0.58× dense FLOPs per product).

    Assembly is a chain of ``dynamic_update_slice`` writes into one
    preallocated output — NOT ``jnp.concatenate``: concat holds every
    panel part AND the result live simultaneously (the +90 MB HBM
    overrun of the first round-3 attempt), while the update chain lets
    XLA retire each part after its write, so peak ≈ result + one part.
    Caller sets the matmul precision context.
    """
    from gpzoo_tpu.ops.tri_blocked import MIN_DIM, PANELS, _bounds

    m = l.shape[-1]
    bounds = _bounds(m, PANELS if m >= MIN_DIM else 1)

    def rows(out, part, s):
        return jax.lax.dynamic_update_slice(
            out, part, (0,) * (out.ndim - 2) + (s, 0))

    def cols(out, part, s):
        return jax.lax.dynamic_update_slice(
            out, part, (0,) * (out.ndim - 2) + (0, s))

    def out_shape(a, b, rows_dim, cols_dim):
        # explicit matmul result shape — broadcast_shapes over full
        # operand shapes is only right for square operands, and a wrong
        # rhs must raise, not produce a wrong-shaped zeros buffer
        batch = jnp.broadcast_shapes(a.shape[:-2], b.shape[:-2])
        return batch + (rows_dim, cols_dim)

    def tri_t_mm(w_, rhs):
        # Wᵀ @ rhs, W lower-triangular: output rows [s, e) read k ≥ s
        if w_.shape[-2] != rhs.shape[-2]:
            raise ValueError(f"tri_t_mm: {w_.shape} vs {rhs.shape}")
        out = jnp.zeros(out_shape(w_, rhs, w_.shape[-1], rhs.shape[-1]),
                        jnp.result_type(w_, rhs))
        for s, e in bounds:
            out = rows(out, jnp.einsum("...ki,...kb->...ib",
                                       w_[..., s:, s:e], rhs[..., s:, :]), s)
        return out

    def mm_tri_t(a, w_):
        # A @ Wᵀ: output cols [s, e) read A cols l < e
        if a.shape[-1] != w_.shape[-1]:
            raise ValueError(f"mm_tri_t: {a.shape} vs {w_.shape}")
        out = jnp.zeros(out_shape(a, w_, a.shape[-2], w_.shape[-2]),
                        jnp.result_type(a, w_))
        for s, e in bounds:
            out = cols(out, jnp.einsum("...il,...jl->...ij",
                                       a[..., :e], w_[..., s:e, :e]), s)
        return out

    def mm_tri(a, w_):
        # A @ W: output cols [s, e) read A cols l ≥ s
        if a.shape[-1] != w_.shape[-2]:
            raise ValueError(f"mm_tri: {a.shape} vs {w_.shape}")
        out = jnp.zeros(out_shape(a, w_, a.shape[-2], w_.shape[-1]),
                        jnp.result_type(a, w_))
        for s, e in bounds:
            out = cols(out, jnp.einsum("...il,...lj->...ij",
                                       a[..., s:], w_[..., s:, s:e]), s)
        return out

    t1 = tri_t_mm(w, dw)                               # Wᵀ dW
    lbar = jnp.tril(dl) - jnp.tril(mm_tri_t(t1, w))    # − tril(· Wᵀ)
    p = tri_t_mm(l, lbar)                              # Lᵀ L̄
    phi = jnp.where(eye, 0.5 * p, jnp.tril(p))
    phi = 0.5 * (phi + jnp.swapaxes(phi, -1, -2))
    return mm_tri(tri_t_mm(w, phi), w)                 # Wᵀ Φ W


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2, 3))
def cholesky_inverse_mm(k, bwd_precision="highest", bwd_blocked=False,
                        fwd_precision="highest"):
    """``(L, W) = (chol(K), L⁻¹)`` with one combined matmul-form backward.

    The per-factor trainable-kernel fast path (MGGP full scale) consumes
    both the Cholesky factor and its inverse every step. Differentiating
    them as separate ops runs the blocked-inverse recursion twice (once in
    ``cholesky_mm``'s backward, once for autodiff through
    :func:`tri_inverse`); this op shares the forward ``W`` across both
    cotangents:

        L̄_total = tril(dL) − tril(Wᵀ dW Wᵀ)          (d(L⁻¹) = −L⁻¹ dL L⁻¹)
        K̄       = ½ Wᵀ (Φ(Lᵀ L̄_total) + Φ(Lᵀ L̄_total)ᵀ) W

    with Φ(X) = tril(X) with the diagonal halved (Murray 2016) — five
    batched matmuls, zero triangular solves, zero re-inversions. Values
    match (``jnp.linalg.cholesky``, :func:`tri_inverse`); gradients match
    autodiff through that pair to roundoff (tests/test_ops.py).
    Reverse-mode only (no JVP rule).

    ``bwd_precision`` (static): matmul precision of the five backward
    einsums. These touch GRADIENTS only (the forward L/W values stay
    full-precision), so the error budget is gradient noise swallowed by
    the stochastic ELBO/Adam — not loss-value accuracy. At the MGGP full
    scale the HIGHEST backward costs ~219 ms vs ~60 ms at ``"default"``
    (bf16 inputs, f32 accumulation); see docs/PERFORMANCE.md for the
    measured trajectory check that gates the fast setting.

    ``bwd_blocked`` (static): panel-block the five backward products over
    their triangular operands (≈0.58× dense FLOPs), assembled by a
    ``dynamic_update_slice`` chain instead of the concat whose
    parts+result footprint OOM'd the first round-3 attempt (see
    :func:`_panel_bwd_products`). Values identical to the dense forms up
    to panel-sum reassociation (tests/test_ops.py).

    ``fwd_precision`` (static): matmul precision of the VALUE-path
    blocked-inverse recursion (the Cholesky itself is an XLA custom call,
    precision-insensitive). Unlike ``bwd_precision`` this feeds the
    posterior MEAN through W = Lzz⁻¹ with O(κ·ε) amplification — the
    ``chol_precision`` policy gate (train/policy.py) decides per config
    from the measured A/B (benchmarks/mggp_anatomy.py --chol-precision).
    """
    l = jnp.linalg.cholesky(k)
    return l, tri_inverse(l, precision=fwd_precision)


def _cholesky_inverse_mm_fwd(k, bwd_precision, bwd_blocked, fwd_precision):
    l = jnp.linalg.cholesky(k)
    w = tri_inverse(l, precision=fwd_precision)
    return (l, w), (l, w)


def _cholesky_inverse_mm_bwd(bwd_precision, bwd_blocked, fwd_precision,
                             res, cots):
    l, w = res
    dl, dw = cots
    m = l.shape[-1]
    eye = jnp.eye(m, dtype=bool)
    with jax.default_matmul_precision(bwd_precision):
        if bwd_blocked:
            kbar = _panel_bwd_products(l, w, dl, dw, eye)
        else:
            lbar = jnp.tril(dl) - jnp.tril(
                jnp.einsum("...ki,...kl,...jl->...ij", w, dw, w)
            )
            p = jnp.einsum("...ki,...kj->...ij", l, lbar)  # Lᵀ L̄
            phi = jnp.where(eye, 0.5 * p, jnp.tril(p))
            phi = 0.5 * (phi + jnp.swapaxes(phi, -1, -2))
            kbar = jnp.einsum("...ki,...kl,...lj->...ij", w, phi, w)
    return (kbar,)


cholesky_inverse_mm.defvjp(_cholesky_inverse_mm_fwd, _cholesky_inverse_mm_bwd)
