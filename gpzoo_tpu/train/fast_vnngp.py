"""Production fast paths for NSF over a VNNGP prior.

Two tiers, mirroring the SVGP fast paths in ``train/fast.py``:

* :func:`vnngp_nsf_negative_elbo_batched` — the all-trainable step
  (Z, kernel, mu/Lu, W/V): per-step neighbor re-ranking, K×K block
  gathers, matmul-form KL. Same value as the generic minibatch ELBO.
* :func:`precompute_vnngp_conditioning` +
  :func:`vnngp_nsf_negative_elbo_precomputed` — the frozen-Z /
  frozen-kernel configuration (the VNNGP analog of
  ``precompute_nsf_projection``; reference ``VNNGP`` freezes nothing
  but its precomputed-W idea is gp.py:308-322). When Z and the kernel
  hyperparameters do not train, the whole conditioning GEOMETRY is
  step-invariant: the (M, M) Gram + Cholesky, the (B, M) cross-Gram +
  distances, the top-K neighbor search, the per-point K×K Cholesky
  solves and K⁻¹ all hoist out. What remains per step is only what the
  variational parameters touch:

      w         = blocks⁻¹ little_Kxz            (N, K)   frozen
      c0        = w · little_Kxz                 (N,)     frozen
      mean      = w · mu[idx]                            per step
      cov       = Kxx − c0 + w·(Lu Luᵀ)[idx,idx]·wᵀ      per step
      KL        = matmul form against the frozen K⁻¹     per step

  — one S = Lu Luᵀ matmul, one (B, K, K) block gather, three small
  einsums. The round-3 step anatomy showed the all-trainable step is a
  latency-bound chain of ~10 small ops (docs/PERFORMANCE.md); this
  path deletes the expensive half of the chain outright.

Bit-compatibility: the reparameterization draws match
``Normal.sample(key, (E,))`` on the (L, B) marginal (the factor axis is
restored before sampling — the L factors are distinct latent functions
even when every parameter is shared), so loss values equal the generic
path to float reassociation (float64-exact in tests/test_fast.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from flax import struct

from gpzoo_tpu import dists
from gpzoo_tpu.bijectors import lower_cholesky, softplus
from gpzoo_tpu.gps.vnngp import gather_blocks
from gpzoo_tpu.ops.linalg import add_jitter
from gpzoo_tpu.ops.tri_blocked import tri_kl_trace


# the shared-kernel collapse + matmul-form KL live with the SVGP fast
# paths; importing fast here is acyclic (fast never imports this module
# at top level — its back-compat alias is a lazy module __getattr__)
from gpzoo_tpu.train.fast import (_collapse_shared_kernel, _count_py,
                                  _matmul_kl)


def _solve_kl(mu, lu, lzz):
    """Σ_l KL(N(μ_l, Lu_l Lu_lᵀ) ‖ N(0, Kzz_l)) via two triangular
    solves — tr(K⁻¹S) = ‖Lzz⁻¹Lu‖²_F, μᵀK⁻¹μ = ‖Lzz⁻¹μ‖². Minimal op
    count; see ``kl_form`` in the caller's docstring."""
    from gpzoo_tpu.ops.linalg import tril_logdet

    m_dim = lzz.shape[-1]
    lu_l = lu if lu.ndim == 3 else lu[None]
    mu_l = jnp.atleast_2d(jnp.asarray(mu))
    if lzz.ndim == 2:
        # shared Cholesky: ONE folded solve covers all factors' Lu
        # columns AND mu — (M, l·M + l) rhs
        el = lu_l.shape[0]
        rhs = jnp.concatenate(
            [jnp.moveaxis(lu_l, 0, 1).reshape(m_dim, el * m_dim),
             mu_l.T], axis=-1)
        sol = jax.scipy.linalg.solve_triangular(lzz, rhs, lower=True)
        a = sol[:, :el * m_dim].reshape(m_dim, el, m_dim)
        trace = jnp.sum(jnp.square(a), axis=(0, 2))  # (l,)
        maha = jnp.sum(jnp.square(sol[:, el * m_dim:]), axis=0)  # (l,)
    else:
        lu_b = jnp.broadcast_to(lu_l, lzz.shape)
        a = jax.scipy.linalg.solve_triangular(lzz, lu_b, lower=True)
        trace = jnp.sum(jnp.square(a), axis=(-2, -1))
        mu_b = jnp.broadcast_to(mu_l, lzz.shape[:-2] + mu_l.shape[-1:])
        b = jax.scipy.linalg.solve_triangular(lzz, mu_b[..., None],
                                              lower=True)
        maha = jnp.sum(jnp.square(b[..., 0]), axis=-1)
    kl = jnp.sum(0.5 * (trace + maha - m_dim)
                 + tril_logdet(lzz) - tril_logdet(lu_l))
    return kl


def vnngp_nsf_negative_elbo_batched(model, x, y, idx, key, E=1,
                                    unnormalized=True, shared_kernel=False,
                                    y_transposed=False, kl_form="matmul"):
    """Fast minibatch −ELBO for NSF over a VNNGP prior — same value as the
    generic path, with the per-step (L, M, M) work collapsed:

    * ``shared_kernel=True`` (equal per-factor hyperparameters) computes
      one (M, M) Gram/Cholesky instead of L,
    * the KL uses :func:`_matmul_kl` (no batched M×M triangular solves),
    * the per-point K×K conditioning dispatches to the Pallas
      structure-of-arrays kernel on TPU (see gps/vnngp.py).

    ``kl_form`` (static): ``"matmul"`` builds K⁻¹ by the blocked
    triangular-inverse recursion (the right trade at the L-batched
    M=3000 inducing-point scale, where batched solves run 6 vs 94 TF/s);
    ``"solve"`` computes the same KL with two triangular solves —
    ~12 fewer ops per step, which matters at the VNNGP scale (M=1000,
    one shared Cholesky) where the step is op-count-bound, not
    FLOP-bound (docs/PERFORMANCE.md VNNGP anatomy). Same value either
    way (float64-asserted in tests).

    The VNNGP conditioning itself is already O(B·K³) — no spot-axis
    microbatching needed.
    """
    gp = model.prior if hasattr(model, "prior") else model.gp
    # Pre-collapse factor batch (one-point Gram probe, no dispatch): the
    # L factors are distinct latent functions even when every parameter
    # is shared, so the collapsed marginal must be re-broadcast before
    # sampling and the KL re-counted — without this, a shared-mu model
    # under shared_kernel=True silently drew ONE noise vector for all L
    # factors and counted the KL once instead of L times (the round-3
    # VNNGP bench configuration; caught by the round-4 property sweep).
    kernel_batch = jax.eval_shape(
        lambda: gp.kernel.gram(gp.Z[:1], gp.Z[:1])
    ).shape[:-2]
    if shared_kernel:
        gp = gp.replace(kernel=_collapse_shared_kernel(gp.kernel))

    qf, qu, pu = gp(x[idx])
    lu = qu.scale_tril
    qf_batch = jnp.broadcast_shapes(
        kernel_batch, jnp.shape(gp.mu)[:-1], jnp.shape(lu)[:-2])
    marginal = (qf_batch + (idx.shape[0],)
                if qf_batch else jnp.shape(qf.loc))
    qf = dists.Normal(jnp.broadcast_to(qf.loc, marginal),
                      jnp.broadcast_to(qf.scale, marginal))
    f = qf.sample(key, (E,))
    rate = softplus(model.V_raw[idx]) * jnp.einsum(
        "dl,...ln->...dn", softplus(model.W_raw), jnp.exp(f)
    )
    py = _count_py(model, rate)
    yb = jnp.swapaxes(y[idx], 0, 1) if y_transposed else y[:, idx]
    lp = py.unnormalized_log_prob(yb) if unnormalized else py.log_prob(yb)
    ll = jnp.sum(jnp.mean(lp, axis=0))

    # KL for shared AND per-factor prior Choleskys. The generic path
    # broadcasts qU against the PRE-collapse L-batched prior, so with
    # shared parameters it sums L identical copies.
    if kl_form == "solve":
        kl = _solve_kl(qu.loc, qu.scale_tril, pu.scale_tril)
    elif kl_form == "matmul":
        kl, _ = _matmul_kl(qu.loc, qu.scale_tril, pu.scale_tril)
    else:
        raise ValueError(f"kl_form={kl_form!r}: expected 'matmul' or "
                         "'solve'")

    def _copies(kb):
        n = 1
        for d in jnp.broadcast_shapes(jnp.shape(gp.mu)[:-1],
                                      jnp.shape(lu)[:-2], kb):
            n *= int(d)
        return n

    kl = kl * (_copies(kernel_batch)
               // _copies(pu.scale_tril.shape[:-2]))
    return -(ll - kl)


# ---------------------------------------------------------------------------
# Precomputed-conditioning path: the frozen-Z/frozen-kernel configuration
# ---------------------------------------------------------------------------

@struct.dataclass
class VNNGPConditioning:
    """Step-invariant VNNGP conditioning geometry (frozen Z + kernel).

    Fields (all constants w.r.t. training):
      idx    — (N, K) int32 nearest-inducing-point indices,
      w      — (N, K) conditioning weights blocks⁻¹·little_Kxz (the
               per-point K×K Cholesky solve, done once),
      c0     — (N,) w·little_Kxz = w·blocks·wᵀ (the variance subtrahend),
      kxx    — kernel variance diag: scalar σ² or (L, 1) carrying the
               pre-collapse factor count,
      k_inv  — (M, M) Kzz⁻¹ for the matmul-form KL,
      logdet_lzz — Σ log diag chol(Kzz).
    """

    idx: jnp.ndarray
    w: jnp.ndarray
    c0: jnp.ndarray
    kxx: jnp.ndarray
    k_inv: jnp.ndarray
    logdet_lzz: jnp.ndarray


@functools.partial(jax.jit, static_argnums=(4,))
def _vnngp_geometry(kernel, z, x, jitter, k):
    """All frozen pieces in one compiled program (eager op dispatch costs
    ~0.75 s/op through the TPU tunnel)."""
    from gpzoo_tpu.ops.linalg import spd_inverse_from_cholesky, tril_logdet

    with jax.default_matmul_precision("highest"):
        kzz = add_jitter(kernel.gram(z, z), jitter)
        lzz = jnp.linalg.cholesky(kzz)
        kxz, distance = kernel.gram_and_distance(x, z)
        if distance.ndim == 3:
            distance = distance[0]
        _, idx = jax.lax.top_k(-distance, k)  # (N, K)
        # exactly the generic path's blocks: gather of the jittered Kzz,
        # re-jittered (gps/vnngp.py replicates the reference's in-place
        # add_jitter at gp.py:77)
        blocks = add_jitter(gather_blocks(kzz, idx), jitter)
        chol_blk = jnp.linalg.cholesky(blocks)
        little_kxz = jnp.take_along_axis(
            kxz, idx if kxz.ndim == 2 else idx[None], axis=-1)
        if little_kxz.ndim == 3:
            little_kxz = little_kxz[0]
        w = jax.scipy.linalg.cho_solve(
            (chol_blk, True), little_kxz[..., None])[..., 0]  # (N, K)
        c0 = jnp.einsum("nk,nk->n", w, little_kxz)
        k_inv = spd_inverse_from_cholesky(lzz)
        logdet = tril_logdet(lzz)
    return idx.astype(jnp.int32), w, c0, k_inv, logdet


def precompute_vnngp_conditioning(model, x):
    """Build :class:`VNNGPConditioning` for ``model`` over all spots
    ``x``. Requires a shared kernel across factors (equal per-factor
    hyperparameters — the VNNGPConfig init); collapses to factor 0 like
    ``shared_kernel=True``. Unlike the fast loss (which may legitimately
    run mid-training on tied hyperparameters), this VERIFIES equality —
    a silently wrong frozen geometry from diverged per-factor σ/ℓ (e.g.
    a model previously trained through the collapse's factor-0 gradient
    routing) would corrupt every subsequent step."""
    import numpy as np

    gp = model.prior if hasattr(model, "prior") else model.gp
    for name in ("sigma", "lengthscale"):
        v = np.asarray(jax.device_get(
            jnp.asarray(getattr(gp.kernel, name)))).reshape(-1)
        if v.size > 1 and not np.all(v == v[0]):
            raise ValueError(
                f"precompute_vnngp_conditioning: per-factor kernel "
                f"{name} values are not equal ({v[:4]}…) — the frozen "
                "conditioning geometry requires a shared kernel")
    kernel = _collapse_shared_kernel(gp.kernel)
    idx, w, c0, k_inv, logdet = _vnngp_geometry(
        kernel, gp.Z, x, gp.jitter, gp.K)
    # variance diag of the ORIGINAL kernel, broadcast to its true factor
    # batch (the (L, 1) shape carries the factor count into the qF batch
    # and the KL copy count — same convention as NSFProjection)
    kxx = jnp.asarray(gp.kernel.variance_vector())
    pre_batch = jax.eval_shape(
        lambda: gp.kernel.gram(gp.Z[:1], gp.Z[:1])
    ).shape[:-2]
    if pre_batch:
        kxx = jnp.broadcast_to(kxx.reshape(-1, 1), (pre_batch[0], 1))
    return VNNGPConditioning(
        idx=jax.block_until_ready(idx), w=w, c0=c0,
        kxx=kxx, k_inv=k_inv, logdet_lzz=logdet,
    )


def vnngp_nsf_negative_elbo_precomputed(model, cond, y, idx, key, E=1,
                                        unnormalized=True,
                                        y_transposed=False):
    """Minibatch −ELBO for NSF(VNNGP) from frozen conditioning geometry —
    identical math to the generic path when Z and the kernel are frozen
    (float64-verified in tests/test_fast.py), with zero per-step
    Gram/Cholesky/top-K/solve work:

        mean = w·mu[nbr]                    (one gather + tiny einsum)
        cov  = Kxx − c0 + w·S[nbr,nbr]·wᵀ   (S = Lu Luᵀ, one matmul +
                                             one (B, K, K) block gather)
        KL   = matmul form against the precomputed K⁻¹
    """
    gp = model.prior if hasattr(model, "prior") else model.gp
    lu = lower_cholesky(gp.Lu_raw)
    lu_l = lu if lu.ndim == 3 else lu[None]
    mu_l = jnp.atleast_2d(jnp.asarray(gp.mu))
    m_dim = lu.shape[-1]

    nb = cond.idx[idx]  # (B, K) contiguous row gather
    w = cond.w[idx]  # (B, K)
    s = jnp.einsum("lij,lkj->lik", lu_l, lu_l)
    little_s = gather_blocks(s, nb)  # (l, B, K, K)
    little_mu = mu_l[..., nb]  # (l, B, K)
    mean = jnp.einsum("lbk,bk->lb", little_mu, w)
    quad = jnp.einsum("lbij,bi,bj->lb", little_s, w, w)
    base = jnp.asarray(cond.kxx) - cond.c0[idx]  # (B,) or (L, B)
    cov = base + quad
    mean, cov = jnp.broadcast_arrays(mean, cov)
    scale = jnp.sqrt(jnp.clip(cov, min=gp.var_floor))

    eps = jax.random.normal(key, (E,) + mean.shape, dtype=mean.dtype)
    f = mean + scale * eps  # (E, L, B)
    rate = softplus(model.V_raw[idx]) * jnp.einsum(
        "dl,eln->edn", softplus(model.W_raw), jnp.exp(f)
    )
    py = _count_py(model, rate)
    yb = jnp.swapaxes(y[idx], 0, 1) if y_transposed else y[:, idx]
    lp = py.unnormalized_log_prob(yb) if unnormalized else py.log_prob(yb)
    ll = jnp.sum(jnp.mean(lp, axis=0))

    trace = tri_kl_trace(cond.k_inv, lu_l)
    maha = jnp.einsum("lm,mk,lk->l", mu_l, cond.k_inv, mu_l)
    # log diag(Lu) = diag(Lu_raw) exactly (exp-diag bijector): a masked
    # sum of the raw tensor — no diagonal extraction, no log.
    raw_l = gp.Lu_raw if gp.Lu_raw.ndim == 3 else gp.Lu_raw[None]
    eye = jnp.eye(m_dim, dtype=bool)
    logdet_q = jnp.sum(jnp.where(eye, raw_l, 0.0), axis=(-2, -1))
    kl_terms = 0.5 * (trace + maha - m_dim) + cond.logdet_lzz - logdet_q
    # the generic path broadcasts qU against the L-batched prior: with
    # shared mu/Lu there are still n_factors identical KL terms.
    n_factors = mean.shape[0]
    kl = jnp.sum(kl_terms) * (n_factors // kl_terms.shape[0])
    return -(ll - kl)
