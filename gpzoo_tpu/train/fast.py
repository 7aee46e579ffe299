"""Production fast path for the NSF minibatch ELBO.

The generic :func:`gpzoo_tpu.train.elbo.negative_elbo_batched` evaluates
the GP on the whole minibatch at once; at Slideseq scale
(L=20, M=3000, B=7000) the backward pass of the (L, M, B) Cholesky solve
keeps ~29 GB of temporaries — twice one chip's HBM, even with remat.

This module computes the *identical* loss blockwise over the spot axis
(SURVEY.md §5's "sequence-parallel" strategy): the per-minibatch-independent
work (Kzz, its Cholesky, S = Lu Luᵀ, the KL) is hoisted out, and a
``lax.scan`` over micro-batches computes each chunk's Gram columns, solves
and Poisson log-likelihood under ``jax.checkpoint`` — peak live memory is
one micro-batch's worth of (L, M, mb) tensors, and the backward re-derives
each chunk independently.

Bit-compatibility with the generic path: the E reparameterization draws are
generated once for the full batch with the same key and shape the generic
path uses (``Normal.sample(key, (E,))`` → ``normal(key, (E, L, B))``), then
sliced per chunk — so loss values match the monolithic computation to
floating-point reassociation tolerance (asserted in tests/test_fast.py).

Supports the flagship :class:`gpzoo_tpu.models.NSF` head over an
(un)whitened SVGP prior, and the two-prior
:class:`gpzoo_tpu.models.HybridNSF` head (reference ``Hybrid_NSF2``,
likelihoods.py:100-165): the non-spatial half is a per-spot gather of the
mean-field parameters plus one elementwise KL, so it rides the same scan
with negligible extra cost (its (T, mb) chunks are tiny next to the GP's
(L, M, mb) projection).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.ad_checkpoint import checkpoint_name
from flax import struct

from gpzoo_tpu import dists
from gpzoo_tpu.bijectors import lower_cholesky, softplus
from gpzoo_tpu.gps.svgp import SVGP, WSVGP, LowRankWSVGP
from gpzoo_tpu.models.factorization import HybridNSFExact
from gpzoo_tpu.ops.linalg import (add_jitter, cholesky_inverse_mm,
                                  cholesky_mm, lowrank_whitened_kl,
                                  spd_inverse_from_cholesky,
                                  sqrt_safe_grad, tri_inverse, tril_logdet,
                                  whitened_kl)
from gpzoo_tpu.ops.tri_blocked import (tri_kl_trace, tri_matmul,
                                       tri_sq_colsum, tri_tri_matmul)
from gpzoo_tpu.train.policy import resolve_policy


def _matmul_kl(mu, lu, lzz, k_inv=None):
    """Σ_l KL(N(μ_l, Lu_l Lu_lᵀ) ‖ N(0, Kzz_l)) computed with matmuls
    against K⁻¹ instead of (L-batched) triangular solves (6 TF/s vs
    94 TF/s on v5e):

        KL_l = ½(tr(K_l⁻¹ S_l) + μ_lᵀK_l⁻¹μ_l − M) + log|Lzz_l| − log|Lu_l|.

    ``lzz`` may be shared (M, M) or per-factor (L, M, M); K⁻¹ itself is
    built by the blocked triangular inverse (ops.linalg.tri_inverse) —
    matmuls all the way down — unless a precomputed ``k_inv`` is passed
    (callers that already hold W = Lzz⁻¹ form K⁻¹ = WᵀW themselves so the
    blocked inverse runs exactly once). Returns (kl_sum, K⁻¹) so callers
    can reuse the inverse for the posterior projection.
    """
    m_dim = lzz.shape[-1]
    if k_inv is None:
        k_inv = spd_inverse_from_cholesky(lzz)
    lu_l = lu if lu.ndim == 3 else lu[None]
    mu_l = jnp.atleast_2d(jnp.asarray(mu))
    # panel-blocked: Lu's column panel k only touches K⁻¹'s trailing
    # block — ≈1/3 the dense einsum's FLOPs (ops/tri_blocked.py)
    trace = tri_kl_trace(k_inv, lu_l)
    if k_inv.ndim == 3 and mu_l.shape[0] != k_inv.shape[0]:
        mu_l = jnp.broadcast_to(mu_l, k_inv.shape[:1] + mu_l.shape[-1:])
    maha = jnp.einsum("lm,mk,lk->l" if k_inv.ndim == 2
                      else "lm,lmk,lk->l", mu_l, k_inv, mu_l)
    logdet_p = tril_logdet(lzz)  # scalar (shared) or (L,)
    logdet_q = tril_logdet(lu_l)
    kl = jnp.sum(0.5 * (trace + maha - m_dim) + logdet_p - logdet_q)
    return kl, k_inv


def _split_head(model):
    """Dispatch a factorization head into (poisson_head, gp, hybrid).

    ``poisson_head`` owns ``W_raw``; ``gp`` is the spatial prior. For
    :class:`~gpzoo_tpu.models.HybridNSF` the head is the spatial half
    ``model.sf`` and ``hybrid`` is True — the mean-field half is read off
    ``model.cf`` by the caller; :class:`~gpzoo_tpu.models.HybridNSFExact`
    (a ``HybridNSF`` subclass) takes the same dispatch — the ELBO bodies
    swap the reparameterized draw for its deterministic lognormal mean.
    :class:`~gpzoo_tpu.models.LegacyHybridNSF` is rejected loudly: its
    raw un-softplus'd concatenated loadings (likelihoods.py:287-293)
    need the trainer-side clamp and don't fit the softplus-rate scan
    body — use ``negative_elbo_hybrid_batched``.
    """
    if hasattr(model, "W2_raw"):
        raise NotImplementedError(
            "LegacyHybridNSF's raw-loadings rate is not supported by the "
            "fast path; use train.elbo.negative_elbo_hybrid_batched"
        )
    if hasattr(model, "sf") and hasattr(model, "cf"):
        return model.sf, model.sf.prior, True
    gp = getattr(model, "prior", None)
    if gp is None:
        gp = model.gp  # MGGPNSF / LegacyNSF attribute name
    return model, gp, False


def _count_py(head, rate):
    """The head's count likelihood at mean ``rate``: Poisson, or — when
    the head carries the per-gene dispersion field of
    :class:`gpzoo_tpu.models.NBNSF` — negative binomial. Both expose the
    unnormalized convention, so the log-prob call sites are shared."""
    r_raw = getattr(head, "r_raw", None)
    if r_raw is None:
        return dists.Poisson(rate)
    return dists.NegativeBinomial(softplus(r_raw)[:, None], rate)


def _exact_f(mean, scale):
    """HybridNSFExact's draw-free log-rate: μ + ½σ² so the rate uses the
    lognormal mean E[e^F] = exp(μ + ½σ²) (likelihoods.py:182-202). No E
    axis exists, so the downstream mean(axis=0) averages over D — the
    generic ``_expected_ll`` quirk on the exact head's (D, B) log-prob,
    replicated for bit-compatibility. Used by BOTH fast paths (batched
    and precomputed), GP and mean-field halves alike — keep them in
    lockstep here."""
    return mean + 0.5 * jnp.square(scale)


def _meanfield_kl(mean2, scale2, scale_pf):
    """Σ KL(N(m, s²) ‖ N(0, scale_pf²)) over a (T, B) mean-field slice —
    the hybrid head's second KL term (utilities.py:512-516)."""
    return jnp.sum(dists.kl_divergence(
        dists.Normal(mean2, scale2),
        dists.Normal(jnp.zeros_like(mean2),
                     scale_pf * jnp.ones_like(scale2)),
    ))


def _collapse_shared_kernel(kernel):
    """Take factor 0's hyperparameters of an L-batched kernel whose
    factors are known-equal (caller asserts) — Gram/Cholesky collapse.

    Gradient contract: loss VALUES are unchanged, but every factor's
    σ/ℓ gradient routes through factor 0's entry (the uncollapsed
    program distributes the same total per factor) — only the sum is
    meaningful, so train the hyperparameters through this collapse only
    if the optimizer treats them as one tied parameter; production
    configs freeze them (tests/test_fast_property.py)."""
    return kernel.replace(
        sigma=jnp.asarray(kernel.sigma).reshape(-1)[0],
        lengthscale=jnp.asarray(kernel.lengthscale).reshape(-1)[0],
    )


def __getattr__(name):
    # back-compat: the VNNGP fast paths moved to train/fast_vnngp.py
    # (round-3 verdict item 8 — splitting this module). Lazy so the two
    # modules never import each other at top level.
    if name in ("vnngp_nsf_negative_elbo_batched",
                "vnngp_nsf_negative_elbo_precomputed",
                "precompute_vnngp_conditioning", "VNNGPConditioning"):
        from gpzoo_tpu.train import fast_vnngp

        return getattr(fast_vnngp, name)
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")


def nsf_negative_elbo_batched(model, x, y, idx, key, E=1,
                              unnormalized=True, microbatch=1024,
                              factored=False, y_transposed=False,
                              shared_kernel=False, groups=None,
                              remat=True, stable_projection=None,
                              grad_precision=None, proj_precision=None,
                              chol_precision=None):
    """Blockwise minibatch −ELBO for NSF(SVGP/WSVGP) — same value as
    ``negative_elbo_batched(model, x, y, idx, key, E, unnormalized)``.

    Hybrid heads (:class:`gpzoo_tpu.models.HybridNSF`, incl. an MGGP
    spatial half via ``groups=``) are dispatched automatically and equal
    ``negative_elbo_hybrid_batched`` instead (tests/test_fast.py hybrid
    section; reference ``Hybrid_NSF2``, likelihoods.py:100-165).

    ``microbatch`` is the spot-axis block size; the minibatch is processed
    in ``ceil(B / microbatch)`` chunks (B padded virtually by clamping is
    NOT done — B must be divisible by microbatch; pick e.g. 7000 = 7×1000).

    ``factored=True`` reformulates the per-chunk work around per-step
    precomputed factors (see the inline derivation). For the unwhitened
    parameterization — shared OR per-factor Cholesky — the KL runs in
    matmul form against K⁻¹ (built by the blocked triangular inverse,
    ``ops.linalg.tri_inverse``) and every per-chunk triangular solve
    becomes a K⁻¹ matmul: ã = K⁻¹Kzx, cov = Kxx − colsum(Kzx ⊙ ã) +
    colsum((Luᵀã)²). The whitened parameterization likewise runs its
    projection as a matmul against W = Lzz⁻¹. v5e runs the batched
    solves these replace at ~6 TF/s vs ~94 TF/s for the matmuls.
    Identical math (float64-verified in tests); float32 values differ
    at roundoff.

    ``groups``: per-spot group labels (N,) for multi-group (MGGP) models —
    threaded into the group-aware kernel exactly like
    ``MGGP_NSF.forward_batched`` (likelihoods.py:344-361).

    ``grad_precision`` (static): matmul precision of the combined
    Cholesky+inverse *backward* on the per-factor (w_form) path — touches
    gradients only, never loss values. Auto (None): ``"default"`` (bf16
    inputs, f32 accumulation) for well-jittered configs (jitter ≥ 1e-2),
    ``"highest"`` otherwise — at the MGGP full scale the bf16 backward is
    156 ms/step faster with the held-out deviance identical to 4 decimals
    (31.5419 vs 31.5420) and the loss trajectory tracking to 4.5e-4 over
    32 steps (docs/PERFORMANCE.md). Pass an explicit value to override.

    ``proj_precision`` (static): matmul precision of the w_form chunk
    projection a = W·Kzx, which feeds ONLY the posterior variance (the
    mean uses the hoisted K⁻¹μ at HIGHEST). Auto (None): "high" for
    jitter ≥ 1e-2, else "highest"; see docs/PERFORMANCE.md for the
    measured A/B and the cancellation arithmetic that rules out
    bf16-default here.

    ``chol_precision`` (static): matmul precision of the hoisted
    W = Lzz⁻¹ / K⁻¹ VALUE chain — honored on every projection form
    (w_form's ``cholesky_inverse_mm``, the shared-Cholesky
    ``tri_inverse``/``spd_inverse_from_cholesky``, the whitened W).
    Auto (None): "high" only on the w_form path with jitter ≥ 1e-2
    (the configuration the A/B measured); "highest" everywhere else.
    """
    head, gp, hybrid = _split_head(model)
    # HybridNSFExact (likelihoods.py:182-202): the rate uses the
    # deterministic lognormal mean exp(μ + ½σ²) instead of MC draws — no
    # keys are consumed, no E axis exists, and the generic path's
    # mean(axis=0) then averages over D (a reference quirk replicated
    # for bit-compatibility).
    exact = isinstance(model, HybridNSFExact)
    if hybrid and not exact:
        # HybridNSF.batched splits the key: k1 → the GP half's draws,
        # k2 → the mean-field half's (factorization.py:163-167). Matching
        # the split keeps the fast loss bit-compatible with the generic
        # negative_elbo_hybrid_batched.
        key, key2 = jax.random.split(key)
    groups_z = getattr(gp, "groupsZ", None)
    whitened = isinstance(gp, WSVGP) and not isinstance(gp, SVGP)
    b = idx.shape[0]
    if b % microbatch:
        raise ValueError(f"batch {b} not divisible by microbatch {microbatch}")
    nc = b // microbatch

    kernel = gp.kernel
    # One-point Gram probe: the kernel's true leading (factor) batch
    # shape. σ, ℓ, or a group parameter may each carry the L axis, so
    # probing σ alone is wrong (a scalar-σ kernel with an L-batched ℓ
    # is still L-batched). eval_shape: no ops are ever dispatched.
    gz1 = None if groups_z is None else groups_z[:1]
    kernel_batch = jax.eval_shape(
        lambda: kernel.gram(gp.Z[:1], gp.Z[:1], gz1, gz1)
    ).shape[:-2]
    if shared_kernel:
        # All L factors share one (σ, ℓ) — the north-star configuration
        # (equal frozen hyperparameters, notebook cells 20+25). The Gram,
        # Cholesky, and per-chunk solve collapse to a single shared copy;
        # only the Lu/mu-dependent terms stay L-batched. (MGGP kernels
        # keep their batched group parameter, so the collapsed Gram may
        # legitimately stay (L, M, M) — the KL correction below keys on
        # the actual collapsed batch, not on `shared_kernel` itself.)
        kernel = _collapse_shared_kernel(kernel)
    # Cholesky/solve inputs are precision-critical: a bf16-matmul blocked
    # Cholesky of a jittered Gram visibly corrupts K⁻¹μ through the
    # exp-rate. Pin HIGHEST here regardless of the caller's global matmul
    # precision; the large well-conditioned chunk matmuls below run at the
    # caller's precision (bf16 error enters the variance as a ~1% squared
    # term — benign).
    with jax.default_matmul_precision("highest"):
        kzz = add_jitter(kernel.gram(gp.Z, gp.Z, groups_z, groups_z),
                         gp.jitter)
    # All static dispatch decisions — projection form, precision gates,
    # remat validation — resolve in one place (train/policy.py holds the
    # dispatch table and the measured rationale for each default).
    pol = resolve_policy(
        gp.jitter, whitened=whitened, factored=factored,
        per_factor_chol=kzz.ndim == 3,
        stable_projection=stable_projection,
        grad_precision=grad_precision, proj_precision=proj_precision,
        remat=remat, chol_precision=chol_precision)
    # Per-factor prior Choleskys (L, M, M) — the trainable-kernel
    # MGGP/NSF configuration — take the W-form path: (Lzz, W = Lzz⁻¹)
    # from ONE combined custom-VJP op, the KL trace as ‖W·Lu‖²_F, the
    # chunk projection as a = W·Kzx with colsum((Cᵀa)²), C = W·Lu.
    # No K⁻¹ is ever built: at full MGGP scale the (20, 3010, 3010)
    # K⁻¹ = WᵀW product and its backward dominated the step
    # (benchmarks/mggp_anatomy.py: 118 ms fwd of a 1025 ms step).
    w_form = pol.w_form
    # chol_precision: the hoisted VALUE path's W = Lzz⁻¹ blocked-inverse
    # matmuls. Threaded as an explicit argument — an outer
    # default_matmul_precision context is silently overridden by the
    # op's own inner context (the round-4 A/B no-op). HIGHEST unless a
    # measured A/B overrides (policy.py docstring); the Cholesky itself
    # is an XLA custom call either way.
    if isinstance(gp, LowRankWSVGP):
        raise NotImplementedError(
            "LowRankWSVGP is supported by nsf_negative_elbo_precomputed "
            "(its target workload freezes Z and the kernel, so the "
            "projection precomputes) and by the generic "
            "train.elbo.negative_elbo_batched for trainable geometry; "
            "the blockwise fast path's per-chunk machinery is built "
            "around the full Cholesky factor."
        )
    if w_form:
        # bwd_blocked panel-blocks the five VJP products only where
        # it measured a win: 1.22× at a HIGHEST backward, 0.98× at
        # bf16 (docs/PERFORMANCE.md, 2026-08-17 A/B).
        lzz, w_inv = cholesky_inverse_mm(
            kzz, pol.grad_precision, pol.bwd_blocked,
            pol.chol_precision)
    else:
        # matmul-form Cholesky VJP: with trainable kernels the
        # backward through chol(Kzz) is two ~6 TF/s batched solves in
        # stock XLA — cholesky_mm reverse-differentiates via the
        # blocked triangular inverse instead (frozen kernels DCE the
        # backward either way)
        lzz = cholesky_mm(kzz)
    lu = lower_cholesky(gp.Lu_raw)

    # Projection-form gate (see the derivation comment below): the
    # single-matmul K⁻¹Kzx subtrahend is O(κ²ε) worst-case vs the
    # norm-squared form's O(κε), so small-jitter configs take the stable
    # two-sided form (policy table; ``stable_projection`` overrides).
    stable_proj = pol.stable_projection
    # W = Lzz⁻¹ via the blocked triangular inverse — computed at most ONCE
    # and shared between the KL's K⁻¹ = WᵀW and the per-chunk projections.
    # (The w_form path above already holds W and never forms K⁻¹.)
    k_inv = None
    if factored and not w_form:
        if not whitened:
            w_inv = None
        # pol.chol_precision governs this W/K⁻¹ VALUE chain on every
        # path (auto resolves to HIGHEST here — policy.py table; the
        # explicit knob must not silently no-op off the w_form branch)
        if stable_proj:
            w_inv = tri_inverse(lzz, precision=pol.chol_precision)
        if not whitened:
            with jax.default_matmul_precision(pol.chol_precision):
                k_inv = (
                    jnp.einsum("...ki,...kj->...ij", w_inv, w_inv)
                    if w_inv is not None
                    else spd_inverse_from_cholesky(
                        lzz, precision=pol.chol_precision)
                )
    elif not factored:
        w_inv = None

    # KL term — batch-independent (utilities.py:616 keeps it unscaled).
    # When the Cholesky is shared across factors (shared_kernel +
    # factored), compute the MVN KL with matmuls against one small K⁻¹:
    #   KL_l = ½(tr(K⁻¹ Lu_l Lu_lᵀ) + μ_lᵀK⁻¹μ_l − M) + log|Lzz| − log|Lu_l|
    # — the generic path's batched (L, M, M) triangular solve runs at
    # ~6 TF/s on v5e vs ~94 TF/s for the equivalent matmuls.
    s = None
    c_wlu = None
    wmu = None
    if whitened:
        kl = jnp.sum(whitened_kl(gp.mu, lu))
    elif w_form:
        # W-form KL: tr(K⁻¹S) = ‖W·Lu‖²_F and μᵀK⁻¹μ = ‖Wμ‖² — C = W·Lu
        # (lower-triangular, panel-blocked product) and Wμ are reused by
        # every chunk's variance/mean below, so the KL itself is free.
        m_dim = lzz.shape[-1]
        lu_l = lu if lu.ndim == 3 else lu[None]
        mu_l = jnp.broadcast_to(
            jnp.atleast_2d(jnp.asarray(gp.mu)),
            lzz.shape[:1] + jnp.asarray(gp.mu).shape[-1:])
        # C feeds the KL trace (where HIGH's ~6e-5 relative error is
        # ~1e-4 of a trace-scale term — absolute noise on a 1e8 loss)
        # and the chunk variance term; the mean path (wmu, m_fac) stays
        # HIGHEST like the projection's mean contraction.
        with jax.default_matmul_precision(pol.proj_precision):
            c_wlu = tri_tri_matmul(w_inv, lu_l)
        with jax.default_matmul_precision("highest"):
            wmu = jnp.einsum("lij,lj->li", w_inv, mu_l)
            # m_fac = K⁻¹μ = Wᵀ(Wμ): the chunk mean contracts this
            # against Kzx at HIGHEST, decoupling the mean's precision
            # from the variance-only a-matmul (proj_precision below).
            m_fac_w = jnp.einsum("lij,li->lj", w_inv, wmu)
        trace = jnp.sum(jnp.square(c_wlu), axis=(-2, -1))
        maha = jnp.sum(jnp.square(wmu), axis=-1)
        kl = jnp.sum(
            0.5 * (trace + maha - m_dim)
            + tril_logdet(lzz) - tril_logdet(lu_l)
        )
    elif factored:
        # shared (M, M) or per-factor (L, M, M) prior Cholesky: matmul-form
        # KL against the K⁻¹ built above (reused by the projection below).
        kl, _ = _matmul_kl(gp.mu, lu, lzz, k_inv=k_inv)
    else:
        pu = dists.MultivariateNormalTril(jnp.zeros_like(gp.mu), lzz)
        qu = dists.MultivariateNormalTril(gp.mu, lu)
        kl = jnp.sum(dists.kl_divergence(qu, pu))
        # S = Lu Luᵀ is only consumed by the non-factored chunk path.
        s = jnp.einsum("...ij,...kj->...ik", lu, lu)
    post_batch = kzz.shape[:-2]
    if not whitened and post_batch != kernel_batch:
        # The generic path broadcasts qU against the L-batched prior
        # (pU scale = the pre-collapse (L, M, M) Lzz), so with shared
        # mu/Lu it sums L identical KL copies; the collapsed branches
        # above computed only broadcast(mu, Lu, collapsed-Lzz) copies.
        # Same correction as nsf_negative_elbo_precomputed. (The
        # whitened KL never sees the kernel — no correction, matching
        # the generic whitened_kl.)
        def _kl_copies(kb):
            n = 1
            for d in jnp.broadcast_shapes(jnp.shape(gp.mu)[:-1],
                                          jnp.shape(lu)[:-2], kb):
                n *= int(d)
            return n

        kl = kl * (_kl_copies(kernel_batch) // _kl_copies(post_batch))

    # Hybrid mean-field half (reference Hybrid_NSF2): qF2 is a per-spot
    # gather of the GaussianPrior's (T, N) parameters; its KL is one
    # elementwise (T, B) reduction — both batch-independent of the scan,
    # so they hoist like the GP KL. The KL-copies correction above applies
    # only to the GP KL (the generic path's mean-field KL has no kernel
    # broadcast), hence kl2 is added after it.
    mean2 = scale2 = eps2 = w2_sp = None
    if hybrid:
        prior2 = model.cf.prior
        mean2 = prior2.mean[:, idx]  # (T, B)
        scale2 = softplus(prior2.scale_raw[:, idx])
        w2_sp = softplus(model.cf.W_raw)  # (D, T)
        kl = kl + _meanfield_kl(mean2, scale2, prior2.scale_pf)
        if not exact:
            # bit-identical to Normal.sample(k2, (E,)) on the (T, B) slice
            eps2 = jax.random.normal(key2, (E,) + mean2.shape,
                                     dtype=jnp.result_type(mean2))

    # Per-step factored precomputations (see docstring). Every per-chunk
    # projection is a matmul (no triangular solves anywhere):
    #   whitened:     a = W Kzx (W = Lzz⁻¹, blocked inverse),
    #                 cov = Kxx − colsum(a²) + colsum((Luᵀa)²),
    #                 mean = (Wᵀμ)ᵀ Kzx
    #   unwhitened,   ã = K⁻¹Kzx (one matmul),
    #   jitter ≥ 1e-2: cov = Kxx − colsum(Kzx ⊙ ã) + colsum((Luᵀã)²)
    #   unwhitened,   a = W Kzx then ã = Wᵀa (two matmuls):
    #   jitter < 1e-2: cov = Kxx − colsum(a²) + colsum((Luᵀã)²)
    # The single-matmul subtrahend Kzx⊙ã sums signed terms — worst-case
    # O(κ²ε) vs the norm-squared form's O(κε) — so it is gated on the
    # (static) jitter: the Slideseq-class configs (jitter 1e-1, where it
    # is measured-safe: identical loss trajectory and held-out deviance)
    # keep the cheaper form; small-jitter configs take the stable one
    # (and ``stable_projection=`` overrides the auto-gate).
    # The w_form (per-factor) path needs no m_fac: mean = (Wμ)ᵀ(W·Kzx)
    # reuses the chunk's a-matmul, so nothing else is precomputed.
    if factored and not w_form:
        c_fac = lu
        mu_arr = jnp.asarray(gp.mu)
        with jax.default_matmul_precision("highest"):
            if whitened:
                mu_l = (jnp.atleast_2d(mu_arr) if w_inv.ndim == 2
                        else jnp.broadcast_to(
                            jnp.atleast_2d(mu_arr),
                            w_inv.shape[:1] + mu_arr.shape[-1:]))
                m_fac = jnp.einsum(
                    "km,lk->lm" if w_inv.ndim == 2 else "lkm,lk->lm",
                    w_inv, mu_l)  # Lzz⁻ᵀ μ = Wᵀ μ
                if mu_arr.ndim == 1 and w_inv.ndim == 2:
                    m_fac = m_fac[0]  # keep the unbatched qF shape
            elif k_inv.ndim == 3:
                mu_l = jnp.broadcast_to(
                    jnp.atleast_2d(mu_arr),
                    k_inv.shape[:1] + mu_arr.shape[-1:])
                m_fac = jnp.einsum("lij,lj->li", k_inv, mu_l)  # K⁻¹ μ
            else:
                m_fac = jnp.einsum("ij,...j->...i", k_inv, mu_arr)

    # One reparameterization draw for the whole batch, sliced per chunk —
    # bit-identical to Normal.sample(key, (E,)) on the full (L, B) marginal
    # (qF batch = broadcast of the kernel's L axis and mu's leading dims).
    mu = gp.mu
    # The generic path's qF marginal batch is the broadcast of the
    # PRE-collapse kernel batch (σ, ℓ, or group params may carry L),
    # mu's and Lu's leading dims — the L factors are distinct latent
    # functions even when every parameter is shared, so the draw stays
    # (E, L, b)-independent exactly like Normal.sample on the (L, B)
    # marginal.
    qf_batch = jnp.broadcast_shapes(kernel_batch, jnp.shape(mu)[:-1],
                                    jnp.shape(lu)[:-2])
    eps_shape = (E,) + qf_batch + (b,)
    # dtype must match Normal.sample's (result_type of the marginal loc)
    # for the draws to be bit-identical to the generic path.
    eps_dtype = jnp.result_type(
        x.dtype, jnp.asarray(mu).dtype,
        jax.eval_shape(lambda: kernel.diag(x[:1])).dtype)
    eps = (None if exact
           else jax.random.normal(key, eps_shape, dtype=eps_dtype))

    w_sp = softplus(head.W_raw)  # (D, L)
    v_sp = softplus(model.V_raw[idx])  # (B,)
    # y_transposed: caller stores counts spot-major (N, D) so the
    # minibatch gather is a contiguous row gather — the (D, N) layout
    # forces XLA to keep a full relayout copy (~0.7 GB at Slideseq scale)
    # resident for column gathers.
    n_axis = 0 if y_transposed else y.ndim - 1
    if y.shape[n_axis] != x.shape[0]:
        raise ValueError(
            f"y spot axis has {y.shape[n_axis]} entries but x has "
            f"{x.shape[0]} (y_transposed={y_transposed})"
        )
    if y_transposed:
        y_batch = jnp.swapaxes(y[idx], 0, 1)  # rows → (B, D) → (D, B)
    else:
        y_batch = y[:, idx]  # (D, B)
    x_batch = x[idx]  # (B, dim)
    groups_batch = groups[idx] if groups is not None else None

    # chunked axes → scan inputs
    def chunk(a, axis):
        return jnp.moveaxis(
            a.reshape(a.shape[:axis] + (nc, microbatch) + a.shape[axis + 1:]),
            axis, 0,
        )

    dummy = jnp.zeros((nc, 1))
    xs = (
        chunk(x_batch, 0),  # (nc, mb, dim)
        # (nc, E, L, mb) / (nc, E, mb); dummy on the draw-free exact path
        chunk(eps, eps.ndim - 1) if not exact else dummy,
        chunk(v_sp, 0),  # (nc, mb)
        chunk(y_batch, 1),  # (nc, D, mb)
        (chunk(groups_batch, 0) if groups_batch is not None
         else dummy),  # (nc, mb) group labels / dummy
        # hybrid mean-field half, chunked along spots (dummies otherwise)
        chunk(mean2, 1) if hybrid else dummy,  # (nc, T, mb)
        chunk(scale2, 1) if hybrid else dummy,  # (nc, T, mb)
        (chunk(eps2, eps2.ndim - 1) if hybrid and not exact
         else dummy),  # (nc, E, T, mb)
    )

    def chunk_ll(xc, epsc, vc, yc, gc, m2c, s2c, e2c):
        gc = gc if groups is not None else None
        kxx = kernel.diag(xc, gc)  # (L, mb) / (mb,)
        kzx = kernel.gram(gp.Z, xc, groups_z, gc)  # (L, M, mb) / (M, mb)
        kzx = checkpoint_name(kzx, "proj_kzx")
        if w_form:
            # ONE triangular matmul per chunk: a = W·Kzx (panel-blocked,
            # skipping W's structural zeros). Variance is the stable
            # norm-squared form colsum(a²) (O(κε)); the S-term reuses the
            # hoisted C = W·Lu as colsum((Cᵀa)²) — the ã = K⁻¹Kzx matmul
            # of the K⁻¹ path never happens. The mean contracts the
            # hoisted m_fac = K⁻¹μ against Kzx at HIGHEST regardless of
            # ``proj_precision`` (mean errors feed exp(F) directly; the
            # a-matmul feeds only the variance, where lower precision
            # enters as a squared term).
            # Auto: HIGH (3-pass bf16, rel err ~6e-5) for well-jittered
            # configs — the subtrahend's cancellation amplifies the
            # error ~20× into the posterior variance, so bf16-DEFAULT
            # (rel err ~4e-3) is ruled out by arithmetic, while HIGH
            # keeps it ~1e-3 and measured the held-out deviance
            # identical (31.5419) at 100 ms/step less than HIGHEST.
            with jax.default_matmul_precision(pol.proj_precision):
                a = tri_matmul(w_inv, kzx)  # (L, M, mb)
            # named for the selective-remat policy below: saving a (and
            # the Kzx it came from) trades ~2 HBM-resident (L, M, mb)
            # buffers for skipping the Gram + triangular-matmul recompute
            # in the backward pass.
            a = checkpoint_name(a, "proj_a")
            mean = jnp.einsum("lm,lmb->lb", m_fac_w, kzx,
                              precision=jax.lax.Precision.HIGHEST)
            cov = kxx - jnp.sum(jnp.square(a), axis=-2)
            cov = cov + tri_sq_colsum(c_wlu, a)
            scale = jnp.sqrt(jnp.clip(cov, min=gp.var_floor))
        elif factored:
            mean = jnp.einsum("...mn,...m->...n", kzx, m_fac,
                              precision=jax.lax.Precision.HIGHEST)
            if stable_proj:
                # a = Lzz⁻¹Kzx against the blocked inverse; norm-squared
                # subtrahend keeps the solve path's O(κε) error class
                with jax.default_matmul_precision("highest"):
                    a = jnp.einsum(
                        "ij,...jb->...ib" if w_inv.ndim == 2 else
                        "lij,ljb->lib", w_inv, kzx)
                a = checkpoint_name(a, "proj_a")
                cov = kxx - jnp.sum(jnp.square(a), axis=-2)
                if whitened:
                    cov = jnp.clip(cov, min=0.0)
                else:
                    # ã = Wᵀa = K⁻¹Kzx — Cᵀa becomes Luᵀã
                    with jax.default_matmul_precision("highest"):
                        a = jnp.einsum(
                            "ji,...jb->...ib" if w_inv.ndim == 2 else
                            "lji,ljb->lib", w_inv, a)
                    a = checkpoint_name(a, "proj_a")
            else:
                # big-jitter configs: one K⁻¹ matmul (measured-safe here)
                with jax.default_matmul_precision("highest"):
                    a = jnp.einsum(
                        "ij,...jb->...ib" if k_inv.ndim == 2 else
                        "lij,ljb->lib", k_inv, kzx)
                a = checkpoint_name(a, "proj_a")
                cov = kxx - jnp.sum(kzx * a, axis=-2)
            # c_fac = Lu is exactly lower-triangular (bijector output) —
            # the panel-blocked contraction skips the strictly-upper
            # panels (ops/tri_blocked.py); colsum((Luᵀa)²) covers both
            # parameterizations (whitened a, unwhitened ã).
            cov = cov + tri_sq_colsum(c_fac, a)
            if whitened:
                # zero-grad (not NaN) sqrt at cov=0; values unchanged
                scale = sqrt_safe_grad(cov)
            else:
                scale = jnp.sqrt(jnp.clip(cov, min=gp.var_floor))
        elif whitened:
            wt = jax.scipy.linalg.solve_triangular(lzz, kzx, lower=True)
            w = jnp.swapaxes(wt, -2, -1)
            cov = jnp.clip(kxx - jnp.sum(jnp.square(w), -1), min=0.0)
            wlu = jnp.einsum("...nm,...mk->...nk", w, lu)
            cov = cov + jnp.sum(jnp.square(wlu), -1)
            mean = jnp.einsum("...nm,...m->...n", w, mu)
            scale = sqrt_safe_grad(cov)
        else:
            w = jnp.swapaxes(
                jax.scipy.linalg.cho_solve((lzz, True), kzx), -2, -1
            )
            mean = jnp.einsum("...nm,...m->...n", w, mu)
            wd = jnp.einsum("...nm,...mk->...nk", w, s - kzz)
            cov = kxx + jnp.sum(wd * w, -1)
            scale = jnp.sqrt(jnp.clip(cov, min=gp.var_floor))
        if exact:
            f = _exact_f(mean, scale)  # (L, mb)
            # shared-mu configs leave the marginal unbatched here; the
            # MC path gets the L axis from eps's qf_batch shape
            f = jnp.broadcast_to(f, qf_batch + f.shape[-1:])
        else:
            f = mean + scale * epsc  # (E, L, mb)
        rate = jnp.einsum("dl,...ln->...dn", w_sp, jnp.exp(f))
        if hybrid:
            f2 = (_exact_f(m2c, s2c) if exact
                  else m2c + s2c * e2c)  # (T, mb) / (E, T, mb)
            rate = rate + jnp.einsum("dt,...tn->...dn", w2_sp, jnp.exp(f2))
        rate = vc * rate
        py = _count_py(head, rate)
        lp = (py.unnormalized_log_prob(yc) if unnormalized
              else py.log_prob(yc))
        return jnp.sum(jnp.mean(lp, axis=0))

    # remat: True = recompute everything in the backward (lowest memory);
    # "save_proj" keeps the named projection product resident (+1
    # (L, M, mb) buffer, skips the big-matmul recompute) — a = W·Kzx on
    # the w_form path, a/ã on every other factored branch (all tagged
    # "proj_a"); "save_proj_kzx" additionally keeps the Gram columns
    # (+2 buffers, also skips the Gram recompute). Validated + applied
    # by the policy (train/policy.py).
    chunk_fn = pol.wrap_remat(chunk_ll)

    def body(carry, inp):
        return carry + chunk_fn(*inp), None

    ll_dtype = jax.eval_shape(
        chunk_ll, *jax.tree_util.tree_map(lambda a: a[0], xs)
    ).dtype
    ll, _ = jax.lax.scan(body, jnp.zeros((), ll_dtype), xs)
    return -(ll - kl)


# ---------------------------------------------------------------------------
# Precomputed-projection path: the frozen-Z/frozen-kernel configuration
# ---------------------------------------------------------------------------

@struct.dataclass
class NSFProjection:
    """Step-invariant GP projection for frozen Z + frozen (shared) kernel.

    The TPU-scale generalization of the reference's precomputed-W posterior
    (``WSVGP.forward_precomputed``, gp.py:308-322): when the inducing
    locations and kernel hyperparameters do not train — the north-star
    Slideseq configuration (notebook cells 20, 25-26) — the Cholesky,
    triangular solves and K⁻¹ are constants. A trace of the fused step
    shows those XLA ``while`` loops cost ~95 ms of the 201 ms step at
    L=20, M=3000, B=7000 (docs/PERFORMANCE.md); precomputing the full-N
    projection once (ãᵀ is 540 MB at N=45k, M=3000) removes them.

    Fields (all constants w.r.t. training):
      proj_t — (N, M) spot-major projection rows: ã = K⁻¹Kzx (unwhitened)
               or a = Lzz⁻¹Kzx (whitened), transposed so minibatch
               gathers are contiguous row gathers,
      a2     — (N,) column sums of a² (the posterior-variance subtrahend),
      kxx    — kernel variance diag: scalar σ² or (L, 1),
      k_inv  — (M, M) Kzz⁻¹ for the matmul-form KL (None when whitened),
      logdet_lzz — Σ log diag Lzz (None when whitened),
      whitened   — static parameterization flag.
    """

    proj_t: jnp.ndarray
    a2: jnp.ndarray
    kxx: jnp.ndarray
    k_inv: jnp.ndarray = None
    logdet_lzz: jnp.ndarray = None
    whitened: bool = struct.field(pytree_node=False, default=False)


@jax.jit
def _proj_chol(kernel, z, jitter):
    with jax.default_matmul_precision("highest"):
        return jnp.linalg.cholesky(add_jitter(kernel.gram(z, z), jitter))


@functools.partial(jax.jit, static_argnums=(4,))
def _proj_block(lzz, kernel, z, xb, whitened):
    kzx = kernel.gram(z, xb)
    with jax.default_matmul_precision("highest"):
        a = jax.scipy.linalg.solve_triangular(lzz, kzx, lower=True)
        proj = a if whitened else jax.scipy.linalg.solve_triangular(
            lzz, a, lower=True, trans=1
        )
    return proj.T, jnp.sum(jnp.square(a), axis=0)


@jax.jit
def _kinv_logdet(lzz):
    return spd_inverse_from_cholesky(lzz), tril_logdet(lzz)


def precompute_nsf_projection(model, x, block=None):
    """Build :class:`NSFProjection` for ``model`` over all spots ``x``.

    Requires a shared kernel across factors (the per-factor hyperparameters
    are known-equal — the north-star init); asserts nothing, collapses to
    factor 0 like ``shared_kernel=True``. ``block`` bounds the (M, block)
    solve working set (default: one pass over all N).
    """
    _, gp, _ = _split_head(model)
    whitened = (isinstance(gp, (WSVGP, LowRankWSVGP))
                and not isinstance(gp, SVGP))
    kernel = _collapse_shared_kernel(gp.kernel)
    n = x.shape[0]
    block = n if block is None else block
    # jitted pieces: eager op dispatch through the TPU tunnel costs up
    # to ~1 s per op, and the build is a few dozen ops (Gram, Cholesky,
    # solves, the blocked-recursion inverse)
    lzz = _proj_chol(kernel, gp.Z, gp.jitter)
    rows, a2s = [], []
    for s in range(0, n, block):
        pt, a2b = _proj_block(lzz, kernel, gp.Z, x[s:s + block], whitened)
        rows.append(pt)
        a2s.append(a2b)
    proj_t = jnp.concatenate(rows, axis=0) if len(rows) > 1 else rows[0]
    a2 = jnp.concatenate(a2s) if len(a2s) > 1 else a2s[0]
    k_inv = logdet = None
    if not whitened:
        k_inv, logdet = _kinv_logdet(lzz)
    # Variance diag of the ORIGINAL kernel, explicitly broadcast to the
    # kernel's true factor batch (a 1-point Gram probe): its (L, 1)
    # shape carries the factor count into the qF batch shape and the KL
    # copy count downstream. σ alone is not a reliable probe — a
    # scalar-σ kernel with an L-batched ℓ is still L-batched.
    kxx = jnp.asarray(gp.kernel.variance_vector())
    pre_batch = jax.eval_shape(
        lambda: gp.kernel.gram(gp.Z[:1], gp.Z[:1], None, None)
    ).shape[:-2]
    if pre_batch:
        kxx = jnp.broadcast_to(kxx.reshape(-1, 1), (pre_batch[0], 1))
    return NSFProjection(
        proj_t=jax.block_until_ready(proj_t), a2=a2,
        kxx=kxx, k_inv=k_inv, logdet_lzz=logdet,
        whitened=whitened,
    )


def nsf_negative_elbo_precomputed(model, proj, y, idx, key, E=1,
                                  unnormalized=True, y_transposed=False):
    """Minibatch −ELBO for NSF(SVGP/WSVGP) from a frozen projection —
    identical math to ``negative_elbo_batched`` when Z and the kernel are
    frozen (float64-verified in tests/test_fast.py), with zero per-step
    Cholesky/solve work:

        mean   = μ ãᵀ_b                             (one (L,M)×(M,B) matmul)
        cov    = σ² − a²_b + colsum((Luᵀ ã_b)²)     (one L-batched matmul)
        KL     = matmul form against the precomputed K⁻¹ / whitened KL

    The reparameterization draws match ``Normal.sample(key, (E,))`` on the
    (L, B) marginal bit-for-bit, so the loss trajectory is the generic
    path's trajectory up to float reassociation.
    """
    head, gp, hybrid = _split_head(model)
    exact = isinstance(model, HybridNSFExact)  # draw-free lognormal mean
    lowrank = isinstance(gp, LowRankWSVGP)
    if hybrid and not exact:
        key, key2 = jax.random.split(key)  # HybridNSF.batched's (k1, k2)
    mu_l = jnp.atleast_2d(jnp.asarray(gp.mu))

    pt = proj.proj_t[idx]  # (B, M) contiguous row gather
    at = pt.T  # (M, B): the dot-friendly orientation (one 84 MB relayout
    # beats XLA transposing the 720 MB lu operand inside the big fusion)
    with jax.default_matmul_precision("highest"):
        mean = jnp.einsum("lm,mb->lb", mu_l, at)
    if lowrank:
        # Low-rank-plus-diagonal q(v): colsum(ãᵀ S ã) = D-weighted column
        # norms + colsum((Vᵀã)²) — two thin matmuls (O((r+1)·M·B) FLOPs vs
        # the full path's O(M²·B/2)); no (L, M, M) tensor exists.
        d2_l = jnp.atleast_2d(jnp.square(softplus(gp.d_raw)))  # (Ld, M)
        v_l = gp.V if gp.V.ndim == 3 else gp.V[None]  # (Lv, M, r)
        c2 = jnp.einsum("lm,mb->lb", d2_l, jnp.square(at))
        c2 = c2 + jnp.sum(
            jnp.square(jnp.einsum("lmr,mb->lrb", v_l, at)), axis=-2
        )
    else:
        lu = lower_cholesky(gp.Lu_raw)
        lu_l = lu if lu.ndim == 3 else lu[None]
        m_dim = lu.shape[-1]
        # Panel-blocked triangular contraction: skips Lu's structural-zero
        # panels AND replaces the pathological ~45 ms monolithic XLA
        # backward dLu fusion with per-panel dots (measured 47.6 → 26.6 ms
        # fwd+bwd at this shape — ops/tri_blocked.py).
        c2 = tri_sq_colsum(lu_l, at)  # (L, B)
    base = jnp.asarray(proj.kxx) - proj.a2[idx]  # (B,) or (L, B)
    if proj.whitened:
        cov = jnp.clip(base, min=0.0) + c2
    else:
        cov = jnp.clip(base + c2, min=getattr(gp, "var_floor", 1e-6))
    mean, cov = jnp.broadcast_arrays(mean, cov)
    scale = sqrt_safe_grad(cov)

    if exact:
        f = _exact_f(mean, scale)  # (L, B)
    else:
        eps = jax.random.normal(key, (E,) + mean.shape, dtype=mean.dtype)
        f = mean + scale * eps  # (E, L, B)
    rate = jnp.einsum("dl,...ln->...dn", softplus(head.W_raw), jnp.exp(f))
    kl2 = 0.0
    if hybrid:
        # mean-field half: per-spot gather + reparameterized draw with the
        # split key (bit-identical to HybridNSF.batched's f2), plus the
        # elementwise second KL term.
        prior2 = model.cf.prior
        mean2 = prior2.mean[:, idx]  # (T, B)
        scale2 = softplus(prior2.scale_raw[:, idx])
        if exact:
            f2 = _exact_f(mean2, scale2)  # (T, B)
        else:
            eps2 = jax.random.normal(key2, (E,) + mean2.shape,
                                     dtype=jnp.result_type(mean2))
            f2 = mean2 + scale2 * eps2
        rate = rate + jnp.einsum("dt,...tn->...dn", softplus(model.cf.W_raw),
                                 jnp.exp(f2))
        kl2 = _meanfield_kl(mean2, scale2, prior2.scale_pf)
    rate = softplus(model.V_raw[idx]) * rate
    py = _count_py(head, rate)
    yb = jnp.swapaxes(y[idx], 0, 1) if y_transposed else y[:, idx]
    lp = py.unnormalized_log_prob(yb) if unnormalized else py.log_prob(yb)
    ll = jnp.sum(jnp.mean(lp, axis=0))

    if lowrank:
        kl = jnp.sum(lowrank_whitened_kl(
            gp.mu, gp.V, jnp.square(softplus(gp.d_raw))))
    elif proj.whitened:
        kl = jnp.sum(whitened_kl(gp.mu, lu))
    else:
        trace = tri_kl_trace(proj.k_inv, lu_l)
        maha = jnp.einsum("lm,mk,lk->l", mu_l, proj.k_inv, mu_l)
        # log diag(Lu) = diag(Lu_raw) exactly (exp-diag bijector): a masked
        # sum of the raw tensor — no diagonal extraction, no log.
        raw_l = gp.Lu_raw if gp.Lu_raw.ndim == 3 else gp.Lu_raw[None]
        eye = jnp.eye(m_dim, dtype=bool)
        logdet_q = jnp.sum(jnp.where(eye, raw_l, 0.0), axis=(-2, -1))
        kl_terms = (
            0.5 * (trace + maha - m_dim) + proj.logdet_lzz - logdet_q
        )
        # the generic path broadcasts qU against the L-batched prior
        # (kl_divergence(qu, pu) with pu batch = kernel L): with shared
        # mu/Lu there are still n_factors identical KL terms.
        n_factors = mean.shape[0]
        kl = jnp.sum(kl_terms) * (n_factors // kl_terms.shape[0])
    return -(ll - kl - kl2)
