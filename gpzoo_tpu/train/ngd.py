"""Natural-gradient variational inference for q(u) (beyond-reference).

The reference (and this repo's Adam paths) optimize the variational
Gaussian q(u) = N(m, S) by plain gradient descent on an unconstrained
Cholesky factor — ignoring the information geometry of the Gaussian
family. Natural-gradient VI (NGVI; Hensman et al. 2013, Salimbeni et
al. 2018 "Natural Gradients in Practice") instead updates the natural
parameters

    θ1 = S⁻¹ m,     θ2 = −½ S⁻¹

with the gradient of the ELBO w.r.t. the EXPECTATION parameters
η = (m, S + m mᵀ):

    θ ← θ + ρ ∂ELBO/∂η,
    ∂ELBO/∂η1 = ∂ELBO/∂m − 2 (∂ELBO/∂S) m,
    ∂ELBO/∂η2 = ∂ELBO/∂S.

For conjugate (Gaussian) likelihoods one step with ρ=1 lands on the
exact posterior (pinned in tests/test_ngd.py); for the Poisson/NB heads
it is the classic SVGP accelerator — far fewer steps than Adam on the
same objective. Model hyperparameters (W, V, dispersion) keep their
Adam updates from the same loss evaluation.

TPU-native formulation (north-star configuration: frozen Z/kernel,
precomputed projection :class:`gpzoo_tpu.train.fast.NSFProjection`):

* the state carries the per-factor PRECISION P = S⁻¹ and its Cholesky;
  S is rebuilt per step by the blocked matmul-form inverse
  (``ops.linalg.spd_inverse_from_cholesky``) — matmuls run ~94 TF/s on
  v5e vs ~6 for batched solves (docs/PERFORMANCE.md);
* the ELBO is evaluated directly in (m, S): the posterior-variance term
  ãᵀSã is linear in S and the −½ log det S gradient is analytically
  ``−½ P`` (added outside autodiff), so no Cholesky ever enters the
  gradient graph;
* the natural update is two symmetric matmul/axpy ops plus ONE new
  (L, M, M) Cholesky of P′ per step.

Scope: NSF-family heads over an unwhitened SVGP with per-factor
(L, M) mu / (L, M, M) q(u) covariance and frozen geometry — exactly the
north-star workload. Other configurations keep the Adam paths.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import optax
from flax import struct
from jax.sharding import NamedSharding, PartitionSpec

from gpzoo_tpu import dists
from gpzoo_tpu.bijectors import lower_cholesky, lower_cholesky_inverse, softplus
from gpzoo_tpu.ops.linalg import spd_inverse_from_cholesky, tri_inverse
from gpzoo_tpu.train.fast import _count_py
from gpzoo_tpu.train.loop import partition_optimizer, trainable_mask


@struct.dataclass
class NGDTrainState:
    """Training state for the hybrid NGD(q(u)) + Adam(head) optimizer.

    ``model.prior.mu`` holds the current variational mean m (kept in
    sync every step so posterior extraction works on ``model`` as
    usual); ``model.prior.Lu_raw`` is NOT updated during training —
    call :func:`ngd_to_model` to write the final covariance back."""

    model: Any
    prec: Any        # (L, M, M) P = S⁻¹
    prec_chol: Any   # chol(P), kept in lockstep with prec
    opt_state: Any   # Adam state for the non-q(u) leaves
    step: Any
    key: Any


def _init_precision(gp):
    lu = lower_cholesky(gp.Lu_raw)
    lu = lu if lu.ndim == 3 else lu[None]
    w = tri_inverse(lu)             # Lu⁻¹
    prec = jnp.einsum("lkm,lkn->lmn", w, w)  # Lu⁻ᵀ Lu⁻¹ = S⁻¹
    return prec, jnp.linalg.cholesky(prec)


def ngd_create(model, optimizer, key):
    """Build an :class:`NGDTrainState` from an NSF-family model whose
    prior carries per-factor (L, M) mu and (L, M, M) Lu_raw — NSF and
    NBNSF (the NB dispersion head trains under the Adam partition and
    the count likelihood dispatches through ``fast._count_py``)."""
    gp = getattr(model, "prior", None)
    if gp is None or not hasattr(gp, "Lu_raw"):
        raise ValueError(
            "NGD needs an NSF-family model whose .prior is an SVGP-style "
            "posterior with per-factor (L, M) mu and (L, M, M) Lu_raw; "
            f"got {type(model).__name__}. Hybrid heads (sf/cf halves — "
            "the (m, S) ELBO has no mean-field term) and mean-field "
            "priors keep the Adam paths."
        )
    mu = jnp.asarray(gp.mu)
    if mu.ndim != 2 or jnp.asarray(gp.Lu_raw).ndim != 3:
        raise ValueError(
            "NGD needs the per-factor layout: mu (L, M), Lu_raw "
            f"(L, M, M); got mu {mu.shape}, Lu_raw "
            f"{jnp.asarray(gp.Lu_raw).shape}"
        )
    prec, prec_chol = _init_precision(gp)
    mask = trainable_mask(
        model,
        lambda path: not (
            path.endswith(".mu") or path.endswith(".Lu_raw")
            or path.endswith(".Z") or ".kernel." in path
        ),
    )
    opt = partition_optimizer(optimizer, mask)
    return NGDTrainState(
        model=model, prec=prec, prec_chol=prec_chol,
        opt_state=opt.init(model), step=jnp.asarray(0, jnp.int32),
        key=jnp.copy(key),
    ), opt


def _ngd_negative_elbo_nologdet(model, s, proj, y, idx, key, E,
                                unnormalized=True, y_transposed=False):
    """−ELBO in (m, S) from a frozen projection, WITHOUT the −½ log det S
    KL term (its S-gradient is added analytically as −½P by the step;
    its value is added back from the carried Cholesky). Matches
    ``nsf_negative_elbo_precomputed`` in value once the log det is added
    (float64-pinned in tests/test_ngd.py)."""
    gp = model.prior
    mu_l = jnp.asarray(gp.mu)  # (L, M)

    pt = proj.proj_t[idx]  # (B, M)
    at = pt.T  # (M, B)
    with jax.default_matmul_precision("highest"):
        mean = jnp.einsum("lm,mb->lb", mu_l, at)
    sa = jnp.einsum("lmk,kb->lmb", s, at)  # (L, M, B)
    c2 = jnp.einsum("mb,lmb->lb", at, sa)  # ãᵀ S ã
    base = jnp.asarray(proj.kxx) - proj.a2[idx]
    cov = jnp.clip(base + c2, min=getattr(gp, "var_floor", 1e-6))
    mean, cov = jnp.broadcast_arrays(mean, cov)
    scale = jnp.sqrt(cov)

    eps = jax.random.normal(key, (E,) + mean.shape, dtype=mean.dtype)
    f = mean + scale * eps
    rate = jnp.einsum("dl,...ln->...dn", softplus(model.W_raw), jnp.exp(f))
    rate = softplus(model.V_raw[idx]) * rate
    py = _count_py(model, rate)
    yb = jnp.swapaxes(y[idx], 0, 1) if y_transposed else y[:, idx]
    lp = py.unnormalized_log_prob(yb) if unnormalized else py.log_prob(yb)
    ll = jnp.sum(jnp.mean(lp, axis=0))

    m_dim = mu_l.shape[-1]
    with jax.default_matmul_precision("highest"):
        trace = jnp.einsum("mk,lmk->l", proj.k_inv, s)
        maha = jnp.einsum("lm,mk,lk->l", mu_l, proj.k_inv, mu_l)
    kl_nologdet = jnp.sum(
        0.5 * (trace + maha - m_dim) + proj.logdet_lzz
    )
    return -(ll - kl_nologdet)


def natural_update(m, prec, g_m, g_s, rho):
    """One NGVI step on N(m, S=P⁻¹) given DESCENT gradients of the
    negative ELBO w.r.t. (m, S): returns (m′, P′, chol(P′)).

    θ2' = θ2 + ρ ∂ELBO/∂S  ⇒  P′ = P + 2ρ g_s  (g_s = ∂(−ELBO)/∂S)
    θ1' = Pm + ρ ∂ELBO/∂η1 ⇒  θ1′ = Pm − ρ (g_m − 2 g_s m)
    m′ = P′⁻¹ θ1′ (two triangular solves against chol(P′)).
    """
    g_s = 0.5 * (g_s + jnp.swapaxes(g_s, -1, -2))
    prec_new = prec + 2.0 * rho * g_s
    prec_new = 0.5 * (prec_new + jnp.swapaxes(prec_new, -1, -2))
    with jax.default_matmul_precision("highest"):
        theta1 = jnp.einsum("lmk,lk->lm", prec, m)
        gsm = jnp.einsum("lmk,lk->lm", g_s, m)
    theta1_new = theta1 - rho * (g_m - 2.0 * gsm)
    chol_new = jnp.linalg.cholesky(prec_new)
    m_new = jax.scipy.linalg.cho_solve(
        (chol_new, True), theta1_new[..., None]
    )[..., 0]
    return m_new, prec_new, chol_new


def natural_update_guarded(m, prec, prec_chol, g_m, g_s, rho):
    """:func:`natural_update` with the standard non-conjugate PD guard:
    a factor whose proposed P′ leaves the PD cone (its Cholesky NaNs —
    always possible for a sign-indefinite single-sample data-term
    gradient at too-large ρ) REJECTS this step's natural update and
    keeps (m, P) — the next step retries at the ramped ρ. Rejections are
    per factor; accepted factors proceed. Returns
    (m′, P′, chol(P′), rejected_count)."""
    m_new, prec_new, chol_new = natural_update(m, prec, g_m, g_s, rho)
    bad = ~jnp.all(jnp.isfinite(chol_new), axis=(-2, -1))  # (L,)
    # Overflowed-but-finite P′ can still yield a non-finite mean solve
    # (or a finite chol with an inf θ1′): reject those factors too.
    bad |= ~jnp.all(jnp.isfinite(m_new), axis=-1)
    m_new = jnp.where(bad[:, None], m, m_new)
    prec_new = jnp.where(bad[:, None, None], prec, prec_new)
    chol_new = jnp.where(bad[:, None, None], prec_chol, chol_new)
    return m_new, prec_new, chol_new, jnp.sum(bad)


def make_ngd_train_step(optimizer, num_points, batch_size, nat_lr,
                        ramp_steps=0, static_kwargs=None, donate=False,
                        mesh=None, axis_name="data", state_shardings=None,
                        max_f=60.0):
    """Step factory: NGD on (mu, q(u) covariance) + ``optimizer`` (Adam)
    on every other trainable leaf, from ONE loss/grad evaluation.

    ``nat_lr``: the natural step size ρ. ``ramp_steps`` > 0 ramps ρ
    linearly from ``nat_lr/100`` to ``nat_lr`` over that many steps —
    the standard guard for non-conjugate likelihoods, where a full-size
    first step can push P off the PD cone. ``optimizer`` must be the
    PARTITIONED optimizer returned by :func:`ngd_create`.

    Sharded (SPMD) operation, mirroring
    :func:`gpzoo_tpu.parallel.make_sharded_batched_train_step`: pass
    ``mesh`` to constrain the minibatch index vector to
    ``P(axis_name)`` — the batch-indexed tensors (projection gather,
    ãᵀSã, the E×D×B rate matmul, the log-likelihood) then partition over
    their B axis and XLA reduces the gradients over ICI. The per-factor
    NGD state (mu, prec, prec_chol, and their natural update incl. the
    L-batched Cholesky) partitions over a "factor" axis when
    ``state_shardings`` (e.g. from :func:`gpzoo_tpu.parallel.
    factor_shardings`, which covers prec/prec_chol) is pinned as the
    output sharding.

    ``max_f``: rate-overflow trust guard (None disables). The PD guard
    alone cannot prevent the deadlock mode where one ACCEPTED update
    lands the mean on a state whose log-rate F = mᵀã overflows ``exp``
    in float32 (≈88.7) — every subsequent loss is then non-finite and
    the skip-on-non-finite guard can never recover (measured at
    north-star scale: nat_lr 0.02 poisons mu on step 1 and skips the
    remaining 399 steps; docs/PERFORMANCE.md). A factor whose UPDATED
    mean function exceeds ``max_f`` in magnitude on this step's
    minibatch rejects its natural update exactly like a PD failure; 60
    keeps Σ_l softplus(W)·exp(F_l) finite in float32 with huge margin
    while sitting far beyond any sane count-data log-rate."""
    import functools

    static_kwargs = dict(static_kwargs or {})
    idx_sharding = None
    jit_kwargs = {}
    if donate:
        jit_kwargs["donate_argnums"] = (0,)
    if mesh is not None:
        axes = (axis_name,) if isinstance(axis_name, str) else tuple(
            axis_name)
        n_way = 1
        for a in axes:
            n_way *= mesh.shape[a]
        if batch_size % n_way != 0:
            raise ValueError(
                f"batch_size={batch_size} not divisible by mesh axes "
                f"{axes}={n_way}"
            )
        idx_sharding = NamedSharding(mesh, PartitionSpec(axes))
        if state_shardings is not None:
            jit_kwargs["out_shardings"] = (
                state_shardings, NamedSharding(mesh, PartitionSpec()))
    elif state_shardings is not None:
        raise ValueError("state_shardings requires mesh")

    @functools.partial(jax.jit, **jit_kwargs)
    def step(state, proj, y):
        next_key, k_idx, k_sample = jax.random.split(state.key, 3)
        idx = jax.random.choice(
            k_idx, num_points, shape=(batch_size,), replace=False
        )
        if idx_sharding is not None:
            idx = jax.lax.with_sharding_constraint(idx, idx_sharding)
        s = spd_inverse_from_cholesky(state.prec_chol)
        s = 0.5 * (s + jnp.swapaxes(s, -1, -2))

        def loss_fn(model, s):
            return _ngd_negative_elbo_nologdet(
                model, s, proj, y, idx, k_sample, **static_kwargs)

        loss, (g_model, g_s) = jax.value_and_grad(loss_fn, argnums=(0, 1))(
            state.model, s)
        # analytic −½ log det S pieces (the KL's −logdet_q term): value
        # from the carried Cholesky — −½ logdet S = +Σ log diag chol(P)
        # — and S-gradient −½ S⁻¹ = −½ P on the negative ELBO
        eye = jnp.eye(state.prec.shape[-1], dtype=bool)
        logdet_p_half = jnp.sum(
            jnp.log(jnp.where(eye, state.prec_chol, 1.0)))
        loss = loss + logdet_p_half
        g_s = g_s - 0.5 * state.prec

        rho = jnp.asarray(nat_lr, s.dtype)
        if ramp_steps:
            frac = jnp.minimum(1.0, (state.step + 1) / ramp_steps)
            rho = rho * (0.01 + 0.99 * frac)
        m_new, prec_new, chol_new, _ = natural_update_guarded(
            state.model.prior.mu, state.prec, state.prec_chol,
            g_model.prior.mu, g_s, rho)
        if max_f is not None:
            # rate-overflow trust guard (see docstring): reject factors
            # whose updated mean function leaves the exp-safe region on
            # this minibatch, exactly like a PD failure.
            at = proj.proj_t[idx].T  # (M, B), same gather as the loss
            f_new = jnp.einsum("lm,mb->lb", m_new, at)
            f_abs = jnp.max(jnp.abs(f_new), axis=-1)  # (L,)
            bad_f = ~(f_abs <= max_f)  # catches NaN too
            mu_old = state.model.prior.mu
            m_new = jnp.where(bad_f[:, None], mu_old, m_new)
            prec_new = jnp.where(bad_f[:, None, None], state.prec,
                                 prec_new)
            chol_new = jnp.where(bad_f[:, None, None], state.prec_chol,
                                 chol_new)

        updates, opt_state = optimizer.update(
            g_model, state.opt_state, state.model)
        model = optax.apply_updates(state.model, updates)
        model = model.replace(prior=model.prior.replace(mu=m_new))
        # A non-finite loss means every gradient is garbage: skip the
        # ENTIRE update (head + natural) so one overflowed MC draw can't
        # poison the Adam moments — the next step retries with a fresh
        # minibatch/sample key. The per-factor PD guard above already
        # handles the finite-loss/indefinite-P′ case.
        ok = jnp.isfinite(loss)

        def _sel(new, old):
            return jnp.where(ok, new, old)

        model = jax.tree.map(_sel, model, state.model)
        opt_state = jax.tree.map(_sel, opt_state, state.opt_state)
        prec_new = _sel(prec_new, state.prec)
        chol_new = _sel(chol_new, state.prec_chol)
        return (
            state.replace(model=model, prec=prec_new, prec_chol=chol_new,
                          opt_state=opt_state, step=state.step + 1,
                          key=next_key),
            loss,
        )

    return step


def ngd_to_model(state):
    """Write the NGD covariance back into the model's ``Lu_raw`` so the
    standard posterior-extraction / checkpoint paths see the trained
    q(u): Lu = chol(S) with S = P⁻¹."""
    s = spd_inverse_from_cholesky(state.prec_chol)
    s = 0.5 * (s + jnp.swapaxes(s, -1, -2))
    lu = jnp.linalg.cholesky(s)
    return state.model.replace(
        prior=state.model.prior.replace(Lu_raw=lower_cholesky_inverse(lu))
    )
