"""Fast-path dispatch policy: projection form, precision gates, remat.

`train/fast.py`'s blockwise ELBO carries several static knobs whose
*defaults* are measured decisions (docs/PERFORMANCE.md).  This module is
the one place those decisions live; the loss functions only consume the
resolved :class:`FastPathPolicy`.

Dispatch table (config → resolved policy):

| prior Cholesky       | whitened | w_form | projection form          |
|----------------------|----------|--------|--------------------------|
| per-factor (L, M, M) | no       | yes    | a = W·Kzx, cov −= Σa² (stable O(κε), no gate needed) |
| shared (M, M)        | no       | no     | jitter ≥ 1e-2 → ã = K⁻¹Kzx (one matmul); jitter < 1e-2 or ``stable_projection=True`` → two-sided a = W·Kzx, ã = Wᵀa |
| any                  | yes      | no     | a = W·Kzx, cov −= Σa² (whitened is inherently the stable form) |

| knob             | auto rule (None)                    | measured basis |
|------------------|-------------------------------------|----------------|
| grad_precision   | "default" if jitter ≥ 1e-2 else "highest" | bf16 backward −156 ms/step at MGGP scale; deviance identical to 4 decimals (PERFORMANCE.md MGGP table) |
| proj_precision   | "high" if jitter ≥ 1e-2 else "highest"    | HIGH keeps the ~20× cancellation amplification at ~1e-3 in the variance; bf16-DEFAULT ruled out by arithmetic |
| chol_precision   | "high" if jitter ≥ 1e-2 AND w_form else "highest" | the W = Lzz⁻¹ VALUE path feeds the posterior mean, so HIGH needed its own A/B: trajectory 4e-5 rel after 56 steps, deviance 31.5423 vs 31.5418, −5.5 ms/step (2.626→2.665 steps/s); the big jitter caps κ — small-jitter configs stay HIGHEST, and the non-w_form W/K⁻¹ builders (shared-Cholesky, whitened) keep HIGHEST — their own A/B (NSF fast leg, M=3000 shared K⁻¹) measured a wash: 21.77 vs 21.72 steps/s, one shared inverse per step is ~L× less precision-sensitive work than MGGP's per-factor ones (explicit values are honored on every path) |
| bwd_blocked      | grad_precision == "highest"          | panel-blocked VJP 1.22× at HIGHEST, 0.98× wash at bf16 |
| stable_projection| jitter < 1e-2 (non-w_form, unwhitened) | O(κ²ε) single-matmul subtrahend vs O(κε) norm-squared form |
| remat            | caller-chosen: True / False / "save_proj" / "save_proj_kzx" | "save_proj" keeps the named a-product resident (−49 ms at MGGP scale) |

The precision gates key on the *static* jitter because it is the one
config value that tracks the Gram's conditioning class in every shipped
workload (jitter 1e-1 Slideseq configs vs 1e-4 toy regressions); callers
with atypical conditioning pass explicit values.
"""

from __future__ import annotations

import dataclasses

import jax

REMAT_POLICIES = (True, False, "save_proj", "save_proj_kzx")

#: matmul precision strings the fast path accepts (the jax
#: default_matmul_precision vocabulary used by the measured A/Bs)
PRECISIONS = ("default", "high", "highest")

#: jitter at or above this is "well-conditioned" for the bf16/HIGH gates
WELL_JITTERED = 1e-2


@dataclasses.dataclass(frozen=True)
class FastPathPolicy:
    """Resolved static dispatch decisions for one fast-loss trace."""

    w_form: bool
    stable_projection: bool
    grad_precision: str
    proj_precision: str
    bwd_blocked: bool
    remat: object  # True | False | "save_proj" | "save_proj_kzx"
    # matmul precision of the hoisted Cholesky/W=Lzz⁻¹ VALUE path.
    # Unlike the variance-only paths, W feeds the posterior MEAN
    # (Wμ → K⁻¹μ → exp-rate) where errors pass through exp unsquared —
    # so HIGH is gated on the big-jitter conditioning class AND its own
    # measured A/B (module table; docs/PERFORMANCE.md, MGGP section).
    chol_precision: str = "highest"

    def wrap_remat(self, chunk_fn):
        """Apply the rematerialization policy to the per-chunk body."""
        if self.remat in ("save_proj", "save_proj_kzx"):
            names = (("proj_a",) if self.remat == "save_proj"
                     else ("proj_a", "proj_kzx"))
            return jax.checkpoint(
                chunk_fn,
                policy=jax.checkpoint_policies.save_only_these_names(
                    *names),
            )
        if self.remat:
            return jax.checkpoint(chunk_fn)
        return chunk_fn


def resolve_policy(jitter, *, whitened, factored, per_factor_chol,
                   stable_projection=None, grad_precision=None,
                   proj_precision=None, remat=True,
                   chol_precision=None):
    """Resolve the fast path's static knobs (see the module table).

    ``per_factor_chol``: the post-collapse prior Cholesky is (L, M, M)
    (trainable per-factor kernels, incl. MGGP) — selects the W-form
    projection. ``None`` knob values take the measured auto defaults;
    explicit values pass through unchanged.
    """
    if remat is None:
        # pre-extraction API: any falsy remat selected "no remat" —
        # keep None valid so the policy split is not a silent narrowing
        remat = False
    if not (isinstance(remat, bool) or remat in REMAT_POLICIES):
        # any other non-empty string would otherwise silently select
        # full remat — a typo must not pick the wrong policy
        raise ValueError(
            f"remat={remat!r}: expected True, False, 'save_proj' or "
            "'save_proj_kzx'")
    well_jittered = jitter >= WELL_JITTERED
    w_form = bool(factored and not whitened and per_factor_chol)
    if grad_precision is None:
        grad_precision = "default" if well_jittered else "highest"
    if proj_precision is None:
        proj_precision = "high" if well_jittered else "highest"
    if chol_precision is None:
        # the HIGH gate is backed by a measured A/B only on the w_form
        # value path (MGGP full scale); the shared-Cholesky/whitened
        # W-builders keep HIGHEST — their own A/B measured a wash
        # (docs/PERFORMANCE.md, NSF fast leg: one shared K⁻¹ per step
        # is ~L× less precision-sensitive work than MGGP's per-factor)
        chol_precision = ("high" if well_jittered and w_form
                          else "highest")
    stable = bool(
        whitened
        or (not well_jittered if stable_projection is None
            else stable_projection)
    )
    # Validate the resolved precision strings like remat above: a typo
    # ("hgh") or an explicit falsy-but-non-None value ("") would otherwise
    # flow unvalidated into jax.default_matmul_precision and fail later
    # with an opaque error mid-trace.
    for knob, val in (("grad_precision", grad_precision),
                      ("proj_precision", proj_precision),
                      ("chol_precision", chol_precision)):
        if val not in PRECISIONS:
            raise ValueError(
                f"{knob}={val!r}: expected one of {PRECISIONS}")
    return FastPathPolicy(
        w_form=w_form,
        stable_projection=stable,
        grad_precision=grad_precision,
        proj_precision=proj_precision,
        bwd_blocked=grad_precision == "highest",
        remat=remat,
        chol_precision=chol_precision,
    )
