"""Unit tests for the fast-path dispatch policy table (train/policy.py).

The behavioral equivalence with the generic ELBO is pinned by the
property sweep; these pin the *table itself* — the measured defaults
docs/ARCHITECTURE.md documents — so an accidental gate flip is caught
even in configurations the sweep happens not to draw.
"""

import pytest

from gpzoo_tpu.train.policy import FastPathPolicy, resolve_policy


def test_well_jittered_w_form_defaults():
    p = resolve_policy(1e-1, whitened=False, factored=True,
                       per_factor_chol=True)
    assert p.w_form
    assert p.grad_precision == "default"
    assert p.proj_precision == "high"
    assert not p.bwd_blocked  # panel VJP only pays at HIGHEST
    assert not p.stable_projection
    # round-4 measured gate: W = Lzz⁻¹ at HIGH when the big jitter caps
    # the conditioning (A/B: trajectory 4e-5 rel / 56 steps, deviance
    # 31.5423 vs 31.5418, −5.5 ms/step at MGGP full scale)
    assert p.chol_precision == "high"


def test_small_jitter_gates_to_highest_and_stable():
    p = resolve_policy(1e-4, whitened=False, factored=True,
                       per_factor_chol=True)
    assert p.grad_precision == "highest"
    assert p.proj_precision == "highest"
    assert p.chol_precision == "highest"
    assert p.bwd_blocked
    assert p.stable_projection


def test_whitened_is_always_stable_and_never_w_form():
    for jitter in (1e-1, 1e-4):
        p = resolve_policy(jitter, whitened=True, factored=True,
                           per_factor_chol=True)
        assert not p.w_form
        assert p.stable_projection


def test_shared_chol_never_w_form():
    p = resolve_policy(1e-1, whitened=False, factored=True,
                       per_factor_chol=False)
    assert not p.w_form
    assert not p.stable_projection  # big-jitter single-matmul form


def test_explicit_overrides_pass_through():
    p = resolve_policy(1e-1, whitened=False, factored=True,
                       per_factor_chol=True, stable_projection=True,
                       grad_precision="highest", proj_precision="highest",
                       chol_precision="high", remat="save_proj")
    assert p.stable_projection
    assert p.grad_precision == "highest" and p.bwd_blocked
    assert p.proj_precision == "highest"
    assert p.chol_precision == "high"
    assert p.remat == "save_proj"


def test_remat_typo_rejected():
    with pytest.raises(ValueError, match="remat"):
        resolve_policy(1e-1, whitened=False, factored=True,
                       per_factor_chol=True, remat="save_porj")


def test_wrap_remat_modes():
    import jax.numpy as jnp

    def f(a):
        return jnp.sum(a * a)

    x = jnp.arange(4.0)
    base = float(f(x))
    for remat in (True, False, "save_proj", "save_proj_kzx"):
        p = FastPathPolicy(w_form=False, stable_projection=False,
                           grad_precision="default",
                           proj_precision="high", bwd_blocked=False,
                           remat=remat)
        assert float(p.wrap_remat(f)(x)) == base


def test_chol_precision_auto_is_wform_scoped():
    # the HIGH value-path gate is backed by an A/B only on the w_form
    # path — shared-Cholesky and whitened configs keep HIGHEST on auto
    shared = resolve_policy(1e-1, whitened=False, factored=True,
                            per_factor_chol=False)
    assert shared.chol_precision == "highest"
    whitened = resolve_policy(1e-1, whitened=True, factored=True,
                              per_factor_chol=True)
    assert whitened.chol_precision == "highest"


def test_remat_none_means_no_remat():
    # pre-extraction API accepted any falsy remat as "no remat" — the
    # policy split must not narrow that to a ValueError
    p = resolve_policy(1e-1, whitened=False, factored=True,
                       per_factor_chol=True, remat=None)
    assert p.remat is False
