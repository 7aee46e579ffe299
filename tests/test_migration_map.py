"""MIGRATION.md completeness: every public callable of the reference has a
row in the symbol map (an equivalent or a documented omission).

Round-4 verdict item 8: `reshape_param` was the one reference symbol with
neither an implementation nor a documented omission — this test makes that
class of gap impossible to reintroduce silently.
"""

import inspect
import os

import pytest

from parity_utils import import_reference

MIGRATION = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "docs", "MIGRATION.md",
)


def _public_callables(mod):
    return [
        name
        for name, obj in vars(mod).items()
        if not name.startswith("_")
        and (inspect.isclass(obj) or inspect.isfunction(obj))
        and getattr(obj, "__module__", "") == mod.__name__
    ]


def test_every_reference_symbol_documented():
    gpzoo = import_reference()
    import gpzoo.gp
    import gpzoo.kernels
    import gpzoo.likelihoods
    import gpzoo.utilities

    with open(MIGRATION) as f:
        doc = f.read()

    missing = []
    for mod in (gpzoo.kernels, gpzoo.gp, gpzoo.likelihoods, gpzoo.utilities):
        for name in _public_callables(mod):
            if name not in doc:
                missing.append(f"{mod.__name__}.{name}")
    assert not missing, (
        "reference symbols absent from docs/MIGRATION.md (add an "
        f"equivalent row or a documented omission): {missing}"
    )


def test_documented_equivalents_exist():
    """Spot-check that the map's gpzoo_tpu names resolve — the table must
    not cite symbols that don't exist."""
    import gpzoo_tpu  # noqa: F401
    from gpzoo_tpu import bijectors, data, gps, kernels, models, ops, train

    for holder, name in [
        (kernels, "Matern32"), (kernels, "BatchedMGGPRBF"),
        (gps, "MGGPWSVGP"), (gps, "GaussianPrior"),
        (models, "HybridNSF"), (models, "LegacyHybridNSF"),
        (ops, "svgp_forward"), (ops, "sqrt_safe_grad"),
        (bijectors, "init_softplus"),
        (data, "dims_autocorr"), (data, "anndata_to_train_val"),
        (train, "train_closure_batched"), (train, "train_hybrid_batched"),
    ]:
        assert hasattr(holder, name), name
    from gpzoo_tpu.data.plotting import plot_factors  # noqa: F401
    from gpzoo_tpu.ops.linalg import build_group_distances  # noqa: F401
