"""MIGRATION.md completeness: every public callable of the reference has a
row in the symbol map (an equivalent or a documented omission), and every
gpzoo_tpu symbol the map cites actually resolves.

Round-4 verdict item 8: `reshape_param` was the one reference symbol with
neither an implementation nor a documented omission — this test makes that
class of gap impossible to reintroduce silently. Round-5 hardening: the
presence check is word-boundary (a deleted `gp.SVGP` row is no longer
hidden by `WSVGP` containing "SVGP" as a substring), and the equivalents
check resolves EVERY backticked dotted symbol in the doc instead of a
hard-coded spot list (which missed a stale `train.fast.*` citation).
"""

import importlib
import inspect
import os
import re

from parity_utils import import_reference

MIGRATION = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "docs", "MIGRATION.md",
)

# gpzoo_tpu top-level modules whose dotted citations the doc must resolve.
# `kernels.` is shared with the reference's module name, so those tokens
# fall back to "is it a public reference symbol?" before failing.
_TPU_PREFIXES = ("gps", "models", "ops", "train", "data", "bijectors",
                 "parallel", "configs", "dists", "utils", "kernels")


def _public_callables(mod):
    return [
        name
        for name, obj in vars(mod).items()
        if not name.startswith("_")
        and (inspect.isclass(obj) or inspect.isfunction(obj))
        and getattr(obj, "__module__", "") == mod.__name__
    ]


def _read_doc():
    with open(MIGRATION) as f:
        return f.read()


def test_every_reference_symbol_documented():
    gpzoo = import_reference()
    import gpzoo.gp
    import gpzoo.kernels
    import gpzoo.likelihoods
    import gpzoo.utilities

    doc = _read_doc()

    missing = []
    for mod in (gpzoo.kernels, gpzoo.gp, gpzoo.likelihoods, gpzoo.utilities):
        for name in _public_callables(mod):
            # word-boundary: `SVGP` must not be satisfied by `WSVGP`,
            # `train` must not be satisfied by `train_batched`
            if not re.search(r"\b" + re.escape(name) + r"\b", doc):
                missing.append(f"{mod.__name__}.{name}")
    assert not missing, (
        "reference symbols absent from docs/MIGRATION.md (add an "
        f"equivalent row or a documented omission): {missing}"
    )


def _resolve_tpu(dotted):
    """Resolve `a.b.c` against the gpzoo_tpu package, importing submodules
    as needed. Returns True iff every segment resolves."""
    obj = importlib.import_module("gpzoo_tpu")
    path = "gpzoo_tpu"
    for part in dotted.split("."):
        path = f"{path}.{part}"
        try:
            obj = getattr(obj, part)
        except AttributeError:
            try:
                obj = importlib.import_module(path)
            except ImportError:
                return False
    return True


def test_documented_equivalents_exist():
    """EVERY backticked dotted gpzoo_tpu symbol in the map must resolve —
    the table must not cite symbols that don't exist."""
    gpzoo = import_reference()
    import gpzoo.kernels

    doc = _read_doc()
    tokens = set(re.findall(r"`([a-zA-Z_][a-zA-Z0-9_.]*)`", doc))

    bad = []
    checked = 0
    for tok in sorted(tokens):
        name = tok[len("gpzoo_tpu."):] if tok.startswith("gpzoo_tpu.") else tok
        if "." not in name or name.split(".")[0] not in _TPU_PREFIXES:
            continue
        head, _, attr_path = name.partition(".")
        if head == "kernels" and not _resolve_tpu(name):
            # shared module name: the token may cite the REFERENCE's
            # kernels module (e.g. `kernels.NSF_RBF`)
            if attr_path in _public_callables(gpzoo.kernels):
                continue
            bad.append(tok)
            continue
        checked += 1
        if not _resolve_tpu(name):
            bad.append(tok)
    assert checked > 40, f"resolver only checked {checked} symbols"
    assert not bad, f"MIGRATION.md cites non-existent symbols: {bad}"
