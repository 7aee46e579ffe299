"""Helpers for float64 parity checks against the PyTorch reference at
/root/reference (imported read-only, never copied).

Every helper builds a reference module, mirrors its randomly-initialized
parameters into the corresponding gpzoo_tpu pytree, and returns both — so
both frameworks evaluate identical parameters on identical inputs and all
deterministic quantities (posterior means/variances, KLs, rates, ELBO
pieces) must agree to ~1e-5 or better (BASELINE.json requirement).
"""

from __future__ import annotations

import sys

import numpy as np

REFERENCE_PATH = "/root/reference"


def import_reference():
    if REFERENCE_PATH not in sys.path:
        sys.path.insert(0, REFERENCE_PATH)
    import gpzoo.gp  # noqa: F401
    import gpzoo.kernels  # noqa: F401
    import gpzoo.likelihoods  # noqa: F401
    import gpzoo.utilities  # noqa: F401
    import gpzoo

    return gpzoo


def t2n(t):
    return t.detach().cpu().numpy()
