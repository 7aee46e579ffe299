"""Positivity / Cholesky bijectors.

The reference spreads three inconsistent positivity conventions for the MGGP
group-difference parameter across its kernels (``kernels.py:87`` uses
``abs``, ``kernels.py:187`` uses the raw value, ``kernels.py:222`` squares
it) and applies PyTorch's ``LowerCholeskyTransform`` to the variational
Cholesky factor (``gp.py:220``). This module centralizes all of them so each
model picks one explicitly; parity tests select the convention the matching
reference class uses.
"""

from __future__ import annotations

import enum

import jax
import jax.numpy as jnp
import numpy as np


def softplus(x):
    """Numerically stable ``log(1 + exp(x))`` (torch.nn.functional.softplus)."""
    return jax.nn.softplus(x)


def softplus_inverse(y):
    """Inverse of :func:`softplus`: ``log(exp(y) - 1)``, stable for large y."""
    # log(e^y - 1) = y + log(1 - e^-y)
    return y + jnp.log(-jnp.expm1(-y))


def lower_cholesky(raw):
    """Map an unconstrained square matrix to a lower-Cholesky factor.

    Matches ``torch.distributions.transform_to(constraints.lower_cholesky)``
    (used at ``gp.py:220``): strictly-lower triangle kept as-is, diagonal
    mapped through ``exp``. Batched over leading dims.
    """
    # Mask-based (no jnp.diagonal): extracting the diagonal of a large
    # tiled (L, M, M) tensor lowers on TPU to a flat reshape + strided
    # slice, forcing two full relayout copies (~36 ms/step for the 720 MB
    # north-star Lu). where/tril are iota-compare selects that fuse.
    n = raw.shape[-1]
    eye = jnp.eye(n, dtype=bool)
    return jnp.where(eye, jnp.exp(raw), jnp.tril(raw, k=-1))


def lower_cholesky_inverse(chol):
    """Unconstrained matrix whose :func:`lower_cholesky` image is ``chol``."""
    lower = jnp.tril(chol, k=-1)
    diag = jnp.log(jnp.diagonal(chol, axis1=-2, axis2=-1))
    n = chol.shape[-1]
    return lower + diag[..., None] * jnp.eye(n, dtype=chol.dtype)


class GroupDiffConvention(enum.Enum):
    """How the MGGP group-difference parameter α enters ``α·g² + 1``.

    ``ABS``      — ``|α|``    (``batched_MGGP_RBF``, kernels.py:87)
    ``RAW``      — ``α``      (``MGGP_RBF``, kernels.py:187-191)
    ``SQUARED``  — ``α²``     (``MGGP_NSF_RBF``, kernels.py:222)
    """

    ABS = "abs"
    RAW = "raw"
    SQUARED = "squared"

    def apply(self, alpha):
        if self is GroupDiffConvention.ABS:
            return jnp.abs(alpha)
        if self is GroupDiffConvention.RAW:
            return alpha
        return jnp.square(alpha)


def init_softplus(mat, minval=1e-5):
    """Inverse-softplus initializer for numpy arrays (utilities.py:38-43).

    Values ≥ 20 are passed through unchanged (softplus is identity there to
    float precision), matching the reference.
    """
    mat2 = np.asarray(mat).copy()
    mask = mat2 < 20
    mat2[mask] = np.log(np.exp(mat2[mask]) - 1 + minval)
    return mat2
