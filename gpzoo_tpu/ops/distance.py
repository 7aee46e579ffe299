"""Pairwise-distance primitives.

TPU note: the ``‖x‖² − 2xᵀz + ‖z‖²`` expansion runs the cross term on the
MXU. Spatial inputs here are low-dimensional (D=1–2) and pre-rescaled to
roughly N(0,1) (``rescale_spatial_coords``), so the expansion is
well-conditioned; we still force ``HIGHEST`` matmul precision because a
float32-truncated cross term visibly perturbs Gram Choleskys at M=3000.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def squared_dist(x, z):
    """Clamped squared Euclidean distance matrix (utilities.py:399-405).

    x: (N, D), z: (M, D) → (N, M), entries ``max(‖x−z‖², 0)``.
    """
    x2 = jnp.sum(jnp.square(x), axis=-1, keepdims=True)
    z2 = jnp.sum(jnp.square(z), axis=-1, keepdims=True)
    xz = jax.lax.dot_general(
        x,
        z,
        dimension_numbers=(((x.ndim - 1,), (z.ndim - 1,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST,
    )
    r2 = x2 - 2.0 * xz + jnp.swapaxes(z2, -2, -1)
    return jnp.maximum(r2, 0.0)


def cdist(x, z):
    """Euclidean distance matrix (torch.cdist analog, kernels.py:118)."""
    return jnp.sqrt(squared_dist(x, z))
