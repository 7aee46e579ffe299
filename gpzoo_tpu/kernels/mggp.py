"""Multi-group GP (MGGP) kernels.

The MGGP covariance (Hensman-style multi-group RBF, after
andrewcharlesjones/multi-group-GP) couples a spatial RBF with a
group-similarity factor derived from an MDS embedding of a group-distance
matrix:

    k(x,z) = σ² · exp(−½ (‖x−z‖²/ℓ²) / (α̃·g² + 1)) / (α̃·g² + 1)^(p/2)

where ``g² = ‖e_gx − e_gz‖²`` is the squared distance between the MDS
embeddings of the two points' groups and ``p = input_dim``. The reference
implements this three times with three positivity conventions for α̃
(see :class:`gpzoo_tpu.bijectors.GroupDiffConvention`); here one
implementation takes the convention as a static field, and each reference
class maps to a preset.

TPU note: the group term is a gather (embedding lookup) plus a second
squared-distance matrix of the same (N, M) shape as the spatial one — both
ride the MXU, and the combine/exp/pow epilogue fuses on the VPU.
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import struct

from gpzoo_tpu.bijectors import GroupDiffConvention
from gpzoo_tpu.ops.distance import squared_dist
from gpzoo_tpu.ops.linalg import embed_distance_matrix, sqrt_safe_grad
from gpzoo_tpu.kernels.rbf import _bcast_hparam


def _default_embedding(n_groups, dtype=None):
    """MDS embedding of the complete-graph group distances (1 − I)
    (kernels.py:164-165, 200-201). dtype follows the ambient default
    (float64 under x64) unless given."""
    d = jnp.ones((n_groups, n_groups), dtype=dtype) - jnp.eye(
        n_groups, dtype=dtype
    )
    return embed_distance_matrix(d)


@struct.dataclass
class MGGPRBF:
    """Reference ``MGGP_RBF`` (kernels.py:158-191): scalar hyperparameters,
    RAW α convention (α enters ``α·g² + 1`` unsquared, kernels.py:187-191).
    """

    sigma: Any
    lengthscale: Any
    group_diff_param: Any
    embedding: Any  # (n_groups, n_groups) MDS embedding; not trained
    input_dim: int = struct.field(pytree_node=False, default=2)
    convention: GroupDiffConvention = struct.field(
        pytree_node=False, default=GroupDiffConvention.RAW
    )

    @classmethod
    def create(cls, sigma=1.0, lengthscale=2.0, group_diff_param=1.0, n_groups=2,
               **kw):
        # strong dtypes: weak-typed scalar hyperparams change the jit
        # signature after the first optimizer update (one silent
        # recompile of the training program)
        f = jnp.result_type(float)
        return cls(
            sigma=jnp.asarray(sigma, dtype=f),
            lengthscale=jnp.asarray(lengthscale, dtype=f),
            group_diff_param=jnp.asarray(group_diff_param, dtype=f),
            embedding=_default_embedding(n_groups),
            **kw,
        )

    def with_group_distances(self, group_distances):
        """Re-embed a user group-distance matrix (kernels.py:167-169)."""
        return self.replace(embedding=embed_distance_matrix(group_distances))

    def diag(self, x, groups=None):
        n = x.shape[0]
        var = jnp.square(jnp.asarray(self.sigma)).reshape(-1)
        if var.shape[0] == 1:
            return jnp.broadcast_to(var[0], (n,))
        return jnp.broadcast_to(var[:, None], (var.shape[0], n))

    def gram(self, x, z, groups_x=None, groups_z=None):
        out = self._gram_pallas(x, z, groups_x, groups_z)
        if out is not None:
            return out
        d2 = squared_dist(x, z)
        g2 = squared_dist(self.embedding[groups_x], self.embedding[groups_z])
        return self._combine(d2, g2)

    def _gram_pallas(self, x, z, groups_x, groups_z):
        """Fused Pallas path: in-VMEM double-distance + per-L epilogue."""
        from gpzoo_tpu.ops import gram_pallas

        if not gram_pallas.enabled_for(
            x.shape[0], z.shape[0],
            max(x.shape[-1], self.embedding.shape[-1]),
            jnp.result_type(x),
        ):
            return None
        sigma = jnp.asarray(self.sigma).reshape(-1)
        ell = jnp.asarray(self.lengthscale).reshape(-1)
        alpha = self.convention.apply(
            jnp.asarray(self.group_diff_param)
        ).reshape(-1)
        L = max(sigma.shape[0], ell.shape[0], alpha.shape[0])
        scalar = (
            jnp.asarray(self.sigma).ndim == 0
            and jnp.asarray(self.lengthscale).ndim == 0
            and jnp.asarray(self.group_diff_param).ndim == 0
        )
        ex = self.embedding[groups_x].astype(x.dtype)
        ez = self.embedding[groups_z].astype(x.dtype)
        out = gram_pallas.mggp_gram(
            x, z, ex, ez,
            jnp.broadcast_to(sigma, (L,)),
            jnp.broadcast_to(ell, (L,)),
            jnp.broadcast_to(alpha, (L,)),
            self.input_dim,
        )
        return out[0] if scalar else out

    def gram_and_distance(self, x, z, groups_x=None, groups_z=None):
        d2 = squared_dist(x, z)
        g2 = squared_dist(self.embedding[groups_x], self.embedding[groups_z])
        return self._combine(d2, g2), sqrt_safe_grad(d2)

    def _combine(self, d2, g2):
        sigma = _bcast_hparam(self.sigma)
        ell = _bcast_hparam(self.lengthscale)
        alpha = _bcast_hparam(self.group_diff_param)
        denom = self.convention.apply(alpha) * g2 + 1.0
        scale = denom ** (-0.5 * self.input_dim)
        return (
            jnp.square(sigma)
            * jnp.exp(-0.5 * (d2 / jnp.square(ell)) / denom)
            * scale
        )


@struct.dataclass
class MGGPNSFRBF(MGGPRBF):
    """Reference ``MGGP_NSF_RBF`` (kernels.py:194-227): (L,1,1)
    hyperparameters and SQUARED α convention (``α²·g² + 1``,
    kernels.py:222). The shared d²/g² matrices are broadcast over L.
    """

    @classmethod
    def create(cls, sigma=1.0, lengthscale=2.0, group_diff_param=1.0, n_groups=2,
               L=10, **kw):
        kw.setdefault("convention", GroupDiffConvention.SQUARED)
        return cls(
            sigma=sigma * jnp.ones((L, 1, 1)),
            lengthscale=lengthscale * jnp.ones((L, 1, 1)),
            group_diff_param=group_diff_param * jnp.ones((L, 1, 1)),
            embedding=_default_embedding(n_groups),
            **kw,
        )


@struct.dataclass
class BatchedMGGPRBF(MGGPRBF):
    """Reference ``batched_MGGP_RBF`` (kernels.py:62-104): ABS α convention
    (``|α|·g² + 1``, kernels.py:87) and ``p`` = spatial input dimension.
    The reference's nested vmap over (point, group-embedding) pairs is
    replaced by the shared two-distance-matrix construction — identical
    values, one MXU pass per distance matrix.
    """

    @classmethod
    def create(cls, sigma=1.0, lengthscale=1.0, group_diff_param=1.0,
               n_groups=10, **kw):
        kw.setdefault("convention", GroupDiffConvention.ABS)
        # strong dtypes — see MGGPRBF.create
        f = jnp.result_type(float)
        return cls(
            sigma=jnp.asarray(sigma, dtype=f),
            lengthscale=jnp.asarray(lengthscale, dtype=f),
            group_diff_param=jnp.asarray(group_diff_param, dtype=f),
            embedding=_default_embedding(n_groups),
            **kw,
        )
