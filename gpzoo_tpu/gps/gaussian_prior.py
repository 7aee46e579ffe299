"""Free-form mean-field Gaussian "prior" used by PNMF and the non-spatial
half of the hybrid factorizations (reference ``GaussianPrior``,
gp.py:125-146): per-factor, per-observation free mean and softplus'd scale,
with a fixed N(0, scale_pf²) prior."""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import struct

from gpzoo_tpu import dists
from gpzoo_tpu.bijectors import softplus


@struct.dataclass
class GaussianPrior:
    mean: Any  # (L, N)
    scale_raw: Any  # (L, N), softplus'd
    scale_pf: float = struct.field(pytree_node=False, default=1.0)

    @classmethod
    def create(cls, key, N, L=10, scale_pf=1.0):
        km, ks = jax.random.split(key)
        return cls(
            mean=jax.random.normal(km, (L, N)),
            scale_raw=jax.random.uniform(ks, (L, N)),
            scale_pf=scale_pf,
        )

    def __call__(self):
        scale = softplus(self.scale_raw)
        qf = dists.Normal(self.mean, scale)
        pf = dists.Normal(
            jnp.zeros_like(self.mean), self.scale_pf * jnp.ones_like(scale)
        )
        return qf, pf

    def batched(self, idx):
        """Column-sliced posterior for minibatch steps (gp.py:140-146)."""
        scale = softplus(self.scale_raw[:, idx])
        qf = dists.Normal(self.mean[:, idx], scale)
        pf = dists.Normal(
            jnp.zeros_like(qf.loc), self.scale_pf * jnp.ones_like(scale)
        )
        return qf, pf
