"""Multi-group SVGP posteriors.

Identical posterior algebra to :mod:`gpzoo_tpu.gps.svgp` with per-point
group labels threaded into a group-aware kernel (reference ``MGGP_SVGP``
gp.py:329-382 and ``MGGP_WSVGP`` gp.py:385-399). Inducing points carry their
own fixed group assignment ``groupsZ``.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import struct

from gpzoo_tpu.gps.svgp import WSVGP, _posterior_tail
from gpzoo_tpu.ops.linalg import add_jitter


@struct.dataclass
class MGGPSVGP:
    """Unwhitened multi-group SVGP (gp.py:329-382).

    ``groupsZ`` (M,) int labels are sampled uniformly at init (gp.py:336)
    and never trained. Note the reference's qF variance floor here is 5e-2
    (gp.py:378), not SVGP's 1e-6 — kept as the default for parity.
    """

    kernel: Any
    Z: Any
    groupsZ: Any
    mu: Any
    Lu_raw: Any
    jitter: float = struct.field(pytree_node=False, default=1e-4)
    var_floor: float = struct.field(pytree_node=False, default=5e-2)

    @classmethod
    def create(cls, key, kernel, dim=1, M=50, jitter=1e-4, n_groups=2,
               var_floor=5e-2):
        kz, kl, kg = jax.random.split(key, 3)
        return cls(
            kernel=kernel,
            Z=jax.random.normal(kz, (M, dim)),
            groupsZ=jax.random.randint(kg, (M,), 0, n_groups),
            mu=jnp.zeros((M,)),
            Lu_raw=jax.random.normal(kl, (M, M)),
            jitter=jitter,
            var_floor=var_floor,
        )

    def __call__(self, x, groups_x, **kwargs):
        kxx = self.kernel.diag(x, groups_x)
        kzx = self.kernel.gram(self.Z, x, self.groupsZ, groups_x)
        kzz = add_jitter(
            self.kernel.gram(self.Z, self.Z, self.groupsZ, self.groupsZ),
            self.jitter,
        )
        lzz = jnp.linalg.cholesky(kzz)
        w = jnp.swapaxes(jax.scipy.linalg.cho_solve((lzz, True), kzx), -2, -1)
        return _posterior_tail(kxx, kzz, lzz, w, self.mu, self.Lu_raw,
                               self.var_floor)


@struct.dataclass
class MGGPWSVGP(WSVGP):
    """Whitened multi-group SVGP (gp.py:385-399): WSVGP whose Gram stage
    threads group labels (call as ``gp(X, groups_x=groups)``)."""

    groupsZ: Any = None

    @classmethod
    def create(cls, key, kernel, dim=1, M=50, n_groups=2, jitter=1e-4):
        kz, kl, kg = jax.random.split(key, 3)
        return cls(
            kernel=kernel,
            Z=jax.random.normal(kz, (M, dim)),
            mu=jnp.zeros((M,)),
            Lu_raw=jax.random.normal(kl, (M, M)),
            jitter=jitter,
            groupsZ=jax.random.randint(kg, (M,), 0, n_groups),
        )

    def _gram(self, x, groups_x=None, **kwargs):
        kxx = self.kernel.diag(x, groups_x)
        kzx = self.kernel.gram(self.Z, x, self.groupsZ, groups_x)
        kzz = add_jitter(
            self.kernel.gram(self.Z, self.Z, self.groupsZ, self.groupsZ),
            self.jitter,
        )
        return kxx, kzx, kzz
