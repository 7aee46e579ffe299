"""Variational nearest-neighbor GP (VNNGP).

Each query point conditions on only its K nearest inducing points
(reference ``VNNGP``, gp.py:7-122), making per-point cost O(K³) independent
of M.

TPU-first redesign — same math, radically cheaper data movement:

The reference gathers K *rows* of chol(Kzz) per query point and multiplies
them (``little_L @ little_Lᵀ``, gp.py:67-74), materializing an N×K×M
intermediate. But for any index set I,

    (L Lᵀ)[I, I] = Kzz_jittered[I, I]

— the gathered-row product is algebraically just a K×K block gather of the
(already jittered) Kzz, and likewise ``little_S = (Lu Luᵀ)[I, I]``. So we
compute ``S = Lu Luᵀ`` once (M×M, one batched MXU matmul) and gather N K×K
blocks directly: the N×K×M intermediate never exists, which is what lets
100k+ spots fit per chip. Cross-checked against the reference's row-gather
construction in the parity tests.

Remaining per-point work is a batched K×K Cholesky solve (replacing the
reference's explicit ``torch.inverse``, gp.py:77 — same result, better
conditioned) plus the shared :func:`svgp_forward` algebra.

Neighbor search is a single ``lax.top_k`` over the negated distances —
``argsort(d)[:, :K]`` (gp.py:64) with ties possibly ordered differently;
the posterior is invariant to neighbor order.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import struct

from gpzoo_tpu import dists
from gpzoo_tpu.bijectors import lower_cholesky
from gpzoo_tpu.ops.linalg import add_jitter


def gather_blocks(mat, idx):
    """Gather K×K principal blocks: out[..., n, i, j] = mat[..., idx[n,i], idx[n,j]].

    mat (..., M, M), idx (N, K) → (..., N, K, K).
    """
    return mat[..., idx[:, :, None], idx[:, None, :]]


@struct.dataclass
class VNNGP:
    kernel: Any
    Z: Any
    mu: Any
    Lu_raw: Any
    K: int = struct.field(pytree_node=False, default=3)
    jitter: float = struct.field(pytree_node=False, default=1e-4)
    var_floor: float = struct.field(pytree_node=False, default=5e-2)

    @classmethod
    def create(cls, key, kernel, dim=1, M=50, K=3, jitter=1e-4,
               var_floor=5e-2):
        kz, kl = jax.random.split(key)
        return cls(
            kernel=kernel,
            Z=jax.random.normal(kz, (M, dim)),
            mu=jnp.zeros((M,)),
            Lu_raw=jax.random.normal(kl, (M, M)),
            K=K,
            jitter=jitter,
            var_floor=var_floor,
        )

    def neighbor_indices(self, x):
        """K nearest inducing points per query point, by spatial distance."""
        _, d = self.kernel.gram_and_distance(x, self.Z)
        if d.ndim == 3:  # L-batched kernels share one distance matrix
            d = d[0]
        _, idx = jax.lax.top_k(-d, self.K)
        return idx

    def __call__(self, x, **kwargs):
        kxx = self.kernel.diag(x)  # (N,) or (L, N)
        kxz, distance = self.kernel.gram_and_distance(x, self.Z)
        if distance.ndim == 3:
            distance = distance[0]

        kzz = add_jitter(self.kernel.gram(self.Z, self.Z), self.jitter)
        lzz = jnp.linalg.cholesky(kzz)
        lu = lower_cholesky(self.Lu_raw)
        s = jnp.einsum("...ij,...kj->...ik", lu, lu)

        _, idx = jax.lax.top_k(-distance, self.K)  # (N, K)

        # K×K block gathers (see module docstring). The reference re-jitters
        # the gathered little_Kzz before inverting (gp.py:77) — replicated
        # (inside the Pallas kernel on that path).
        little_kzz = gather_blocks(kzz, idx)
        little_s = gather_blocks(s, idx)
        little_kxz = jnp.take_along_axis(
            kxz, idx if kxz.ndim == 2 else idx[None], axis=-1
        )  # (..., N, K)
        little_mu = self.mu[..., idx]  # (..., N, K)

        mean, cov = self._conditional(
            little_kzz, little_s, little_kxz, little_mu, kxx
        )

        qf = dists.Normal(mean, jnp.sqrt(jnp.clip(cov, min=self.var_floor)))
        qu = dists.MultivariateNormalTril(self.mu, lu)
        pu = dists.MultivariateNormalTril(jnp.zeros_like(self.mu), lzz)
        return qf, qu, pu

    def _conditional(self, little_kzz, little_s, little_kxz, little_mu, kxx):
        """Per-point K×K conditioning — Pallas structure-of-arrays kernel
        when the backend/shape qualify, batched XLA linalg otherwise.
        ``little_kzz`` arrives without the extra block jitter; both paths
        add it (replicating the reference's in-place add_jitter at
        gp.py:77, which also reaches svgp_forward)."""
        from gpzoo_tpu.ops import vnngp_pallas

        # Leading batch dims may differ per operand (e.g. shared-kernel
        # blocks are unbatched while mu/S carry the factor axis).
        batch = jnp.broadcast_shapes(
            little_kzz.shape[:-3],
            little_s.shape[:-3],
            little_kxz.shape[:-2],
            little_mu.shape[:-2],
            jnp.shape(kxx)[:-1],
        )
        n, k = little_kzz.shape[-3], little_kzz.shape[-1]
        total = n
        for bdim in batch:
            total *= bdim
        if vnngp_pallas.enabled_for(total, k, little_kzz.dtype):
            def fold(a, event):
                return jnp.broadcast_to(a, batch + a.shape[-event:]).reshape(
                    (total,) + a.shape[-event:][1:]
                )

            mean, cov = vnngp_pallas.block_conditional(
                fold(little_kzz, 3),
                fold(little_s, 3),
                fold(little_kxz, 2),
                fold(little_mu, 2),
                fold(jnp.broadcast_to(kxx, batch + (n,)), 1),
                self.jitter,
            )
            return mean.reshape(batch + (n,)), cov.reshape(batch + (n,))

        blocks = add_jitter(little_kzz, self.jitter)
        chol_blk = jnp.linalg.cholesky(blocks)
        # W = little_Kxz @ blocks⁻¹; the blocks are symmetric, so this is
        # one batched K×K Cholesky solve.
        w = jax.scipy.linalg.cho_solve(
            (chol_blk, True), little_kxz[..., None]
        )[..., 0]  # (..., N, K)
        # Per-point svgp_forward (utilities.py:382-397) on K-sized blocks.
        mean = jnp.einsum("...nk,...nk->...n", w, little_mu)
        diff = little_s - blocks
        wd = jnp.einsum("...nk,...nkj->...nj", w, diff)
        cov = kxx + jnp.einsum("...nk,...nk->...n", wd, w)
        return mean, cov
