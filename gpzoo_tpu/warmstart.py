"""Warm-start pipelines composing the library's pieces.

The flagship composition is the Slideseq Hybrid-MGGP recipe
(``notebooks/Slideseq_MGGP_hybrid_new_version-Copy1.ipynb`` cells 15-35):

1. train a :class:`~gpzoo_tpu.models.PNMF` (mean-field Poisson
   factorization) on the counts,
2. rank its factors by Moran's I spatial autocorrelation
   (:func:`gpzoo_tpu.data.dims_autocorr`),
3. keep the top ``L`` spatial factors as the GP half: seed a
   :class:`~gpzoo_tpu.gps.MGGPSVGP`'s ``mu`` with the PNMF posterior means
   at a random inducing subset, and ``Lu`` with a diagonal Cholesky of the
   PNMF posterior scales (cell 29),
4. hand the remaining factors to the mean-field
   :class:`~gpzoo_tpu.gps.GaussianPrior` half verbatim,
5. assemble a :class:`~gpzoo_tpu.models.HybridNSF` whose two ``W`` halves
   are the corresponding PNMF loading columns, then fine-tune with the
   batched hybrid ELBO (kernel hyperparameters frozen, cells 32-35).
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from gpzoo_tpu import gps, kernels, models
from gpzoo_tpu.bijectors import softplus
from gpzoo_tpu.data.metrics import dims_autocorr


def hybrid_mggp_from_pnmf(key, pnmf, x, groups_x, *, L_spatial,
                          m_per_group, n_groups, sigma=1.0,
                          lengthscale=4.0, group_diff_param=0.7,
                          jitter=1e-2, n_neighs=6):
    """Build a warm-started Hybrid-MGGP NSF from a trained PNMF.

    Mirrors notebook cell 29 exactly:

    * inducing subset: ``n_groups * m_per_group`` spots drawn uniformly
      WITHOUT stratification (the reference's ``torch.multinomial``),
    * ``mu``  = PNMF posterior mean rows (Moran-ranked, top ``L_spatial``)
      at the inducing spots,
    * ``Lu``  = diag(softplus(PNMF scale)) at the inducing spots
      (identity pattern scaled per row — cell 29's ``Lu_diags[:, :, None]
      * eye``),
    * non-spatial half = remaining PNMF rows verbatim,
    * ``W``   halves = the corresponding PNMF loading columns,
    * kernel = ``MGGP_NSF_RBF(σ, ℓ=4.0, α=0.7)``, jitter 1e-2.

    Returns ``(model, moran_idx, moran_i)``; ``model`` is a
    :class:`gpzoo_tpu.models.HybridNSF` with an MGGP spatial half. Train
    with ``negative_elbo_hybrid_batched(..., groups_x=groups_x)`` and the
    kernel hyperparameters frozen (cells 32-35's ``requires_grad`` flips —
    use ``trainable_mask`` with ``".kernel." not in path``).
    """
    from gpzoo_tpu.bijectors import lower_cholesky_inverse

    x = jnp.asarray(x)
    groups_x = jnp.asarray(groups_x)
    n = x.shape[0]
    m_total = n_groups * m_per_group

    qf, _ = pnmf.prior()
    # cell 26: rank by Moran's I of the softmax-normalized posterior means
    factors = jax.nn.softmax(qf.mean, axis=-1)
    moran_idx, moran_i = dims_autocorr(
        np.asarray(factors).T, np.asarray(x), n_neighs=n_neighs
    )
    moran_idx = jnp.asarray(moran_idx)

    mean_ranked = pnmf.prior.mean[moran_idx]  # (L_total, N)
    scale_raw_ranked = pnmf.prior.scale_raw[moran_idx]
    w_ranked = pnmf.W_raw[:, moran_idx]  # (D, L_total)
    t_nonspatial = mean_ranked.shape[0] - L_spatial
    if t_nonspatial <= 0:
        raise ValueError(
            f"PNMF has {mean_ranked.shape[0]} factors; need more than "
            f"L_spatial={L_spatial} to keep a non-spatial half"
        )

    k_idx = jax.random.fold_in(key, 0)
    idx = jax.random.choice(k_idx, n, shape=(m_total,), replace=False)

    kernel = kernels.MGGPNSFRBF.create(
        sigma=sigma, lengthscale=lengthscale,
        group_diff_param=group_diff_param, n_groups=n_groups, L=L_spatial,
    )
    # Lu = diag(softplus(pnmf scale at Z)): raw = log on the diagonal,
    # zeros elsewhere (exp-diag bijector inverse of a diagonal matrix).
    lu_diags = softplus(scale_raw_ranked[:L_spatial][:, idx])  # (L, M)
    eye = jnp.eye(m_total)
    lu = lu_diags[:, :, None] * eye  # (L, M, M) diagonal Choleskys
    gp = gps.MGGPSVGP(
        kernel=kernel,
        Z=x[idx],
        groupsZ=groups_x[idx],
        mu=mean_ranked[:L_spatial][:, idx],
        Lu_raw=lower_cholesky_inverse(lu),
        jitter=jitter,
    )
    prior2 = gps.GaussianPrior(
        mean=mean_ranked[L_spatial:],
        scale_raw=scale_raw_ranked[L_spatial:],
    )
    model = models.HybridNSF(
        sf=models.PoissonFactorization(
            prior=gp, W_raw=w_ranked[:, :L_spatial]
        ),
        cf=models.PoissonFactorization(
            prior=prior2, W_raw=w_ranked[:, L_spatial:]
        ),
        V_raw=jnp.ones((n,)),
    )
    return model, np.asarray(moran_idx), moran_i
