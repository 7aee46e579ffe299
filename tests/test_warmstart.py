"""End-to-end Hybrid-MGGP warm-start pipeline (VERDICT round-1 item 4;
reference notebook Slideseq_MGGP_hybrid_new_version-Copy1.ipynb cells
15-35): PNMF -> Moran split -> seeded MGGP_SVGP + GaussianPrior ->
HybridNSF fine-tune."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

import gpzoo_tpu as gz
from gpzoo_tpu.bijectors import lower_cholesky, softplus
from gpzoo_tpu.train import (
    TrainState,
    make_train_step,
    make_batched_train_step,
    trainable_mask,
    partition_optimizer,
    freeze_loss,
    pnmf_negative_elbo,
    negative_elbo_hybrid_batched,
)


@pytest.fixture(scope="module")
def pipeline():
    N, D, L_total, L_sp, G, m_pg = 300, 15, 6, 3, 3, 8
    coords, counts, _ = gz.data.simulate_nsf_counts(N=N, D=D, L=L_sp, seed=4)
    x = jnp.asarray(coords)
    y = jnp.asarray(counts, jnp.float64)
    rng = np.random.default_rng(0)
    groups = jnp.asarray(rng.integers(0, G, N))

    # stage 1: PNMF (cells 15-21; full batch, unnormalized Poisson)
    k = jax.random.PRNGKey(11)
    prior = gz.gps.GaussianPrior.create(k, N, L=L_total)
    pnmf = gz.models.PNMF.create(jax.random.fold_in(k, 1), prior, D, N,
                                 L=L_total)
    opt = optax.adam(5e-2)
    state = TrainState.create(pnmf, opt, k)
    step = make_train_step(pnmf_negative_elbo, opt,
                           static_kwargs={"E": 2, "unnormalized": True})
    losses = []
    for _ in range(300):
        state, loss = step(state, y)
        losses.append(float(loss))
    assert losses[-1] < losses[0]

    # stages 2-5: Moran ranking + warm-started hybrid assembly (cell 29)
    model, moran_idx, moran_i = gz.warmstart.hybrid_mggp_from_pnmf(
        jax.random.PRNGKey(5), state.model, x, groups,
        L_spatial=L_sp, m_per_group=m_pg, n_groups=G,
    )
    return state.model, model, moran_idx, moran_i, x, y, groups, losses


def test_warmstart_assembly(pipeline):
    pnmf, model, moran_idx, moran_i, x, y, groups, _ = pipeline
    L_sp, G, m_pg, N = 3, 3, 8, 300
    m_total = G * m_pg
    # Moran ranking is sorted decreasing and a permutation of all factors
    assert sorted(moran_idx.tolist()) == list(range(6))
    assert np.all(np.diff(moran_i) <= 1e-12)
    # GP half: seeded per-factor mu/Lu at the inducing subset
    gp = model.sf.prior
    assert gp.mu.shape == (L_sp, m_total)
    assert gp.Lu_raw.shape == (L_sp, m_total, m_total)
    lu = lower_cholesky(gp.Lu_raw)
    # Lu is diagonal with the PNMF posterior scales (cell 29)
    off = lu - jnp.eye(m_total) * jnp.diagonal(lu, axis1=-2, axis2=-1)[
        :, :, None] * jnp.eye(m_total)
    assert float(jnp.max(jnp.abs(jnp.tril(lu, k=-1)))) == 0.0
    assert float(jnp.min(jnp.diagonal(lu, axis1=-2, axis2=-1))) > 0.0
    # mu rows are actual PNMF posterior-mean values (subset of row values)
    ranked_mean = np.asarray(pnmf.prior.mean)[moran_idx][:L_sp]
    for l in range(L_sp):
        assert set(np.round(np.asarray(gp.mu)[l], 6)).issubset(
            set(np.round(ranked_mean[l], 6))
        )
    # non-spatial half: remaining rows verbatim
    np.testing.assert_array_equal(
        np.asarray(model.cf.prior.mean),
        np.asarray(pnmf.prior.mean)[moran_idx][L_sp:],
    )
    # W halves: corresponding PNMF loading columns
    np.testing.assert_array_equal(
        np.asarray(model.sf.W_raw),
        np.asarray(pnmf.W_raw)[:, moran_idx][:, :L_sp],
    )


def test_warmstart_finetune_trains(pipeline):
    """Cells 32-35: fine-tune with kernel hyperparams frozen; loss must
    decrease and stay finite."""
    _, model, _, _, x, y, groups, _ = pipeline
    N = x.shape[0]
    mask = trainable_mask(model, lambda p: ".kernel." not in p)
    opt = partition_optimizer(optax.adam(1e-2), mask)
    state = TrainState.create(model, opt, jax.random.PRNGKey(7))
    step = make_batched_train_step(
        freeze_loss(negative_elbo_hybrid_batched, mask), opt,
        num_points=N, batch_size=64,
        static_kwargs={"E": 2, "groups_x": groups},
    )
    losses = []
    for _ in range(200):
        state, loss = step(state, x, y)
        losses.append(float(loss))
    assert np.all(np.isfinite(losses))
    assert np.mean(losses[-20:]) < np.mean(losses[:20])
    # kernel hyperparameters really frozen
    np.testing.assert_array_equal(
        np.asarray(state.model.sf.prior.kernel.lengthscale),
        np.asarray(model.sf.prior.kernel.lengthscale),
    )
