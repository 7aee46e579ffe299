"""Hybrid NSF with NMF warm-start (reference: NSF_Hybrid_benchmark.ipynb):
spatial (GP) + non-spatial (mean-field) factor halves with added rates,
grid inducing points, factors warm-started from a regularized sklearn NMF.

Run: python examples/hybrid_nsf.py [--steps 2000]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse

import jax
import jax.numpy as jnp
import numpy as np

import gpzoo_tpu as gz
from gpzoo_tpu.train import (
    TrainState,
    make_train_step,
    negative_elbo_hybrid,
)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=2000)
    p.add_argument("--grid", type=int, default=23,
                   help="inducing grid side (23x23 like the notebook)")
    args = p.parse_args()

    key = jax.random.PRNGKey(0)
    coords, counts, _ = gz.data.simulate_nsf_counts(N=1500, D=80, L=4)
    x, y = jnp.asarray(coords), jnp.asarray(counts)
    N, D = x.shape[0], y.shape[0]
    L, T = 4, 4

    # NMF warm-start (utilities.py:253-299 path): log-scale factors +
    # nonnegative loadings from the counts.
    f_init, w_init = gz.data.regularized_nmf(
        np.asarray(counts).T, L, max_iter=400, init="nndsvda"
    )

    # inducing grid + factor projection onto mu (notebook cells 7-13)
    side = args.grid
    gx, gy = np.meshgrid(np.linspace(-2, 2, side), np.linspace(-2, 2, side))
    z = np.stack([gx.ravel(), gy.ravel()], -1).astype(np.float32)
    u, _, _ = gz.data.smooth_spatial_factors(f_init, z, x=np.asarray(coords))

    kernel = gz.kernels.NSFRBF.create(L=L, sigma=1.0, lengthscale=1.0)
    gp = gz.gps.SVGP.create(key, kernel, dim=2, M=side * side, jitter=1e-1)
    gp = gp.replace(
        Z=jnp.asarray(z),
        mu=jnp.asarray(u.T),
        Lu_raw=jnp.broadcast_to(
            jnp.zeros((side * side, side * side)),
            (L, side * side, side * side),
        ),  # identity Cholesky
    )
    prior = gz.gps.GaussianPrior.create(key, N=N, L=T)
    model = gz.models.HybridNSF.create(key, gp, prior, D=D, N=N, L=L, T=T)
    model = model.replace(
        sf=model.sf.replace(
            W_raw=jnp.asarray(gz.bijectors.init_softplus(w_init))
        )
    )

    import optax

    opt = optax.adam(5e-3)
    state = TrainState.create(model, opt, key)
    step = make_train_step(negative_elbo_hybrid, opt,
                           static_kwargs={"E": 3})
    for i in range(args.steps):
        state, loss = step(state, x, y)
        if i % max(1, args.steps // 10) == 0:
            print(f"step {i}: loss {float(loss):.4e}")

    qf, _, _ = state.model.sf.prior(x)
    idx, morans = gz.data.dims_autocorr(
        np.exp(np.asarray(qf.mean)).T, np.asarray(coords)
    )
    print("spatial factors by Moran's I:", np.round(morans, 3))


if __name__ == "__main__":
    main()
