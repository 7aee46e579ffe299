"""Per-factor kernel hyperparameter estimation (reference:
Slideseqv2_estimate_lengthscales.ipynb cell 16): a batched RBF with
(L,)-vector σ/ℓ, KMeans-initialized inducing points, Gaussian likelihood
on real-valued factors — recovers a separate lengthscale per factor.

Run: python examples/estimate_lengthscales.py [--steps 500]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse

import jax
import jax.numpy as jnp
import numpy as np

import gpzoo_tpu as gz
from gpzoo_tpu.train import TrainState, make_train_step, negative_elbo


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=500)
    args = p.parse_args()

    key = jax.random.PRNGKey(0)
    # factors with different true smoothness per dimension
    rng = np.random.default_rng(0)
    n, L = 1500, 3
    x = rng.uniform(-2, 2, (n, 2)).astype(np.float32)
    true_ell = [0.3, 1.0, 2.5]
    f = np.stack(
        [np.sin(x[:, 0] / e) * np.cos(x[:, 1] / e) for e in true_ell]
    ) + 0.1 * rng.standard_normal((L, n))

    kernel = gz.kernels.BatchedRBF(
        sigma=jnp.ones((L,)), lengthscale=jnp.ones((L,))
    )
    M = 100
    # KMeans inducing init (the notebook's scheme)
    from sklearn.cluster import KMeans

    z = KMeans(n_clusters=M, n_init=3, random_state=0).fit(x).cluster_centers_
    gp = gz.gps.SVGP.create(key, kernel, dim=2, M=M, jitter=1e-3)
    gp = gp.replace(
        Z=jnp.asarray(z, jnp.float32),
        mu=jnp.zeros((L, M)),
        Lu_raw=jnp.broadcast_to(-2.3 * jnp.eye(M), (L, M, M)),
    )
    model = gz.models.GaussianLikelihood.create(gp, noise=0.3)

    import optax

    opt = optax.adam(1e-2)
    state = TrainState.create(model, opt, key)
    step = make_train_step(negative_elbo, opt, static_kwargs={"E": 5})
    xj, fj = jnp.asarray(x), jnp.asarray(f)
    for i in range(args.steps):
        state, loss = step(state, xj, fj)
        if i % max(1, args.steps // 5) == 0:
            print(f"step {i}: loss {float(loss):.1f}")

    ell = np.abs(np.asarray(state.model.gp.kernel.lengthscale))
    print("\nestimated lengthscales:", np.round(ell, 2))
    print("true smoothness scales:", true_ell)


if __name__ == "__main__":
    main()
