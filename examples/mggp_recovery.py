"""MGGP synthetic hyperparameter recovery (reference: mggp_test.ipynb).

Sample Y from a ground-truth multi-group RBF MVN (σ=2, ℓ=1.5, α=2, two
groups), fit a whitened MGGP SVGP with a Gaussian likelihood via the
closed-form whitened KL, and report recovered hyperparameters.

Run: python examples/mggp_recovery.py [--steps 2000]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse

import jax
import jax.numpy as jnp
import numpy as np

import gpzoo_tpu as gz
from gpzoo_tpu.ops import add_jitter
from gpzoo_tpu.train import TrainState, make_train_step
from gpzoo_tpu.train.elbo import whitened_negative_elbo


def simulate(key, n=400, sigma=2.0, ell=1.5, alpha=2.0, noise=0.2):
    kx, kg, kf, kn = jax.random.split(key, 4)
    x = jax.random.uniform(kx, (n, 1), minval=-3.0, maxval=3.0)
    groups = jax.random.randint(kg, (n,), 0, 2)
    kernel = gz.kernels.BatchedMGGPRBF.create(
        sigma=sigma, lengthscale=ell, group_diff_param=alpha, n_groups=2,
        input_dim=1,
    )
    k = add_jitter(kernel.gram(x, x, groups, groups), 1e-4)
    chol = jnp.linalg.cholesky(k)
    f = chol @ jax.random.normal(kf, (n,))
    y = f + noise * jax.random.normal(kn, (n,))
    return x, groups, y


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=2000)
    p.add_argument("--n", type=int, default=400)
    args = p.parse_args()

    key = jax.random.PRNGKey(0)
    x, groups, y = simulate(key)

    kernel = gz.kernels.BatchedMGGPRBF.create(
        sigma=1.0, lengthscale=1.0, group_diff_param=1.0, n_groups=2,
        input_dim=1,
    )
    gp = gz.gps.MGGPWSVGP.create(key, kernel, dim=1, M=64, n_groups=2,
                                 jitter=1e-4)
    gp = gp.replace(Z=x[:: args.n // 64][:64])
    model = gz.models.GaussianLikelihood.create(gp, noise=0.5)

    import optax

    opt = optax.adam(1e-2)
    state = TrainState.create(model, opt, key)
    step = make_train_step(
        whitened_negative_elbo, opt,
        static_kwargs={"E": 10, "groups_x": groups},
    )
    for i in range(args.steps):
        state, loss = step(state, x, y)
        if i % max(1, args.steps // 10) == 0:
            print(f"step {i}: loss {float(loss):.1f}")

    k = state.model.gp.kernel
    print("\nrecovered vs truth:")
    print(f"  sigma        {abs(float(np.asarray(k.sigma))):.2f}  (true 2.0)")
    print(f"  lengthscale  {abs(float(np.asarray(k.lengthscale))):.2f}  (true 1.5)")
    print(f"  |alpha|      {abs(float(np.asarray(k.group_diff_param))):.2f}  (true 2.0)")


if __name__ == "__main__":
    main()
