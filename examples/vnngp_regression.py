"""VNNGP 1-D regression (reference: vnngp.ipynb / pri_test.ipynb):
nearest-neighbor sparse conditioning with K ∈ {3, 5} over M=1000 inducing
points — per-point cost O(K³), independent of M.

Run: python examples/vnngp_regression.py [--k 5] [--steps 200]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse

import jax
import jax.numpy as jnp

import gpzoo_tpu as gz
from gpzoo_tpu.train import TrainState, make_train_step, negative_elbo


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--k", type=int, default=5)
    p.add_argument("--m", type=int, default=1000)
    p.add_argument("--steps", type=int, default=200)
    args = p.parse_args()

    key = jax.random.PRNGKey(0)
    x_np, y_np = gz.data.simulate_1d_regression(n=5000)
    x, y = jnp.asarray(x_np), jnp.asarray(y_np)

    kernel = gz.kernels.NSFRBF.create(L=1, sigma=1.0, lengthscale=1.0,
                                      input_dim=1)
    gp = gz.gps.VNNGP.create(key, kernel, dim=1, M=args.m, K=args.k,
                             jitter=1e-2)
    gp = gp.replace(
        Z=jnp.linspace(0, 6, args.m)[:, None],
        mu=jnp.zeros((1, args.m)),
        Lu_raw=0.1 * jax.random.normal(key, (1, args.m, args.m)),
    )
    model = gz.models.GaussianLikelihood.create(gp, noise=0.5)

    import optax

    opt = optax.adam(1e-2)
    state = TrainState.create(model, opt, key)
    step = make_train_step(negative_elbo, opt, static_kwargs={"E": 10})
    for i in range(args.steps):
        state, loss = step(state, x, y)
        if i % max(1, args.steps // 10) == 0:
            print(f"step {i}: loss {float(loss):.1f}")

    qf, _, _ = state.model.gp(x)
    rmse = float(jnp.sqrt(jnp.mean(
        (qf.mean[0] - 2 * jnp.sin(2 * x[:, 0])) ** 2
    )))
    print(f"posterior-mean RMSE vs true function: {rmse:.3f}")


if __name__ == "__main__":
    main()
