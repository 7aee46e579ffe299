"""1-D SVGP regression toy (reference workflow: SVGP.ipynb cells 2-9).

N=10k points of y = 2·sin(2x) + ε, RBF(σ=1, ℓ=5), M=500 inducing points,
Gaussian likelihood, Adam(1e-3), E=20 MC samples — trained as one jitted
step per iteration.

Run: python examples/svgp_regression.py [--steps 200]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse

import jax
import jax.numpy as jnp
import numpy as np

import gpzoo_tpu as gz
from gpzoo_tpu.train import TrainState, make_train_step, negative_elbo, train


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=200)
    p.add_argument("--n", type=int, default=10_000)
    p.add_argument("--m", type=int, default=500)
    args = p.parse_args()

    key = jax.random.PRNGKey(0)
    x_np, y_np = gz.data.simulate_1d_regression(n=args.n)
    x, y = jnp.asarray(x_np), jnp.asarray(y_np)

    cfg = gz.SVGPRegressionConfig(n=args.n, M=args.m)
    model = cfg.build(key)
    # place inducing points on the data range (the notebook samples x there)
    model = model.replace(
        gp=model.gp.replace(
            Z=jnp.linspace(0.0, 6.0, args.m)[:, None].astype(x.dtype)
        )
    )

    opt = cfg.optimizer()
    state = TrainState.create(model, opt, key)
    step = make_train_step(negative_elbo, opt, static_kwargs={"E": cfg.E})
    state, losses = train(state, step, x, y, steps=args.steps)
    print(f"loss: {losses[0]:.1f} -> {losses[-1]:.1f}")

    # posterior check against the ground-truth function
    qf, _, _ = state.model.gp(x)
    rmse = float(jnp.sqrt(jnp.mean((qf.mean - 2 * jnp.sin(2 * x[:, 0])) ** 2)))
    print(f"posterior-mean RMSE vs true function: {rmse:.3f}")


if __name__ == "__main__":
    main()
