"""Low-rank variational covariance on NSF (beyond-reference capability).

`SlideseqNSFConfig(rank=r)` swaps the full (L, M, M) variational Cholesky
for `gps.LowRankWSVGP`'s q(v) = N(mu, D + VV^T) — O(M*r) state, no M x M
tensor in the training step. At north-star scale (L=20, M=3000) this
measured 198 steps/s vs 24.4 for the full family on one v5e with BETTER
held-out deviance at an equal 800-step budget (docs/PERFORMANCE.md).

This example trains both families on the same simulated data at toy
scale and reports loss trajectories, wall times, and Moran's I of the
recovered spatial factors.

Run: python examples/nsf_lowrank.py [--N 1500 --steps 400 --rank 8]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import argparse

import jax
import jax.numpy as jnp
import numpy as np

import gpzoo_tpu as gz
from _example_timing import run_chunked
from gpzoo_tpu.train import TrainState, make_batched_train_step
from gpzoo_tpu.train.fast import (nsf_negative_elbo_precomputed,
                                  precompute_nsf_projection)


def train_one(tag, model, X, Y, N, batch, steps, lr):
    import optax

    proj = precompute_nsf_projection(model, X)
    opt = optax.adam(lr)
    state = TrainState.create(model, opt, jax.random.PRNGKey(1))
    step = make_batched_train_step(
        nsf_negative_elbo_precomputed, opt, num_points=N, batch_size=batch,
        static_kwargs={"E": 1},
    )
    return run_chunked(tag, state, step, (proj, Y), steps)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--N", type=int, default=1500)
    p.add_argument("--D", type=int, default=40)
    p.add_argument("--L", type=int, default=4)
    p.add_argument("--M", type=int, default=128)
    p.add_argument("--rank", type=int, default=8)
    p.add_argument("--steps", type=int, default=400)
    p.add_argument("--batch", type=int, default=256)
    args = p.parse_args()
    if args.steps < 1:
        p.error("--steps must be >= 1")

    key = jax.random.PRNGKey(0)
    coords, counts, _ = gz.data.simulate_nsf_counts(
        N=args.N, D=args.D, L=args.L, seed=0)
    X, Y = jnp.asarray(coords), jnp.asarray(counts)

    for tag, rank in (("full (L,M,M) Cholesky", 0),
                      (f"low-rank r={args.rank}", args.rank)):
        cfg = gz.SlideseqNSFConfig(D=args.D, N=args.N, L=args.L, M=args.M,
                                   batch_size=args.batch, rank=rank,
                                   lr=5e-3)
        model = cfg.build(key, X)
        state = train_one(tag, model, X, Y, args.N, args.batch,
                          args.steps, cfg.lr)
        qf, _, _ = state.model.prior(X)
        factors = np.exp(np.asarray(qf.mean))
        _, moran = gz.data.dims_autocorr(factors.T, np.asarray(X))
        print(f"{tag}: Moran's I of recovered factors "
              f"{np.round(moran, 3)}")


if __name__ == "__main__":
    main()
