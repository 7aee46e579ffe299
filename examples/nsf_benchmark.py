"""NSF spatial-factorization benchmark (reference: NSF_benchmarks.ipynb).

L=4 factors over simulated spatial counts, M ∈ {100, 250, 500, 1000}
inducing points, 10k full-batch Adam steps, E=20 — the reference's §6
timing table, reproduced with scan-fused chunks.

Run: python examples/nsf_benchmark.py [--m 100 250 500 1000] [--steps 10000]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse
import time

import jax
import jax.numpy as jnp

import gpzoo_tpu as gz
from gpzoo_tpu.train import (
    TrainState,
    make_scan_runner,
    make_train_step,
    negative_elbo,
)


def run_one(M, steps, chunk=100):
    key = jax.random.PRNGKey(0)
    coords, counts, _ = gz.data.simulate_nsf_counts(N=800, D=80, L=4)
    x, y = jnp.asarray(coords), jnp.asarray(counts)
    cfg = gz.NSFConfig(D=80, N=800, L=4, M=M)
    model = cfg.build(key, X=x)
    opt = cfg.optimizer()
    state = TrainState.create(model, opt, key)
    step = make_train_step(negative_elbo, opt, static_kwargs={"E": cfg.E})
    runner = make_scan_runner(step, chunk)

    state, losses = runner(state, x, y)  # compile + warm chunk
    jax.block_until_ready(losses)
    t0 = time.perf_counter()
    done = chunk
    while done < steps:
        state, losses = runner(state, x, y)
        done += chunk
    jax.block_until_ready(losses)
    dt = time.perf_counter() - t0
    rate = (done - chunk) / dt
    print(f"M={M}: {dt:.1f}s for {done-chunk} steps -> {rate:.1f} steps/s "
          f"(final loss {float(losses[-1]):.3e})")
    return rate


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--m", type=int, nargs="+", default=[100, 250, 500, 1000])
    p.add_argument("--steps", type=int, default=10_000)
    args = p.parse_args()
    for M in args.m:
        run_one(M, args.steps)


if __name__ == "__main__":
    main()
