"""PNMF benchmark (reference: PNMF_benchmarks.ipynb cells 8-14):
Poisson NMF with a mean-field prior, L=4, Adam(1e-2), E=20.

Run: python examples/pnmf.py [--steps 10000]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse
import time

import jax
import jax.numpy as jnp

import gpzoo_tpu as gz
from gpzoo_tpu.train import TrainState, make_scan_runner, make_train_step
from gpzoo_tpu.train.elbo import pnmf_negative_elbo


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=10_000)
    args = p.parse_args()

    key = jax.random.PRNGKey(0)
    coords, counts, _ = gz.data.simulate_nsf_counts(N=1000, D=80, L=4)
    y = jnp.asarray(counts)

    cfg = gz.PNMFConfig(D=80, N=1000, L=4)
    model = cfg.build(key)
    opt = cfg.optimizer()
    state = TrainState.create(model, opt, key)

    step = make_train_step(
        lambda m, y, key: pnmf_negative_elbo(m, y, key, E=cfg.E), opt
    )
    chunk = 200
    runner = make_scan_runner(step, chunk)
    state, losses = runner(state, y)
    jax.block_until_ready(losses)
    t0 = time.perf_counter()
    done = chunk
    while done < args.steps:
        state, losses = runner(state, y)
        done += chunk
    jax.block_until_ready(losses)
    dt = time.perf_counter() - t0
    print(f"{done-chunk} steps in {dt:.1f}s -> {(done-chunk)/dt:.0f} steps/s; "
          f"final loss {float(losses[-1]):.3e}")


if __name__ == "__main__":
    main()
