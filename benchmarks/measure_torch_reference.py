"""Measure the PyTorch reference's per-step training time on THIS machine.

BASELINE.md: the reference never recorded the north-star workload's wall
time, so the ≥10x-vs-CPU-reference claim must be anchored by re-measuring
the reference locally (torch CPU). This script imports the reference from
/root/reference (read-only) and times its exact training-step body
(utilities.py train_batched / train) on synthetic data with the notebook
shapes, writing results to benchmarks/reference_baseline.json.

Run once per machine: python benchmarks/measure_torch_reference.py
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, "/root/reference")

import torch  # noqa: E402
from torch import distributions, optim  # noqa: E402

from gpzoo.gp import SVGP  # noqa: E402
from gpzoo.kernels import NSF_RBF  # noqa: E402
from gpzoo.likelihoods import NSF2  # noqa: E402

OUT = os.path.join(os.path.dirname(__file__), "reference_baseline.json")


def _sim(N, D, seed=0):
    rng = np.random.default_rng(seed)
    X = rng.uniform(-2, 2, size=(N, 2)).astype(np.float32)
    Y = rng.poisson(3.0, size=(D, N)).astype(np.float32)
    return torch.tensor(X), torch.tensor(Y)


def step_batched(model, optimizer, X, Y, batch_size, E):
    """One minibatch training step, the exact body of utilities.py:600-626
    / Slideseq notebook cell 21."""
    idx = torch.multinomial(torch.ones(X.shape[0]), num_samples=batch_size,
                            replacement=False)
    optimizer.zero_grad()
    pY, _, qU, pU = model.forward_batched(X=X, idx=idx, E=E)
    logpY = Y[:, idx] * torch.log(pY.rate) - pY.rate
    ELBO = logpY.mean(axis=0).sum()
    ELBO -= torch.sum(distributions.kl_divergence(qU, pU))
    loss = -ELBO
    loss.backward()
    optimizer.step()
    return float(loss)


def step_full(model, optimizer, X, Y, E):
    """Full-batch step body (utilities.py:471-487)."""
    optimizer.zero_grad()
    pY, _, qU, pU = model(X=X, E=E)
    ELBO = pY.log_prob(Y).mean(axis=0).sum()
    ELBO -= torch.sum(distributions.kl_divergence(qU, pU))
    loss = -ELBO
    loss.backward()
    optimizer.step()
    return float(loss)


def build_nsf(N, D, L, M, jitter, lengthscale=1.0, per_factor_mu=False):
    X, Y = _sim(N, D)
    kernel = NSF_RBF(L=L, sigma=1.0, lengthscale=lengthscale)
    gp = SVGP(kernel, M=M, jitter=jitter)
    if per_factor_mu:
        gp.Lu = torch.nn.Parameter(
            torch.eye(M).expand(L, M, M).clone()
        )
        gp.mu = torch.nn.Parameter(torch.randn((L, M)))
    idx = torch.multinomial(torch.ones(N), num_samples=M,
                            replacement=M > N)
    gp.Z = torch.nn.Parameter(X[idx].clone(), requires_grad=False)
    model = NSF2(gp, Y, L=L)
    return model, X, Y


def timed(fn, steps, warmup=1):
    for _ in range(warmup):
        fn()
    t0 = time.perf_counter()
    for _ in range(steps):
        fn()
    dt = time.perf_counter() - t0
    return dt / steps


def main():
    results = {"threads": torch.get_num_threads()}

    # NSF benchmark rows (NSF_benchmarks_cpu.ipynb): L=4, full batch, E=20.
    for M in (100, 1000):
        model, X, Y = build_nsf(N=800, D=80, L=4, M=M, jitter=1e-1)
        opt = optim.Adam(model.parameters(), lr=5e-3)
        sec = timed(lambda: step_full(model, opt, X, Y, E=20), steps=3)
        results[f"nsf_benchmark_M{M}_steps_per_sec"] = 1.0 / sec
        print(f"NSF benchmark M={M}: {sec:.3f}s/step", flush=True)
        _dump(results)

    # North star (Slideseq_NSF_newest_version.ipynb): L=20, M=3000,
    # batch 7000, E=1, D=4000, N=45000.
    model, X, Y = build_nsf(N=45_000, D=4_000, L=20, M=3000, jitter=1e-1,
                            per_factor_mu=True)
    opt = optim.Adam(model.parameters(), lr=2e-3)
    t0 = time.perf_counter()
    step_batched(model, opt, X, Y, batch_size=7000, E=1)
    first = time.perf_counter() - t0
    print(f"north star first step: {first:.1f}s", flush=True)
    t0 = time.perf_counter()
    step_batched(model, opt, X, Y, batch_size=7000, E=1)
    second = time.perf_counter() - t0
    print(f"north star second step: {second:.1f}s", flush=True)
    results["slideseq_nsf_steps_per_sec"] = 1.0 / second
    results["slideseq_nsf_first_step_sec"] = first
    _dump(results)
    print("wrote", OUT)


def _dump(results):
    with open(OUT, "w") as f:
        json.dump(results, f, indent=2)


if __name__ == "__main__":
    main()
