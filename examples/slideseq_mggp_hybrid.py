"""Slideseq Hybrid-MGGP warm-start workflow (reference:
Slideseq_MGGP_hybrid_new_version-Copy1.ipynb cells 15-35).

Pipeline: train PNMF on the counts -> rank factors by Moran's I -> seed an
MGGP_SVGP (mu/Lu from the PNMF posterior at an inducing subset) and a
GaussianPrior (remaining factors verbatim) -> fine-tune the HybridNSF with
kernel hyperparameters frozen.

Run: python examples/slideseq_mggp_hybrid.py
     [--N 4000 --D 200 --pnmf-steps 1500 --steps 2000]
Full Slideseq scale: --N 45000 --D 4000 --L-total 20 --L-spatial 10
                     --m-per-group 215 --groups 14 --batch 6000
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np

import gpzoo_tpu as gz
from gpzoo_tpu.train import (
    TrainState,
    make_train_step,
    make_batched_train_step,
    make_scan_runner,
    trainable_mask,
    partition_optimizer,
    freeze_loss,
    pnmf_negative_elbo,
    negative_elbo_hybrid_batched,
)
import optax


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--N", type=int, default=4000)
    p.add_argument("--D", type=int, default=200)
    p.add_argument("--L-total", type=int, default=8)
    p.add_argument("--L-spatial", type=int, default=4)
    p.add_argument("--m-per-group", type=int, default=40)
    p.add_argument("--groups", type=int, default=4)
    p.add_argument("--pnmf-steps", type=int, default=1500)
    p.add_argument("--steps", type=int, default=2000)
    p.add_argument("--batch", type=int, default=1000)
    args = p.parse_args()
    if args.pnmf_steps < 1 or args.steps < 1:
        p.error("--pnmf-steps and --steps must be >= 1")

    key = jax.random.PRNGKey(509)  # cell 15's seed callout
    coords, counts, _ = gz.data.simulate_nsf_counts(
        N=args.N, D=args.D, L=args.L_spatial, seed=0
    )
    x = jnp.asarray(coords)
    y = jnp.asarray(counts)
    rng = np.random.default_rng(0)
    groups = jnp.asarray(rng.integers(0, args.groups, args.N))

    # ---- stage 1: PNMF (cells 15-21) -----------------------------------
    prior = gz.gps.GaussianPrior.create(key, args.N, L=args.L_total)
    pnmf = gz.models.PNMF.create(jax.random.fold_in(key, 1), prior,
                                 args.D, args.N, L=args.L_total)
    opt = optax.adam(1e-2)
    state = TrainState.create(pnmf, opt, key)
    step = make_train_step(pnmf_negative_elbo, opt,
                           static_kwargs={"E": 1, "unnormalized": True})
    chunk1 = min(100, args.pnmf_steps)  # chunk1 <= steps → loop runs >= 1
    runner = make_scan_runner(step, chunk1)
    t0 = time.perf_counter()
    ran1 = (args.pnmf_steps // chunk1) * chunk1  # whole chunks; be truthful
    for _ in range(args.pnmf_steps // chunk1):
        state, losses = runner(state, y)
    print(f"PNMF: {ran1} steps in {time.perf_counter()-t0:.1f}s, "
          f"loss {float(losses[-1]):.4e}")

    # ---- stages 2-5: Moran split + warm-started hybrid (cell 29) -------
    model, moran_idx, moran_i = gz.warmstart.hybrid_mggp_from_pnmf(
        jax.random.fold_in(key, 2), state.model, x, groups,
        L_spatial=args.L_spatial, m_per_group=args.m_per_group,
        n_groups=args.groups,
    )
    print(f"Moran's I (ranked): {np.round(moran_i, 3)}")
    print(f"spatial half: L={args.L_spatial}, "
          f"M={args.groups * args.m_per_group} inducing; "
          f"non-spatial half: T={args.L_total - args.L_spatial}")

    # ---- stage 6: fine-tune, kernel frozen (cells 32-35) ---------------
    mask = trainable_mask(model, lambda p: ".kernel." not in p)
    opt2 = partition_optimizer(optax.adam(1e-3), mask)
    state2 = TrainState.create(model, opt2, jax.random.fold_in(key, 3))
    step2 = make_batched_train_step(
        freeze_loss(negative_elbo_hybrid_batched, mask), opt2,
        num_points=args.N, batch_size=args.batch,
        static_kwargs={"E": 3, "groups_x": groups},
    )
    chunk2 = min(100, args.steps)  # chunk2 <= steps → loop runs >= 1
    runner2 = make_scan_runner(step2, chunk2)
    t0 = time.perf_counter()
    first = last = None
    ran2 = (args.steps // chunk2) * chunk2  # whole chunks; be truthful
    for c in range(args.steps // chunk2):
        state2, losses = runner2(state2, x, y)
        if first is None:
            first = float(losses[0])
        last = float(losses[-1])
    dt = time.perf_counter() - t0
    print(f"hybrid fine-tune: {ran2} steps in {dt:.1f}s "
          f"({ran2/dt:.1f} steps/s), loss {first:.4e} -> {last:.4e}")

    # posterior spatial factors at all spots (cell 37)
    qf1, _, _ = state2.model.sf.prior(x, groups_x=groups)
    factors1 = np.exp(np.asarray(qf1.mean))
    _, moran_after = gz.data.dims_autocorr(factors1.T, np.asarray(x))
    print(f"fine-tuned spatial factors Moran's I: {np.round(moran_after, 3)}")


if __name__ == "__main__":
    main()
