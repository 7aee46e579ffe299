"""Rank sensitivity of the low-rank q(u) family at north-star shapes.

One process, one dataset, one precomputed projection (the projection
depends on Z/kernel only, not on rank): for each rank r, train 800 steps
of `SlideseqNSFConfig(rank=r)` through the precomputed fast loss, record
steps/s (best timed chunk) and held-out Poisson deviance — the evidence
behind the rank=64 default in `bench.py --rank` / the `--workload all`
low-rank certification leg (docs/PERFORMANCE.md "Low-rank-plus-diagonal
q(u)" section).

Usage: python benchmarks/lowrank_rank_sweep.py [--ranks 16 32 64 128]
       [--steps 800] [--chunk 20]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--ranks", type=int, nargs="+",
                   default=[16, 32, 64, 128])
    p.add_argument("--steps", type=int, default=800)
    p.add_argument("--chunk", type=int, default=20)
    p.add_argument("--N", type=int, default=45_000)
    p.add_argument("--D", type=int, default=4_000)
    p.add_argument("--L", type=int, default=20)
    p.add_argument("--M", type=int, default=3_000)
    p.add_argument("--batch", type=int, default=7_000)
    args = p.parse_args()
    if any(r < 1 for r in args.ranks):
        # rank 0 = the full (unwhitened SVGP) family, whose projection is
        # a DIFFERENT object (a~ = K^-1 Kzx, not Lzz^-1 Kzx) — reusing one
        # projection across the two families would score a wrong
        # objective. bench.py --workload nsf benchmarks the full family.
        p.error("--ranks must be >= 1 (use bench.py for the full family)")
    if args.steps < 2 * args.chunk:
        p.error("--steps must be >= 2*chunk (first chunk is the "
                "untimed compile+warmup)")

    import jax
    import jax.numpy as jnp
    import optax

    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)

    import gpzoo_tpu as gz
    from bench import _val_poisson_deviance, log
    from gpzoo_tpu.train import (TrainState, make_batched_train_step,
                                 make_scan_runner)
    from gpzoo_tpu.train.fast import (nsf_negative_elbo_precomputed,
                                      precompute_nsf_projection)

    rng = np.random.default_rng(0)
    coords = rng.uniform(-2, 2, size=(args.N, 2)).astype(np.float32)
    counts_t = rng.poisson(3.0, size=(args.N, args.D)).astype(np.float32)
    x, y = jnp.asarray(coords), jnp.asarray(counts_t)
    holdout = min(2000, args.N // 10)
    n_train = args.N - holdout

    proj = None
    out = {}
    for r in args.ranks:
        # fresh key per rank so every rank's init stream is identical
        # and independent of loop order (TrainState.create keeps its own
        # copy of the key, so donation of the prior state is not a
        # concern here)
        key = jax.random.PRNGKey(0)
        cfg = gz.SlideseqNSFConfig(D=args.D, N=args.N, L=args.L, M=args.M,
                                   batch_size=args.batch, rank=r)
        model = cfg.build(key, x)
        if proj is None:  # rank-independent (kernel/Z only) — build once
            t0 = time.perf_counter()
            proj = precompute_nsf_projection(model, x)
            log(f"projection built once in {time.perf_counter()-t0:.1f}s")
        opt = cfg.optimizer()
        state = TrainState.create(model, opt, key)
        step = make_batched_train_step(
            nsf_negative_elbo_precomputed, opt,
            num_points=n_train, batch_size=args.batch,
            static_kwargs={"E": cfg.E, "y_transposed": True},
        )
        runner = make_scan_runner(step, args.chunk, donate=True)
        t0 = time.perf_counter()
        state, losses = runner(state, proj, y)
        jax.block_until_ready(losses)
        log(f"rank {r}: compile+warmup {time.perf_counter()-t0:.1f}s, "
            f"loss[0]={float(losses[0]):.3e}")
        first_chunk = np.asarray(losses)
        times = []
        for _ in range(args.steps // args.chunk - 1):
            t0 = time.perf_counter()
            state, losses = runner(state, proj, y)
            jax.block_until_ready(losses)
            times.append(time.perf_counter() - t0)
        rate = args.chunk / min(times)
        dev = float(_val_poisson_deviance(state.model, proj, y,
                                          np.arange(n_train, args.N)))
        assert float(np.mean(np.asarray(losses))) < float(
            np.mean(first_chunk)), f"rank {r}: loss did not descend"
        log(f"rank {r}: {rate:.1f} steps/s, holdout deviance {dev:.4f}, "
            f"final loss {float(losses[-1]):.4e}")
        out[str(r)] = {"steps_per_sec": round(rate, 1),
                       "val_deviance": round(dev, 4)}
    print(json.dumps({"metric": "nsf_lowrank_rank_sweep", "value": out,
                      "unit": "steps/s + deviance per rank",
                      "vs_baseline": None}))


if __name__ == "__main__":
    main()
