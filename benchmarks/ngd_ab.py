"""Natural-gradient VI vs Adam at north-star shapes (beyond-reference).

Same data, same projection, same holdout, same step budget: the Adam arm
is the production precomputed step (`bench.py --workload nsf`); the NGD
arm runs `train.ngd` — natural-gradient updates on (mu, q(u) covariance)
with the same Adam on W/V. Records per-chunk held-out Poisson deviance
trajectories and steps/s for both arms, and the step count at which NGD
first beats the Adam arm's FINAL deviance — the steps-to-quality framing
that motivates NGVI (per-step cost is higher; convergence per step is
what it buys).

Usage: python benchmarks/ngd_ab.py [--steps 800] [--chunk 40]
       [--nat-lr 0.01] [--ramp 400] [--quick]

Defaults are the north-star-certified setting (2026-08-20 device sweep,
docs/PERFORMANCE.md): nat_lr 0.01 with a 400-step ramp converges with 0
rejected steps; 0.02 is intrinsically unstable at this scale (with any
max_f), and un-ramped toy settings (0.05/100) deadlock without the
rate-overflow guard.
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
    p.add_argument("--steps", type=int, default=800)
    p.add_argument("--chunk", type=int, default=40)
    p.add_argument("--nat-lr", type=float, default=0.01)
    p.add_argument("--ramp", type=int, default=400)
    p.add_argument("--N", type=int, default=45_000)
    p.add_argument("--D", type=int, default=4_000)
    p.add_argument("--L", type=int, default=20)
    p.add_argument("--M", type=int, default=3_000)
    p.add_argument("--batch", type=int, default=7_000)
    p.add_argument("--quick", action="store_true",
                   help="small shapes (smoke / CPU)")
    p.add_argument("--arm", choices=["both", "adam", "ngd"], default="both",
                   help="run one arm only (nat-lr sweeps reuse the cached "
                        "Adam result instead of re-measuring it)")
    p.add_argument("--max-f", type=float, default=60.0,
                   help="NGD rate-overflow trust guard (train/ngd.py); "
                        "tighter values act as a trust region")
    args = p.parse_args()
    if args.quick:
        args.N, args.D, args.L, args.M, args.batch = 2000, 100, 4, 128, 512
    if args.steps < 2 * args.chunk:
        p.error("--steps must be >= 2*chunk")

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
    from gpzoo_tpu.train.ngd import make_ngd_train_step, ngd_create

    rng = np.random.default_rng(0)
    coords = rng.uniform(-2, 2, size=(args.N, 2)).astype(np.float32)
    counts_t = rng.poisson(3.0, size=(args.N, args.D)).astype(np.float32)
    x, y = jnp.asarray(coords), jnp.asarray(counts_t)
    holdout = min(2000, args.N // 10)
    n_train = args.N - holdout
    vidx = np.arange(n_train, args.N)

    key = jax.random.PRNGKey(0)
    cfg = gz.SlideseqNSFConfig(D=args.D, N=args.N, L=args.L, M=args.M,
                               batch_size=args.batch)
    model = cfg.build(key, x)
    t0 = time.perf_counter()
    proj = precompute_nsf_projection(model, x)
    log(f"projection built in {time.perf_counter()-t0:.1f}s")

    n_chunks = args.steps // args.chunk
    out = {}

    def run_arm(tag, state, step):
        runner = make_scan_runner(step, args.chunk, donate=True)
        t0 = time.perf_counter()
        state, losses = runner(state, proj, y)
        jax.block_until_ready(losses)
        log(f"{tag}: compile+warmup chunk {time.perf_counter()-t0:.1f}s "
            f"loss[0]={float(losses[0]):.4e}")
        devs = [float(_val_poisson_deviance(state.model, proj, y, vidx))]
        loss_means = [float(np.mean(np.asarray(losses)))]
        times = []
        bad_steps = int((~np.isfinite(np.asarray(losses))).sum())
        for c in range(n_chunks - 1):
            t0 = time.perf_counter()
            state, losses = runner(state, proj, y)
            jax.block_until_ready(losses)
            times.append(time.perf_counter() - t0)
            devs.append(float(_val_poisson_deviance(state.model, proj,
                                                    y, vidx)))
            loss_means.append(float(np.mean(np.asarray(losses))))
            bad_steps += int((~np.isfinite(np.asarray(losses))).sum())
        rate = args.chunk / min(times)
        log(f"{tag}: {rate:.2f} steps/s, {bad_steps} non-finite/skipped "
            f"steps, deviance trajectory {[round(d, 3) for d in devs]}")
        log(f"{tag}: chunk-mean loss trajectory "
            f"{['%.4e' % m for m in loss_means]}")
        return rate, devs, bad_steps

    out = {"steps": args.steps, "chunk": args.chunk}

    if args.arm in ("both", "adam"):
        # Adam arm — the production configuration
        opt = cfg.optimizer()
        st = TrainState.create(model, opt, key)
        adam_step = make_batched_train_step(
            nsf_negative_elbo_precomputed, opt, num_points=n_train,
            batch_size=args.batch,
            static_kwargs={"E": cfg.E, "y_transposed": True})
        adam_rate, adam_devs, adam_bad = run_arm("adam", st, adam_step)
        out["adam"] = {"steps_per_sec": round(adam_rate, 2),
                       "deviance": [round(d, 4) for d in adam_devs],
                       "skipped_steps": adam_bad}
        out["adam_final_deviance"] = round(adam_devs[-1], 4)

    if args.arm in ("both", "ngd"):
        # NGD arm — same Adam on the head, natural steps on (mu, S).
        # Fresh build (same key → identical init): a donated scan runner
        # deletes the previous arm's model buffers.
        model = cfg.build(key, x)
        ngd_state, part_opt = ngd_create(model, cfg.optimizer(), key)
        ngd_step = make_ngd_train_step(
            part_opt, num_points=n_train, batch_size=args.batch,
            nat_lr=args.nat_lr, ramp_steps=args.ramp, max_f=args.max_f,
            static_kwargs={"E": cfg.E, "y_transposed": True})
        ngd_rate, ngd_devs, ngd_bad = run_arm("ngd", ngd_state, ngd_step)
        out["ngd"] = {"steps_per_sec": round(ngd_rate, 2),
                      "deviance": [round(d, 4) for d in ngd_devs],
                      "skipped_steps": ngd_bad,
                      "nat_lr": args.nat_lr, "ramp": args.ramp,
                      "max_f": args.max_f}

    if args.arm == "both":
        target = out["adam_final_deviance"]
        out["ngd_steps_to_adam_final"] = next(
            (i * args.chunk for i, d in enumerate(ngd_devs)
             if d <= target), None)
    print(json.dumps({"metric": "ngd_vs_adam", "value": out,
                      "unit": "deviance trajectory", "vs_baseline": None}))


if __name__ == "__main__":
    main()
