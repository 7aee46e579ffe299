"""Grid-sweep benchmark harness: timing records + checkpoints per config.

The reference's sweep harness (`nnnsf_visium_anim_experiment.ipynb`
cell 12, `run_benchmarking_experiments`) loops over model configurations,
trains each, and persists a timing record (`.npy`) plus a `state_dict`
per configuration. This is its committed, runnable equivalent:

  python benchmarks/nsf_sweep.py --out /tmp/sweep           # full table
  python benchmarks/nsf_sweep.py --steps 1000 --m 100 250   # quick

For every configuration it writes, under --out:
  records.json             — one record per config: shapes, steps/s,
                             wall seconds, final loss, device
  <name>.ckpt              — checkpoint (params + optimizer state +
                             step + PRNG key, train/checkpoint.py)

The default grid reproduces the reference's §6 NSF benchmark table
(`NSF_benchmarks.ipynb` cells 9-21): full-batch NSF on the nsf-paper
simulation shapes (N=800, D=80, L=4, E=20), M ∈ {100, 250, 500, 1000},
10k Adam steps — plus one VNNGP row (`NSF2(VNNGP)`, the nnnsf workload)
when --vnngp is set. Reference timings for the NSF rows (unspecified
CUDA GPU): 78 / 118 / 201 / 454 s; see docs/PERFORMANCE.md for measured
v5e numbers.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def _train_chunked(state, runner, x, y, steps, chunk):
    """Run `steps` steps in scan-fused chunks; returns (state, wall_s,
    steps_timed, final_loss). The first (compile) chunk is excluded from
    timing, and at least one further chunk is always timed (so short
    --steps runs still measure real device work)."""
    state, losses = runner(state, x, y)
    # value fetch, not block_until_ready: the latter under-syncs through
    # the TPU tunnel and would let compile-chunk work drain into the
    # timed region
    float(losses[-1])
    timed_chunks = max(1, -(-(steps - chunk) // chunk))
    t0 = time.perf_counter()
    for _ in range(timed_chunks):
        state, losses = runner(state, x, y)
    final = float(losses[-1])
    wall = time.perf_counter() - t0
    return state, wall, timed_chunks * chunk, final


def _run_config(cfg, steps, chunk, workload, sim_kwargs, extra_fields):
    """Shared runner: simulate → build → train → record."""
    import gpzoo_tpu as gz
    from gpzoo_tpu.train import (TrainState, make_scan_runner,
                                 make_train_step, negative_elbo)

    key = jax.random.PRNGKey(0)
    coords, counts, _ = gz.data.simulate_nsf_counts(**sim_kwargs)
    x, y = jnp.asarray(coords), jnp.asarray(counts)
    model = cfg.build(key, X=x)
    opt = cfg.optimizer()
    state = TrainState.create(model, opt, key)
    step = make_train_step(negative_elbo, opt, static_kwargs={"E": cfg.E})
    runner = make_scan_runner(step, chunk)
    state, wall, timed, final = _train_chunked(state, runner, x, y,
                                               steps, chunk)
    rec = {"workload": workload, "N": cfg.N, "D": cfg.D, "L": cfg.L,
           "M": cfg.M, "E": cfg.E, "sim_L": sim_kwargs.get("L", 4),
           "steps_timed": timed, "wall_s": wall,
           "steps_per_sec": timed / wall, "final_loss": final}
    rec.update(extra_fields)
    return state, rec


def run_nsf(M, steps, chunk):
    import gpzoo_tpu as gz

    cfg = gz.NSFConfig(D=80, N=800, L=4, M=M)
    return _run_config(cfg, steps, chunk, "nsf",
                       dict(N=800, D=80, L=4), {})


def run_vnngp(M, steps, chunk, N=5000, D=200, L=10, K=8):
    import gpzoo_tpu as gz

    cfg = gz.VNNGPConfig(D=D, N=N, L=L, M=M, K=K)
    # data simulated at sim_L=4 true factors while the model fits L
    # (the nnnsf notebook likewise fits L=10 to data of unknown rank)
    return _run_config(cfg, steps, chunk, "nn-nsf",
                       dict(N=N, D=D, L=4), {"K": K})


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--out", default="/tmp/gpzoo_tpu_sweep",
                   help="output dir for records.json + checkpoints")
    p.add_argument("--m", type=int, nargs="+",
                   default=[100, 250, 500, 1000])
    p.add_argument("--steps", type=int, default=10_000)
    p.add_argument("--chunk", type=int, default=500)
    p.add_argument("--vnngp", action="store_true",
                   help="add the NN-NSF (VNNGP prior) row")
    args = p.parse_args()

    from gpzoo_tpu.train.checkpoint import save_checkpoint

    os.makedirs(args.out, exist_ok=True)
    device = str(jax.devices()[0])
    records = []
    for M in args.m:
        log(f"NSF M={M} ...")
        state, rec = run_nsf(M, args.steps, min(args.chunk, args.steps))
        rec["device"] = device
        log(f"  {rec['steps_per_sec']:.1f} steps/s "
            f"({rec['wall_s']:.1f}s, loss {rec['final_loss']:.3e})")
        name = f"nsf_M{M}"
        save_checkpoint(os.path.join(args.out, f"{name}.ckpt"), state)
        rec["checkpoint"] = f"{name}.ckpt"
        records.append(rec)

    if args.vnngp:
        log("NN-NSF (VNNGP) M=1000 K=8 ...")
        state, rec = run_vnngp(1000, args.steps,
                               min(args.chunk, args.steps))
        rec["device"] = device
        log(f"  {rec['steps_per_sec']:.1f} steps/s "
            f"({rec['wall_s']:.1f}s, loss {rec['final_loss']:.3e})")
        save_checkpoint(os.path.join(args.out, "nnnsf_M1000.ckpt"), state)
        rec["checkpoint"] = "nnnsf_M1000.ckpt"
        records.append(rec)

    path = os.path.join(args.out, "records.json")
    with open(path, "w") as f:
        json.dump(records, f, indent=2)
    print(json.dumps({"records": path, "configs": len(records)}))


if __name__ == "__main__":
    main()
