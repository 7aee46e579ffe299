"""Factor-evolution snapshots during NSF training (reference workflow:
Slideseq_NSF_newest_version.ipynb cells 36-39 — posterior captured every
10 steps, assembled into a training animation).

Here :class:`gpzoo_tpu.train.PosteriorSnapshotter` rides
``make_scan_runner``'s ``on_chunk=`` hook: each 10-step compiled chunk is
followed by one posterior forward on a probe subset of spots, logged to a
MetricLogger and kept as an animation frame. The run writes

* ``nsf_snapshots.npz`` — (T, L, n_probe) frames + step numbers,
* ``nsf_snapshots.png`` — a factors × time grid of the evolving maps
  (if matplotlib is available).

Run: python examples/nsf_snapshot_animation.py [--steps 200]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse

import jax
import jax.numpy as jnp
import numpy as np

import gpzoo_tpu as gz
from gpzoo_tpu.train import (PosteriorSnapshotter, TrainState,
                             make_batched_train_step, make_scan_runner,
                             nsf_negative_elbo_batched)
from gpzoo_tpu.utils import MetricLogger


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=200)
    p.add_argument("--chunk", type=int, default=10,
                   help="steps per snapshot (the reference uses 10)")
    p.add_argument("--out", default="nsf_snapshots")
    args = p.parse_args()
    if args.steps < 1 or args.chunk < 1:
        p.error("--steps and --chunk must be >= 1")

    key = jax.random.PRNGKey(0)
    N, D, L = 1500, 40, 4
    coords, counts, truth = gz.data.simulate_nsf_counts(N=N, D=D, L=L)
    X, Y = jnp.asarray(coords), jnp.asarray(counts)

    model = gz.NSFConfig(D=D, N=N, L=L, M=64).build(key, X=X)
    opt = gz.NSFConfig().optimizer()
    state = TrainState.create(model, opt, key)
    step = make_batched_train_step(
        nsf_negative_elbo_batched, opt, num_points=N, batch_size=256,
        static_kwargs={"E": 3, "microbatch": 256},
    )

    probe = np.random.default_rng(0).choice(N, size=400, replace=False)
    logger = MetricLogger()
    snap = PosteriorSnapshotter(X[probe], every=1, logger=logger)
    chunk = min(args.chunk, args.steps)  # never run extra steps
    runner = make_scan_runner(step, chunk, on_chunk=snap)

    ran = (args.steps // chunk) * chunk  # whole chunks only; be truthful
    for _ in range(args.steps // chunk):
        state, losses = runner(state, X, Y)
    print(f"{len(snap.history)} snapshots over {ran} steps; "
          f"last loss {float(losses[-1]):.3e}")
    print("percentile series:",
          [f"{r['qf_mean_p50']:.2f}" for r in snap.records[:5]], "...")

    out_npz = snap.save(args.out + ".npz")
    print(f"frames -> {out_npz}")

    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
    except ImportError:
        print("matplotlib unavailable; skipping the PNG grid")
        return

    frames = np.stack([m for _, m in snap.history])  # (T, L, n_probe)
    ts = np.linspace(0, len(frames) - 1, min(6, len(frames))).astype(int)
    fig, axes = plt.subplots(L, len(ts), figsize=(2.2 * len(ts), 2 * L),
                             squeeze=False)
    xy = np.asarray(X[probe])
    for row in range(L):
        for col, t in enumerate(ts):
            ax = axes[row][col]
            ax.scatter(xy[:, 0], xy[:, 1], c=frames[t, row], s=4,
                       cmap="viridis")
            ax.set_xticks([]), ax.set_yticks([])
            if row == 0:
                ax.set_title(f"step {snap.history[t][0]}", fontsize=8)
    fig.tight_layout()
    fig.savefig(args.out + ".png", dpi=100)
    print(f"factor-evolution grid -> {args.out}.png")


if __name__ == "__main__":
    main()
