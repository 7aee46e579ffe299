"""North-star workflow (reference: Slideseq_NSF_newest_version.ipynb):
Slideseq-V2-scale NSF — L=20 factors, M=3000 inducing points, minibatch
7000, E=1, unnormalized Poisson ELBO, frozen Z — with sharded multi-chip
support, periodic checkpointing, and Moran's-I factor ranking.

With real data: pass --h5ad <file> (requires anndata); otherwise trains on
synthetic counts at identical shapes.

Run: python examples/slideseq_nsf.py [--steps 18000] [--data-parallel]
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
    freeze_loss,
    make_batched_train_step,
    make_scan_runner,
    nsf_negative_elbo_batched,
    partition_optimizer,
    save_checkpoint,
    trainable_mask,
)


def load_data(args):
    if args.h5ad:
        import anndata

        ad = anndata.read_h5ad(args.h5ad)
        rng = np.random.default_rng(0)
        perm = rng.permutation(ad.shape[0])  # pre-shuffle, notebook cell 10
        ad = ad[perm]
        dtr, _ = gz.data.anndata_to_train_val(ad, sz="scanpy")
        return dtr["X"], (dtr["Y"].T * 50.0)  # notebook scales counts x50
    coords = np.random.default_rng(0).uniform(-2, 2, (args.n, 2))
    counts = np.random.default_rng(1).poisson(3.0, (args.d, args.n))
    return coords.astype(np.float32), counts.astype(np.float32)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--h5ad", default=None)
    p.add_argument("--n", type=int, default=45_000)
    p.add_argument("--d", type=int, default=4_000)
    p.add_argument("--steps", type=int, default=18_000)
    p.add_argument("--chunk", type=int, default=100)
    p.add_argument("--checkpoint", default="slideseq_nsf.ckpt")
    p.add_argument("--data-parallel", action="store_true",
                   help="shard the minibatch over all devices")
    args = p.parse_args()

    coords, counts = load_data(args)
    x, y = jnp.asarray(coords), jnp.asarray(counts)
    n, d = x.shape[0], y.shape[0]

    key = jax.random.PRNGKey(0)
    cfg = gz.SlideseqNSFConfig(D=d, N=n, M=min(3000, n),
                               batch_size=min(7000, n), steps=args.steps)
    model = cfg.build(key, x)
    mask = trainable_mask(model, cfg.trainable)
    opt = partition_optimizer(cfg.optimizer(), mask)
    state = TrainState.create(model, opt, key)

    # blockwise fast path (docs/PERFORMANCE.md): the monolithic step needs
    # ~2x one chip's HBM at this scale
    micro = cfg.batch_size // 7 if cfg.batch_size % 7 == 0 else cfg.batch_size
    loss_fn = freeze_loss(nsf_negative_elbo_batched, mask)
    fast_kwargs = {"E": cfg.E, "microbatch": micro, "factored": True,
                   "shared_kernel": True}

    if args.data_parallel:
        from gpzoo_tpu.parallel import (
            data_parallel_mesh,
            make_sharded_batched_train_step,
            replicate,
            shard_columns,
        )

        mesh = data_parallel_mesh()
        state = replicate(mesh, state)
        x_in, y_in = replicate(mesh, x), shard_columns(mesh, y)
        step = make_sharded_batched_train_step(
            loss_fn, opt, num_points=n,
            batch_size=cfg.batch_size, mesh=mesh,
            static_kwargs=fast_kwargs,
        )
    else:
        x_in, y_in = x, y
        step = make_batched_train_step(
            loss_fn, opt, num_points=n,
            batch_size=cfg.batch_size, static_kwargs=fast_kwargs,
        )

    runner = make_scan_runner(step, args.chunk)
    done = 0
    t0 = time.perf_counter()
    while done < args.steps:
        state, losses = runner(state, x_in, y_in)
        jax.block_until_ready(losses)
        done += args.chunk
        rate = args.chunk / max(time.perf_counter() - t0, 1e-9)
        t0 = time.perf_counter()
        print(f"step {done}: loss {float(losses[-1]):.4e} "
              f"({rate:.1f} steps/s)")
        save_checkpoint(args.checkpoint, state)

    # Posterior extraction + Moran's-I ranking (notebook cells 32-33) —
    # full-N forward on-device (sharded when data-parallel).
    qf, _, _ = jax.jit(lambda m, x: m.prior(x))(state.model, x_in)
    factors = np.exp(np.asarray(qf.mean))
    idx, morans = gz.data.dims_autocorr(factors.T, np.asarray(coords))
    print("factors by Moran's I:", np.round(morans, 3))


if __name__ == "__main__":
    main()
