"""Shared chunked-training protocol for the example scripts.

One canonical copy of the compile-excluded timing loop (previously
duplicated across examples with drifting comments). Examples import it
after inserting their own directory on sys.path; the leading underscore
keeps the module out of any wildcard/package surface.
"""

import time

import jax

from gpzoo_tpu.train import make_scan_runner


def run_chunked(tag, state, step, step_args, steps):
    """Run ``steps`` training steps in scan-fused chunks, timing only the
    post-compile chunks, and print a one-line summary.

    ``step_args`` are the per-step data arguments after the state (e.g.
    ``(X, Y)`` for the batched ELBO, ``(proj, Y)`` for the precomputed
    path). Returns the final TrainState.
    """
    # chunk <= steps // 2: at least one timed chunk follows the untimed
    # compile+warmup chunk, so the printed rate is never 0/0 nonsense
    chunk = max(1, min(50, steps // 2))
    runner = make_scan_runner(step, chunk, donate=True)
    state, losses = runner(state, *step_args)  # compile + warmup (untimed)
    first = float(losses[0])
    loops = steps // chunk - 1
    t0 = time.perf_counter()
    for _ in range(loops):
        state, losses = runner(state, *step_args)
    jax.block_until_ready(losses)
    dt = time.perf_counter() - t0
    rate = (f"{loops * chunk / dt:.1f} steps/s" if loops
            else "n/a (single compile chunk)")
    print(f"{tag}: {(loops + 1) * chunk} steps, loss {first:.4e} -> "
          f"{float(losses[-1]):.4e}, post-compile rate {rate}")
    return state
