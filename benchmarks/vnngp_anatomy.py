"""VNNGP 100k-spot step anatomy + op-count A/B harness.

The round-3 verdict's VNNGP item: the all-trainable training step is a
*latency-bound chain of small ops* (every component individually times
at the ~4-6 ms dispatch floor; real FLOPs are tiny at M=1000, K=8).
This harness measures, with the tunnel-safe chained-dispatch +
value-fetch method (docs/PERFORMANCE.md):

* the full all-trainable fast step, with both KL forms
  (``kl_form="matmul"`` — blocked-inverse K⁻¹, ~12 ops — vs
  ``kl_form="solve"`` — two triangular solves, minimal op count),
* the frozen-configuration precomputed-conditioning step
  (train/fast_vnngp.py — the whole conditioning geometry hoisted),
* the isolated forward components, to attribute what remains.

Usage:
    python benchmarks/vnngp_anatomy.py                 # full table
    python benchmarks/vnngp_anatomy.py --steps-only
    python benchmarks/vnngp_anatomy.py --quick         # N=10k shapes
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import optax

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from _timing import _fetch, _timeit, copy_model, log  # noqa: E402


#: One source of truth for the VNNGP workload shapes (N, D, L, M, K,
#: batch): this anatomy harness exists to attribute bench.py's
#: run_vnngp_bench step time, so both MUST measure the same shapes —
#: bench.py imports these rather than re-spelling them.
# canonical shapes live in the package (importable without sys.path
# games); re-exported here for back-compat with older harness invocations
from gpzoo_tpu.configs import VNNGP_SHAPES  # noqa: E402


def build(quick=False, seed=0):
    import gpzoo_tpu as gz

    N, D, L, M, K, batch = VNNGP_SHAPES["quick" if quick else "full"]
    rng = np.random.default_rng(seed)
    coords = rng.uniform(-2, 2, size=(N, 2)).astype(np.float32)
    counts_t = rng.poisson(2.0, size=(N, D)).astype(np.float32)
    x, y_t = jnp.asarray(coords), jnp.asarray(counts_t)
    model = gz.VNNGPConfig(D=D, N=N, L=L, M=M, K=K).build(
        jax.random.PRNGKey(seed), X=x)
    return model, x, y_t, dict(N=N, D=D, L=L, M=M, K=K, batch=batch)


def measure_step(model, x, y_t, shp, loss="fast", kl_form="matmul",
                 chunk=30, chunks=2):
    from gpzoo_tpu.train import (TrainState, make_batched_train_step,
                                 make_scan_runner)
    from gpzoo_tpu.train.fast_vnngp import (
        precompute_vnngp_conditioning, vnngp_nsf_negative_elbo_batched,
        vnngp_nsf_negative_elbo_precomputed)

    opt = optax.adam(5e-3)
    state = TrainState.create(model, opt, jax.random.PRNGKey(1))
    if loss == "pre":
        cond = precompute_vnngp_conditioning(model, x)
        step = make_batched_train_step(
            vnngp_nsf_negative_elbo_precomputed, opt,
            num_points=shp["N"], batch_size=shp["batch"],
            static_kwargs={"E": 1, "y_transposed": True},
        )
        args = (cond, y_t)
    else:
        step = make_batched_train_step(
            vnngp_nsf_negative_elbo_batched, opt, num_points=shp["N"],
            batch_size=shp["batch"],
            static_kwargs={"E": 1, "shared_kernel": True,
                           "y_transposed": True, "kl_form": kl_form},
        )
        args = (x, y_t)
    runner = make_scan_runner(step, chunk, donate=True)
    t0 = time.perf_counter()
    state, losses = runner(state, *args)
    _fetch(losses)
    log(f"  compile+warmup: {time.perf_counter()-t0:.1f}s "
        f"loss[-1]={float(losses[-1]):.4e}")
    assert np.all(np.isfinite(np.asarray(losses)))
    times = []
    for c in range(chunks):
        t0 = time.perf_counter()
        state, losses = runner(state, *args)
        _fetch(losses)
        times.append(time.perf_counter() - t0)
    ms = min(times) / chunk * 1e3
    log(f"  step ({loss}, kl={kl_form}): {ms:.2f} ms -> "
        f"{1e3/ms:.1f} steps/s")
    return 1e3 / ms


def measure_components(model, x, y_t, shp):
    """Forward components of the all-trainable step, isolated."""
    from gpzoo_tpu.gps.vnngp import gather_blocks
    from gpzoo_tpu.ops.linalg import (add_jitter,
                                      spd_inverse_from_cholesky)
    from gpzoo_tpu.bijectors import lower_cholesky
    from gpzoo_tpu.train.fast import _collapse_shared_kernel

    gp = model.prior
    kernel = _collapse_shared_kernel(gp.kernel)
    b = shp["batch"]
    xb = x[:b]
    rows = []

    def add(name, fn, *args, **kw):
        ms = _timeit(fn, *args, **kw)
        rows.append((name, ms))
        log(f"  {name}: {ms:.2f} ms")

    add("Kzz gram + chol (M,M)",
        lambda z: jnp.linalg.cholesky(
            add_jitter(kernel.gram(z, z), gp.jitter)), gp.Z)
    add("cross-gram + distance (B,M)",
        lambda xq, z: kernel.gram_and_distance(xq, z), xb, gp.Z)

    def topk(xq, z):
        _, d = kernel.gram_and_distance(xq, z)
        return jax.lax.top_k(-d, gp.K)

    add("  + top-K", topk, xb, gp.Z)

    def cond_chain(xq, z, lu_raw):
        kzz = add_jitter(kernel.gram(z, z), gp.jitter)
        kxz, d = kernel.gram_and_distance(xq, z)
        _, idx = jax.lax.top_k(-d, gp.K)
        lu = lower_cholesky(lu_raw)
        s = jnp.einsum("...ij,...kj->...ik", lu, lu)
        lk = gather_blocks(kzz, idx)
        ls = gather_blocks(s, idx)
        return lk, ls

    add("gathers (S + blocks)", cond_chain, xb, gp.Z, gp.Lu_raw)
    add("full GP forward qf", lambda xq: gp(xq)[0].loc, xb)
    add("K-inv (blocked tri_inverse)",
        lambda z: spd_inverse_from_cholesky(jnp.linalg.cholesky(
            add_jitter(kernel.gram(z, z), gp.jitter))), gp.Z)

    def kl_solve(z, lu_raw):
        lzz = jnp.linalg.cholesky(add_jitter(kernel.gram(z, z),
                                             gp.jitter))
        lu = lower_cholesky(lu_raw)
        a = jax.scipy.linalg.solve_triangular(lzz, lu, lower=True)
        return jnp.sum(jnp.square(a))

    add("KL trace via one solve", kl_solve, gp.Z, gp.Lu_raw)
    return rows


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--quick", action="store_true")
    p.add_argument("--steps-only", action="store_true")
    p.add_argument("--components-only", action="store_true")
    p.add_argument("--chunk", type=int, default=30)
    p.add_argument("--chunks", type=int, default=2)
    args = p.parse_args(argv)

    model, x, y_t, shp = build(args.quick)
    log(f"VNNGP anatomy: {shp} backend={jax.default_backend()}")
    if not args.components_only:
        for loss, kl in (("fast", "matmul"), ("fast", "solve"),
                         ("pre", "-")):
            log(f"-- loss={loss} kl_form={kl} --")
            # fresh buffers per leg: the scan runner donates the state,
            # which shares the model's device arrays
            measure_step(copy_model(model), x, y_t, shp, loss=loss,
                         kl_form=kl if kl != "-" else "matmul",
                         chunk=args.chunk, chunks=args.chunks)
    if not args.steps_only:
        log("-- forward components (isolated, chained timing) --")
        measure_components(model, x, y_t, shp)
    return 0


if __name__ == "__main__":
    sys.exit(main())
