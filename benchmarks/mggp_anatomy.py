"""Full-scale MGGP-NSF step anatomy + throughput harness.

The round-2 verdict's top item: the Slideseq MGGP workload
(Slideseq_MGGP_NSF_newest_version.ipynb cells 20-29 — L=20, M=3010
= 215 inducing points x 14 groups, batch 7000, D=4000, N=45000,
*trainable* per-factor MGGP kernels, Z frozen) ran at 1.14 steps/s with
only a one-sentence cost attribution. This harness measures the step and
its components with the tunnel-safe chained-dispatch + value-fetch method
(docs/PERFORMANCE.md: block_until_ready alone under-syncs; the profiler
wedges the tunnel), publishing the anatomy docs/PERFORMANCE.md's MGGP
section cites.

Usage:
    python benchmarks/mggp_anatomy.py            # step + component table
    python benchmarks/mggp_anatomy.py --steps-only
    python benchmarks/mggp_anatomy.py --scale 0.25   # shrunken shapes
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
from _timing import _fetch, _timeit, log  # noqa: E402


def build(scale=1.0, seed=0):
    import gpzoo_tpu as gz
    from gpzoo_tpu.bijectors import lower_cholesky_inverse

    N = int(45_000 * scale)
    D = int(4_000 * scale)
    L = 20
    m_per = max(int(215 * scale), 8)
    groups_n = 14
    batch = int(7_000 * scale)

    rng = np.random.default_rng(seed)
    coords = rng.uniform(-2, 2, size=(N, 2)).astype(np.float32)
    counts_t = rng.poisson(3.0, size=(N, D)).astype(np.float32)
    groups = rng.integers(0, groups_n, size=N)

    cfg = gz.MGGPNSFConfig(D=D, N=N, M_per_group=m_per, n_groups=groups_n,
                           batch_size=batch)
    key = jax.random.PRNGKey(seed)
    model = cfg.build(key, X=coords, groups=groups)
    M = cfg.M
    # identity variational Cholesky init: the randn init overflows exp(F)
    # at this M (docs/PERFORMANCE.md MGGP section)
    model = model.replace(gp=model.gp.replace(
        mu=0.1 * jax.random.normal(jax.random.fold_in(key, 1), (L, M)),
        Lu_raw=lower_cholesky_inverse(
            jnp.broadcast_to(jnp.eye(M), (L, M, M))),
    ))
    x = jnp.asarray(coords)
    y_t = jnp.asarray(counts_t)
    g = jnp.asarray(groups, jnp.int32)
    return cfg, model, x, y_t, g


def measure_step(cfg, model, x, y_t, g, chunk=8, chunks=3,
                 remat="save_proj", grad_precision="default",
                 proj_precision="high", chol_precision=None,
                 deviance=False):
    """Full train step via the production fast path (groups threaded)."""
    from gpzoo_tpu.train import (TrainState, freeze_loss,
                                 make_batched_train_step, make_scan_runner,
                                 partition_optimizer, trainable_mask)
    from gpzoo_tpu.train.fast import nsf_negative_elbo_batched

    mask = trainable_mask(model, lambda p: not p.endswith(".Z"))
    opt = partition_optimizer(cfg.optimizer(), mask)
    state = TrainState.create(model, opt, jax.random.PRNGKey(1))
    holdout = min(2000, cfg.N // 10)
    n_train = cfg.N - holdout
    step = make_batched_train_step(
        freeze_loss(nsf_negative_elbo_batched, mask), opt,
        num_points=n_train, batch_size=cfg.batch_size,
        static_kwargs={"E": cfg.E, "microbatch": cfg.batch_size,
                       "y_transposed": True, "factored": True,
                       "groups": g, "remat": remat,
                       "grad_precision": grad_precision,
                       "proj_precision": proj_precision,
                       "chol_precision": chol_precision},
    )
    runner = make_scan_runner(step, chunk, donate=True)
    t0 = time.perf_counter()
    state, losses = runner(state, x, y_t)
    _fetch(losses)
    log(f"  compile+warmup: {time.perf_counter() - t0:.1f}s "
        f"loss[0]={float(losses[0]):.6e} loss[-1]={float(losses[-1]):.6e}")
    assert np.all(np.isfinite(np.asarray(losses)))
    times = []
    for c in range(chunks):
        t0 = time.perf_counter()
        state, losses = runner(state, x, y_t)
        _fetch(losses)
        times.append(time.perf_counter() - t0)
        log(f"  chunk {c}: loss[-1]={float(losses[-1]):.6e}")
    rate = chunk / min(times)
    log(f"  full step: {min(times) / chunk * 1e3:.1f} ms -> "
        f"{rate:.3f} steps/s")
    if deviance:
        dev = _val_deviance(state.model, x, y_t, g, n_train, cfg.N)
        log(f"  validation Poisson deviance (holdout {holdout}): "
            f"{dev:.4f}")
    return rate


def _val_deviance(model, x, y_t, g, lo, hi):
    """Mean per-entry Poisson deviance of the plug-in posterior rate on
    held-out spots [lo, hi) — the fast-but-wrong guard for precision and
    algebra experiments."""
    import jax
    import jax.numpy as jnp
    from gpzoo_tpu.bijectors import softplus
    from gpzoo_tpu.data.metrics import poisson_deviance
    from gpzoo_tpu.predict import latent_posterior

    @jax.jit
    def dev(model, xv, yv_t, gv, vidx):
        gp = model.gp
        with jax.default_matmul_precision("highest"):
            mean, _ = latent_posterior(gp, xv, groups=gv)
        rate = softplus(model.V_raw[vidx]) * (
            softplus(model.W_raw) @ jnp.exp(mean)
        )
        return poisson_deviance(yv_t.T, rate)

    vidx = jnp.arange(lo, hi)
    return float(dev(model, x[lo:hi], y_t[lo:hi], g[lo:hi], vidx))


def measure_components(cfg, model, x, y_t, g):
    """Time the step's constituent pieces at full scale (W-form path)."""
    from gpzoo_tpu.ops.linalg import (add_jitter, cholesky_inverse_mm,
                                      tri_inverse, tril_logdet)
    from gpzoo_tpu.ops.tri_blocked import (tri_matmul, tri_sq_colsum,
                                           tri_tri_matmul)
    from gpzoo_tpu.bijectors import lower_cholesky

    gp = model.gp
    kernel = gp.kernel
    gz_labels = gp.groupsZ
    B = cfg.batch_size
    L = cfg.L
    M = cfg.M
    rows = []

    def add(name, ms, iters_note=""):
        rows.append((name, ms))
        log(f"  {name:44s} {ms:9.1f} ms {iters_note}")

    # --- hoisted (per-step, batch-independent) pieces ---------------------
    gram = jax.jit(lambda k: add_jitter(k.gram(gp.Z, gp.Z, gz_labels,
                                               gz_labels), gp.jitter))
    add("Kzz gram fwd (L,M,M)", _timeit(gram, kernel))
    kzz = jax.block_until_ready(gram(kernel))

    gcot = (0.01 * jnp.ones((L, M, M)), 0.01 * jnp.ones((L, M, M)))

    def chol_inv(k_):
        with jax.default_matmul_precision("highest"):
            return cholesky_inverse_mm(k_)

    add("cholesky stock jnp (L,M,M)",
        _timeit(lambda k_: jnp.linalg.cholesky(k_), kzz))
    with jax.default_matmul_precision("highest"):
        lzz_c = jax.block_until_ready(
            jax.jit(jnp.linalg.cholesky)(kzz))
        add("tri_inverse (L,M,M)", _timeit(tri_inverse, lzz_c))
    add("cholesky_inverse_mm fwd", _timeit(chol_inv, kzz))
    add("cholesky_inverse_mm fwd+bwd (both cots)",
        _timeit(jax.grad(lambda k_: sum(
            jnp.vdot(gc, o) for gc, o in zip(gcot, chol_inv(k_)))), kzz))

    lu = jax.block_until_ready(jax.jit(lower_cholesky)(gp.Lu_raw))
    with jax.default_matmul_precision("highest"):
        w_inv = jax.block_until_ready(jax.jit(tri_inverse)(lzz_c))
    add("C = W Lu (tri_tri_matmul) fwd",
        _timeit(lambda w_, l_: tri_tri_matmul(w_, l_), w_inv, lu))
    del lzz_c

    # gram fwd+bwd alone (kernel-hyperparameter cotangent)
    add("Kzz gram fwd+bwd", _timeit(jax.grad(
        lambda k_: jnp.sum(gram.__wrapped__(k_) * 1e-6)), kernel))

    # W-form hoisted chain: gram -> (chol, W) -> C, Wmu -> KL
    def hoisted(kern, mu, lu_raw):
        with jax.default_matmul_precision("highest"):
            kzz_ = add_jitter(kern.gram(gp.Z, gp.Z, gz_labels, gz_labels),
                              gp.jitter)
            lzz_, w_ = cholesky_inverse_mm(kzz_)
        lu_ = lower_cholesky(lu_raw)
        mu_l = jnp.broadcast_to(jnp.atleast_2d(mu),
                                (lzz_.shape[0], mu.shape[-1]))
        with jax.default_matmul_precision("highest"):
            c_ = tri_tri_matmul(w_, lu_)
            wmu = jnp.einsum("lij,lj->li", w_, mu_l)
        trace = jnp.sum(jnp.square(c_), axis=(-2, -1))
        maha = jnp.sum(jnp.square(wmu), axis=-1)
        kl = jnp.sum(0.5 * (trace + maha - M)
                     + tril_logdet(lzz_) - tril_logdet(lu_))
        return kl

    add("W-form hoisted chain fwd",
        _timeit(lambda k: hoisted(k, gp.mu, gp.Lu_raw), kernel))
    add("W-form hoisted chain fwd+bwd",
        _timeit(jax.grad(hoisted, argnums=(0, 1, 2)),
                kernel, gp.mu, gp.Lu_raw))

    # --- per-chunk pieces (W-form) ---------------------------------------
    del kzz, gcot  # free (L,M,M) buffers before the (L,M,B) chunk work
    xb = x[:B]
    gb = g[:B]
    add("Kzx gram fwd (L,M,B)",
        _timeit(lambda k: k.gram(gp.Z, xb, gz_labels, gb), kernel))
    kzx = jax.block_until_ready(
        jax.jit(lambda k: k.gram(gp.Z, xb, gz_labels, gb))(kernel))
    with jax.default_matmul_precision("highest"):
        c_wlu = jax.block_until_ready(
            jax.jit(tri_tri_matmul)(w_inv, lu))

    def proj(w_, kzx_, c_):
        with jax.default_matmul_precision("highest"):
            a = tri_matmul(w_, kzx_)
        cov = -jnp.sum(jnp.square(a), axis=-2) + tri_sq_colsum(c_, a)
        return jnp.sum(cov)

    add("W-form chunk projection fwd",
        _timeit(proj, w_inv, kzx, c_wlu))
    # fwd+bwd at full B OOMs *in this harness* (the measurement holds the
    # model/data buffers the production scan has long freed, plus three
    # input cotangents at once); per-chunk cost is linear in B (every
    # product contracts over the spot axis), so measure at B/2 and scale.
    half = kzx[..., : B // 2]
    add("W-form chunk projection fwd+bwd (B/2 x2)",
        2 * _timeit(jax.grad(proj, argnums=(0, 1, 2)), w_inv, half, c_wlu))
    del kzx, half, c_wlu, w_inv

    # --- whole loss -------------------------------------------------------
    from gpzoo_tpu.train.fast import nsf_negative_elbo_batched
    from gpzoo_tpu.train import trainable_mask, freeze_loss

    mask = trainable_mask(model, lambda p: not p.endswith(".Z"))
    loss = freeze_loss(nsf_negative_elbo_batched, mask)
    idx = jnp.arange(B, dtype=jnp.int32)
    key = jax.random.PRNGKey(2)
    kwargs = dict(E=cfg.E, microbatch=B, y_transposed=True,
                  factored=True, remat=True)
    # data arrays must be *arguments*, not closure constants: the remote
    # compile service rejects programs embedding the 720 MB y_t
    # (HTTP 413 length limit exceeded)
    add("loss fwd", _timeit(
        lambda m, x_, y_, g_: loss(m, x_, y_, idx, key, groups=g_,
                                   **kwargs), model, x, y_t, g))
    add("loss fwd+bwd", _timeit(jax.grad(
        lambda m, x_, y_, g_: loss(m, x_, y_, idx, key, groups=g_,
                                   **kwargs), allow_int=True),
        model, x, y_t, g))
    return rows


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--scale", type=float, default=1.0)
    p.add_argument("--steps-only", action="store_true")
    p.add_argument("--components-only", action="store_true")
    p.add_argument("--chunk", type=int, default=8,
                   help="steps per scan-fused timing chunk")
    p.add_argument("--chunks", type=int, default=3,
                   help="timing chunks (min over chunks is reported)")
    p.add_argument("--remat", default="save_proj",
                   help='True | False | save_proj | save_proj_kzx')
    p.add_argument("--grad-precision", default="default",
                   help="comma-separated list to A/B (highest,default)")
    p.add_argument("--proj-precision", default="high",
                   help="comma-separated list to A/B (highest,high,default)")
    p.add_argument("--chol-precision", default="highest",
                   help="comma-separated list to A/B the hoisted "
                        "Cholesky/W VALUE path (highest,high) — the "
                        "round-4 probe of the HIGHEST value path")
    p.add_argument("--deviance", action="store_true")
    args = p.parse_args(argv)

    cfg, model, x, y_t, g = build(args.scale)
    log(f"MGGP-NSF anatomy: N={cfg.N} D={cfg.D} L={cfg.L} M={cfg.M} "
        f"batch={cfg.batch_size} backend={jax.default_backend()} "
        f"remat={args.remat} grad_precision={args.grad_precision}")

    if not args.components_only:
        # Stage the pristine model on HOST: each leg re-uploads a fresh
        # device copy, and HBM never holds two full-scale models at once
        # — the Lu factor alone is ~725 MB, and keeping the original
        # resident alongside a leg's copy RESOURCE_EXHAUSTED the 16 GB
        # chip (2026-08-18 run). The scan runner donates each leg's
        # state, so the host copy is the only pristine one.
        model_host = jax.device_get(model)
        del model
        for gp_setting in args.grad_precision.split(","):
            for pp_setting in args.proj_precision.split(","):
                for cp_setting in args.chol_precision.split(","):
                    log(f"-- grad_precision={gp_setting} "
                        f"proj_precision={pp_setting} "
                        f"chol_precision={cp_setting} --")
                    model_leg = jax.tree_util.tree_map(
                        lambda a: jnp.asarray(a) if hasattr(a, "dtype")
                        else a, model_host)
                    remat = {"True": True, "False": False}.get(
                        args.remat, args.remat)
                    measure_step(cfg, model_leg, x, y_t, g,
                                 chunk=args.chunk,
                                 chunks=args.chunks, remat=remat,
                                 grad_precision=gp_setting,
                                 proj_precision=pp_setting,
                                 chol_precision=cp_setting,
                                 deviance=args.deviance)
    if not args.steps_only:
        if not args.components_only:
            # the scan runner donated the state (the model's buffers are
            # gone) — rebuild for the component table only when it runs
            cfg, model, x, y_t, g = build(args.scale)
        measure_components(cfg, model, x, y_t, g)
    return 0


if __name__ == "__main__":
    sys.exit(main())
