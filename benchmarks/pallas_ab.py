"""On-device Pallas kernel verification + A/B timing harness.

CI runs the Pallas kernels in interpret mode only (tests/conftest.py pins
JAX_PLATFORMS=cpu), so a Mosaic-compilation regression would ship green.
This script closes that hole: run it on real TPU hardware to

  1. verify every Pallas kernel (values AND gradients) against its plain
     XLA oracle in the Mosaic-compiled path, and
  2. re-measure the Gram A/B table that decides
     ``gpzoo_tpu.ops.gram_pallas.ENABLED`` (docs/PERFORMANCE.md records
     prose numbers; this is the committed reproduction).

Usage:
    python benchmarks/pallas_ab.py            # verify + timing table
    python benchmarks/pallas_ab.py --no-time  # verification only
    python bench.py --verify                  # same, via the bench CLI

On a non-TPU backend the verification still runs (interpret mode, with a
warning) and timing is skipped. Exit code is nonzero on any mismatch.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def _on_tpu():
    return jax.default_backend() in ("tpu", "axon")


def _fetch(out):
    """Force completion by fetching a scalar — block_until_ready alone
    under-syncs through the TPU tunnel (docs/PERFORMANCE.md note)."""
    leaf = jax.tree_util.tree_leaves(out)[0]
    np.asarray(jax.device_get(jnp.ravel(leaf)[0]))


def _timeit(fn, *args, iters=20, warmup=2):
    """Mean ms/call: chained dispatch, terminal value fetch. The device
    serializes the chained calls, so elapsed/iters is per-call time."""
    jfn = jax.jit(fn)
    _fetch(jfn(*args))  # compile
    for _ in range(warmup):
        out = jfn(*args)
    _fetch(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = jfn(*args)
    _fetch(out)
    return (time.perf_counter() - t0) / iters * 1e3


def _max_rel(a, b):
    """Max error scaled by the oracle's max magnitude. (Per-element
    relative error is meaningless on exp(−large) Gram tails.)"""
    a, b = np.asarray(a), np.asarray(b)
    return float(np.max(np.abs(a - b)) / (np.max(np.abs(b)) + 1e-30))


def _check(name, pallas_fn, oracle_fn, args, tol, failures):
    """Compare values and full gradient tuples of two array-(or tuple-)
    valued closures, via a random-cotangent scalar loss Σ gᵢ⊙outᵢ."""
    out_p = jax.jit(pallas_fn)(*args)
    out_x = jax.jit(oracle_fn)(*args)
    outs_p = out_p if isinstance(out_p, tuple) else (out_p,)
    outs_x = out_x if isinstance(out_x, tuple) else (out_x,)
    rel_v = max(_max_rel(p, x) for p, x in zip(outs_p, outs_x))

    gs = tuple(
        jax.random.normal(jax.random.PRNGKey(11 + i), jnp.shape(o),
                          dtype=jnp.result_type(o))
        for i, o in enumerate(outs_p)
    )

    def loss(fn):
        def inner(*a):
            o = fn(*a)
            o = o if isinstance(o, tuple) else (o,)
            return sum(jnp.sum(gi * oi) for gi, oi in zip(gs, o))
        return inner

    grads_p = jax.jit(jax.grad(loss(pallas_fn), argnums=range(len(args))))(
        *args)
    grads_x = jax.jit(jax.grad(loss(oracle_fn), argnums=range(len(args))))(
        *args)
    rel_g = max(_max_rel(p, x) for p, x in zip(grads_p, grads_x))

    ok = rel_v <= tol and rel_g <= tol
    status = "PASS" if ok else "FAIL"
    log(f"  [{status}] {name:32s} value rel={rel_v:.2e} grad rel={rel_g:.2e}"
        f" (tol {tol:.0e})")
    if not ok:
        failures.append(name)


# ---------------------------------------------------------------------------
# Oracles (plain XLA expressions of the same math)
# ---------------------------------------------------------------------------

def _rbf_oracle(x, z, sigma, ell):
    from gpzoo_tpu.ops.distance import squared_dist

    return (jnp.square(sigma)[:, None, None]
            * jnp.exp(-0.5 * squared_dist(x, z)
                      / jnp.square(ell)[:, None, None]))


def verify(failures, interpret):
    from gpzoo_tpu.ops import gram_pallas, vnngp_pallas

    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 8)

    # --- RBF Gram ---------------------------------------------------------
    n, m, d, L = 512, 384, 2, 5
    x = jax.random.normal(ks[0], (n, d))
    z = jax.random.normal(ks[1], (m, d))
    sigma = jnp.exp(jax.random.normal(ks[2], (L,)) * 0.2)
    ell = jnp.exp(jax.random.normal(ks[3], (L,)) * 0.2)
    _check(
        "gram_pallas.rbf_gram",
        lambda *a: gram_pallas.rbf_gram(*a, interpret),
        _rbf_oracle, (x, z, sigma, ell), 5e-5, failures,
    )

    # --- MGGP Gram --------------------------------------------------------
    de = 3
    ex = jax.random.normal(ks[4], (n, de))
    ez = jax.random.normal(ks[5], (m, de))
    alpha = jnp.exp(jax.random.normal(ks[6], (L,)) * 0.3)
    _check(
        "gram_pallas.mggp_gram",
        lambda *a: gram_pallas.mggp_gram(*a, 2, interpret),
        lambda *a: gram_pallas._mggp_gram_xla(*a, input_dim=2),
        (x, z, ex, ez, sigma, ell, alpha), 5e-5, failures,
    )

    # --- VNNGP block conditioning ------------------------------------------
    npts, k = 4096, 8
    r = jax.random.normal(ks[7], (npts, k, k)) * 0.3
    kzz = jnp.einsum("nij,nkj->nik", r, r) + jnp.eye(k)
    rs = jax.random.normal(jax.random.PRNGKey(42), (npts, k, k)) * 0.3
    s = jnp.einsum("nij,nkj->nik", rs, rs) + 0.5 * jnp.eye(k)
    kxz = jax.random.normal(jax.random.PRNGKey(43), (npts, k))
    mu = jax.random.normal(jax.random.PRNGKey(44), (npts, k))
    kxx = jnp.exp(jax.random.normal(jax.random.PRNGKey(45), (npts,)))
    jitter = 1e-2
    _check(
        "vnngp_pallas.block_conditional",
        lambda *a: vnngp_pallas.block_conditional(*a, jitter, interpret),
        lambda *a: vnngp_pallas._xla_reference(*a, jitter=jitter),
        (kzz, s, kxz, mu, kxx), 2e-4, failures,
    )

    # --- triangular contraction -------------------------------------------
    from gpzoo_tpu.ops import tri_blocked, tri_pallas

    Lb, mm, bb = 4, 700, 640
    lu = jnp.tril(jax.random.normal(jax.random.PRNGKey(50), (Lb, mm, mm)))
    a = jax.random.normal(jax.random.PRNGKey(51), (mm, bb))
    # bf16 MXU tiles: oracle rounds operands to bf16 and tril-masks lu so
    # its autodiff gradient matches the kernel's tril gradient contract
    # (see tri_pallas.tri_t_matmul docstring).
    bf = lambda x: x.astype(jnp.bfloat16).astype(jnp.float32)
    # explicit tiles: blocks must not exceed the array dims (the
    # production dispatch gates m ≥ 2·TM, b ≥ TB for the same reason)
    _check(
        "tri_pallas.tri_t_matmul",
        lambda l_, a_: tri_pallas.tri_t_matmul(l_, a_, interpret,
                                               256, 256, 256),
        lambda l_, a_: jnp.einsum(
            "lkm,kb->lmb", jnp.tril(bf(l_)), bf(a_),
            precision=jax.lax.Precision.HIGHEST),
        (lu, a), 5e-3, failures,
    )
    # tril on the lu input of BOTH sides: the blocked forms never read
    # the structural-zero entries (their grad is zero by construction),
    # matching autodiff through the lower_cholesky bijector; the dense
    # oracle needs the explicit tril for its grads to carry the same mask.
    _check(
        "tri_blocked.tri_sq_colsum",
        lambda l_, a_: tri_blocked.tri_sq_colsum(jnp.tril(l_), a_,
                                                 panels=4),
        lambda l_, a_: jnp.sum(jnp.square(
            jnp.einsum("lkm,kb->lmb", jnp.tril(l_), a_)), axis=-2),
        (lu, a), 5e-5, failures,
    )
    kinv_r = jax.random.normal(jax.random.PRNGKey(52), (mm, mm)) * 0.1
    kinv = kinv_r @ kinv_r.T + jnp.eye(mm)
    _check(
        "tri_blocked.tri_kl_trace",
        lambda k_, l_: tri_blocked.tri_kl_trace(k_, jnp.tril(l_),
                                                panels=4),
        lambda k_, l_: jnp.einsum("ij,ljk,lik->l", k_, jnp.tril(l_),
                                  jnp.tril(l_)),
        (kinv, lu), 5e-5, failures,
    )
    # fused c² kernel: bf16 forward vs a bf16 oracle; grads ride the
    # blocked-XLA VJP (tril contract on both sides)
    _check(
        "tri_pallas.tri_sq_colsum_fused",
        lambda l_, a_: tri_pallas.tri_sq_colsum_fused(
            jnp.tril(l_), a_, interpret, 256, 256, 256),
        lambda l_, a_: jnp.sum(jnp.square(jnp.einsum(
            "lkm,kb->lmb", jnp.tril(bf(l_)), bf(a_),
            precision=jax.lax.Precision.HIGHEST)), axis=-2),
        (lu, a), 2e-2, failures,
    )
    _check(
        "tri_blocked.tri_matmul",
        lambda l_, a_: tri_blocked.tri_matmul(jnp.tril(l_), a_, panels=4),
        lambda l_, a_: jnp.einsum("lik,kb->lib", jnp.tril(l_), a_),
        (lu, a), 5e-5, failures,
    )
    _check(
        "tri_blocked.tri_tri_matmul",
        lambda w_, l_: tri_blocked.tri_tri_matmul(jnp.tril(w_),
                                                  jnp.tril(l_), panels=4),
        lambda w_, l_: jnp.tril(jnp.einsum("lik,lkj->lij", jnp.tril(w_),
                                           jnp.tril(l_))),
        (lu * 0.1, lu), 5e-5, failures,
    )


# ---------------------------------------------------------------------------
# Timing A/B (TPU only)
# ---------------------------------------------------------------------------

def time_ab():
    from gpzoo_tpu.ops import gram_pallas, vnngp_pallas

    rows = []
    # North-star Gram shape + one half-scale point
    for (L, n, m) in [(20, 7000, 3000), (20, 2048, 1024)]:
        x = jax.random.normal(jax.random.PRNGKey(0), (n, 2))
        z = jax.random.normal(jax.random.PRNGKey(1), (m, 2))
        sigma = jnp.ones((L,))
        ell = jnp.ones((L,))
        t_p = _timeit(lambda *a: gram_pallas.rbf_gram(*a, False),
                      x, z, sigma, ell)
        t_x = _timeit(_rbf_oracle, x, z, sigma, ell)
        rows.append(("rbf_gram", f"L={L} N={n} M={m}", t_x, t_p))

        de = 3
        ex = jax.random.normal(jax.random.PRNGKey(2), (n, de))
        ez = jax.random.normal(jax.random.PRNGKey(3), (m, de))
        alpha = jnp.ones((L,))
        t_p = _timeit(lambda *a: gram_pallas.mggp_gram(*a, 2, False),
                      x, z, ex, ez, sigma, ell, alpha)
        t_x = _timeit(
            lambda *a: gram_pallas._mggp_gram_xla(*a, input_dim=2),
            x, z, ex, ez, sigma, ell, alpha)
        rows.append(("mggp_gram", f"L={L} N={n} M={m}", t_x, t_p))

    # VNNGP conditioning at the 100k-spot scale
    npts, k = 102_400, 8
    r = jax.random.normal(jax.random.PRNGKey(4), (npts, k, k)) * 0.3
    kzz = jnp.einsum("nij,nkj->nik", r, r) + jnp.eye(k)
    s = kzz * 0.8 + 0.2 * jnp.eye(k)
    kxz = jax.random.normal(jax.random.PRNGKey(5), (npts, k))
    mu = jax.random.normal(jax.random.PRNGKey(6), (npts, k))
    kxx = jnp.ones((npts,))
    t_p = _timeit(
        lambda *a: vnngp_pallas.block_conditional(*a, 1e-2, False),
        kzz, s, kxz, mu, kxx)
    t_x = _timeit(
        lambda *a: vnngp_pallas._xla_reference(*a, jitter=1e-2),
        kzz, s, kxz, mu, kxx)
    rows.append(("block_conditional", f"N={npts} K={k}", t_x, t_p))

    from gpzoo_tpu.ops import tri_blocked, tri_pallas

    Lb, mm, bb = 20, 3000, 7000
    lu = jnp.tril(
        jax.random.normal(jax.random.PRNGKey(8), (Lb, mm, mm)))
    a = jax.random.normal(jax.random.PRNGKey(9), (mm, bb))
    t_p = _timeit(tri_pallas.tri_t_matmul, lu, a, iters=5)
    t_x = _timeit(lambda l_, a_: jnp.einsum("lkm,kb->lmb", l_, a_),
                  lu, a, iters=5)
    rows.append(("tri_t_matmul", f"L={Lb} M={mm} B={bb}", t_x, t_p))

    # The production triangular path: panel-blocked XLA (vs dense XLA),
    # forward and forward+backward(Lu) of the variance colsum term.
    def sq_dense(l_, a_):
        return jnp.sum(jnp.square(
            jnp.einsum("lkm,kb->lmb", l_, a_)), axis=-2)

    t_b = _timeit(tri_blocked.tri_sq_colsum, lu, a, iters=5)
    t_d = _timeit(sq_dense, lu, a, iters=5)
    rows.append(("tri_sq_colsum fwd", f"L={Lb} M={mm} B={bb}", t_d, t_b))
    g2 = jax.random.normal(jax.random.PRNGKey(10), (Lb, bb))
    t_b = _timeit(jax.grad(
        lambda l_: jnp.sum(g2 * tri_blocked.tri_sq_colsum(l_, a))),
        lu, iters=5)
    t_d = _timeit(jax.grad(
        lambda l_: jnp.sum(g2 * sq_dense(l_, a))), lu, iters=5)
    rows.append(("tri_sq_colsum f+b", f"L={Lb} M={mm} B={bb}", t_d, t_b))

    # Fused c² Pallas kernel (verdict item 4): baseline = the production
    # panel-blocked XLA form; tile variants probe the grid-overhead /
    # VMEM trade (dropping the c out-buffer frees VMEM for a bigger TB).
    t_bx = _timeit(tri_blocked.tri_sq_colsum, lu, a, iters=5)
    for tiles in [(512, 1024), (512, 2048), (768, 1024)]:
        tmk, tb_ = tiles
        try:
            t_f = _timeit(lambda l_, a_: tri_pallas.tri_sq_colsum_fused(
                l_, a_, False, tmk, tmk, tb_), lu, a, iters=5)
        except Exception as e:  # Mosaic compile failure at this tiling
            log(f"  tri_sq_colsum_fused TM={tmk} TB={tb_}: "
                f"compile failed ({type(e).__name__})")
            continue
        rows.append((f"sq_colsum_fused {tmk}/{tb_}",
                     f"L={Lb} M={mm} B={bb}", t_bx, t_f))

    log(f"\n  {'kernel':20s} {'shape':22s} {'base ms':>8s} {'opt ms':>10s}"
        f" {'speedup':>8s}  (base = dense/unblocked XLA, opt = Pallas or"
        f" blocked)")
    for name, shape, t_x, t_p in rows:
        log(f"  {name:20s} {shape:22s} {t_x:8.2f} {t_p:10.2f}"
            f" {t_x / t_p:7.2f}x")
    return rows


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--no-time", action="store_true",
                   help="verification only (skip the timing table)")
    args = p.parse_args(argv)

    on_tpu = _on_tpu()
    interpret = not on_tpu
    log(f"backend: {jax.default_backend()}"
        + ("" if on_tpu else "  (no TPU — interpret-mode verification, "
                             "timing skipped)"))

    failures = []
    log("verifying Pallas kernels vs XLA oracles (values + grads):")
    # HIGHEST so the oracles' distance cross-terms don't run at bf16 —
    # the Pallas forwards compute coordinate differences exactly.
    with jax.default_matmul_precision("highest"):
        verify(failures, interpret)

    if on_tpu and not args.no_time:
        time_ab()

    if failures:
        log(f"\nFAILED: {failures}")
        return 1
    log("\nall Pallas kernels verified" + (" (Mosaic-compiled)" if on_tpu
                                           else " (interpret mode)"))
    return 0


if __name__ == "__main__":
    sys.exit(main())
