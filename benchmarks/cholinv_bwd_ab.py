"""A/B: dense vs panel-blocked ``cholesky_inverse_mm`` backward.

Reproduces the docs/PERFORMANCE.md "Panel-blocked VJP, second attempt"
measurement at the MGGP full-scale shape (L=20, M=3010, both output
cotangents). Recorded 2026-08-17 on v5e:

    prec=default: dense 126.7 ms  blocked 129.6 ms  (0.98x)
    prec=highest: dense 270.4 ms  blocked 222.0 ms  (1.22x)

which is why ``train/fast.py`` enables ``bwd_blocked`` only when
``grad_precision`` resolves to "highest" (the small-jitter gate).

    python benchmarks/cholinv_bwd_ab.py [--l 20] [--m 3010]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--l", type=int, default=20)
    p.add_argument("--m", type=int, default=3010)
    p.add_argument("--iters", type=int, default=4)
    args = p.parse_args()

    from gpzoo_tpu.ops.linalg import cholesky_inverse_mm

    L, M = args.l, args.m
    key = jax.random.PRNGKey(0)
    z = jax.random.normal(key, (L, M, 64))
    k = (jnp.einsum("lmi,lni->lmn", z, z) / 64
         + 1.0 * jnp.eye(M)).astype(jnp.float32)
    gl = 0.01 * jnp.ones((L, M, M), jnp.float32)
    gw = 0.01 * jnp.ones((L, M, M), jnp.float32)

    def make(blocked, prec):
        def loss(k_, gl_, gw_):
            l, w = cholesky_inverse_mm(k_, prec, blocked)
            return jnp.vdot(gl_, l) + jnp.vdot(gw_, w)

        return jax.jit(jax.grad(loss))

    def timeit(fn, *a):
        # chained calls + one value fetch: block_until_ready under-syncs
        # through the TPU tunnel (docs/PERFORMANCE.md timing note)
        out = fn(*a)
        np.asarray(jax.device_get(jnp.ravel(out)[0]))
        t0 = time.perf_counter()
        for _ in range(args.iters):
            out = fn(*a)
        np.asarray(jax.device_get(jnp.ravel(out)[0]))
        return (time.perf_counter() - t0) / args.iters * 1e3

    for prec in ("default", "highest"):
        fd, fb = make(False, prec), make(True, prec)
        td, tb = timeit(fd, k, gl, gw), timeit(fb, k, gl, gw)
        gd, gb = fd(k, gl, gw), fb(k, gl, gw)
        rel = float(jnp.max(jnp.abs(gd - gb))
                    / (jnp.max(jnp.abs(gd)) + 1e-30))
        print(f"prec={prec}: dense {td:.1f} ms  blocked {tb:.1f} ms  "
              f"({td / tb:.2f}x)  max-rel-diff {rel:.2e}", flush=True)


if __name__ == "__main__":
    main()
