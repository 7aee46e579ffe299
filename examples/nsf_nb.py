"""Negative-binomial NSF on overdispersed counts (beyond-reference).

The reference's heads are Poisson-only, but real transcriptomics counts
are overdispersed (variance > mean). `NSFConfig(likelihood="nb")` /
`models.NBNSF` fit a negative binomial with a trainable per-gene inverse
dispersion r (Poisson is the r -> infinity limit) through the same fast
paths.

This example simulates TRUE negative-binomial counts over a spatial NSF
ground truth (`gz.data.simulate_nb_counts`: counts ~ NB(r_true, rate)),
fits Poisson-NSF and NB-NSF with the same budget, and reports (a)
held-out per-entry log-likelihood under each model's own likelihood,
(b) the recovered dispersion vs the simulation's r_true, (c) Moran's I
of the recovered spatial factors. The per-spot size factor V is frozen
at its init for BOTH fits so the held-out spots (whose V never receives
gradients) are scaled identically under both models — the A/B then
isolates the likelihood, not a size-factor artifact. Expect NB to win
(a) clearly at r_true ~ 2 while (c) stays comparable — the point is
calibrated uncertainty on counts, not a different spatial fit.

Run: python examples/nsf_nb.py [--N 1500 --steps 600 --r-true 2.0]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import argparse

import jax
import jax.numpy as jnp
import numpy as np

import gpzoo_tpu as gz
from _example_timing import run_chunked
from gpzoo_tpu import dists
from gpzoo_tpu.bijectors import softplus
from gpzoo_tpu.train import (TrainState, make_batched_train_step,
                             negative_elbo_batched, partition_optimizer,
                             trainable_mask)


def holdout_ll(model, X, Y, vidx):
    """Mean per-entry held-out log-likelihood under the model's OWN
    likelihood at the plug-in posterior-mean rate."""
    qf, _, _ = model.prior(X[vidx])
    rate = softplus(model.V_raw[vidx]) * model.get_rate(qf.mean)
    yv = Y[:, vidx]
    if hasattr(model, "r_raw"):
        py = dists.NegativeBinomial(softplus(model.r_raw)[:, None], rate)
    else:
        py = dists.Poisson(rate)
    return float(jnp.mean(py.log_prob(yv)))


def main():
    import optax

    p = argparse.ArgumentParser()
    p.add_argument("--N", type=int, default=1500)
    p.add_argument("--D", type=int, default=40)
    p.add_argument("--L", type=int, default=4)
    p.add_argument("--M", type=int, default=128)
    p.add_argument("--steps", type=int, default=600)
    p.add_argument("--batch", type=int, default=256)
    p.add_argument("--r-true", type=float, default=2.0,
                   help="simulation inverse dispersion (smaller = more "
                        "overdispersed; Poisson is the infinite limit)")
    args = p.parse_args()
    if args.steps < 1:
        p.error("--steps must be >= 1")
    n_holdout = args.N // 10
    n_train = args.N - n_holdout
    if args.batch > n_train:
        p.error(f"--batch {args.batch} exceeds the {n_train} training "
                f"spots (N minus the N//10 holdout); lower --batch or "
                f"raise --N")

    key = jax.random.PRNGKey(0)
    coords, counts, _ = gz.data.simulate_nb_counts(
        N=args.N, D=args.D, L=args.L, seed=0, total_count=args.r_true)
    over = counts.var() / counts.mean()
    print(f"simulated NB counts at r_true={args.r_true}: "
          f"var/mean = {over:.1f} (a fixed-rate Poisson would be ~1)")
    X, Y = jnp.asarray(coords), jnp.asarray(counts)
    vidx = jnp.arange(n_train, args.N)

    results = {}
    for tag, lik in (("poisson", "poisson"), ("negative-binomial", "nb")):
        cfg = gz.NSFConfig(D=args.D, N=args.N, L=args.L, M=args.M,
                           likelihood=lik, nb_total_count=15.0, lr=2e-2)
        model = cfg.build(key, X=X)
        # freeze V so held-out spots (never minibatched → V untrained)
        # carry the same scale as training spots under both models
        mask = trainable_mask(model, lambda path: "V_raw" not in path)
        opt = partition_optimizer(optax.adam(cfg.lr), mask)
        state = TrainState.create(model, opt, jax.random.PRNGKey(1))
        step = make_batched_train_step(
            negative_elbo_batched, opt, num_points=n_train,
            batch_size=args.batch, static_kwargs={"E": 3})
        state = run_chunked(tag, state, step, (X, Y), args.steps)
        ll = holdout_ll(state.model, X, Y, vidx)
        results[tag] = ll
        qf, _, _ = state.model.prior(X)
        factors = np.exp(np.asarray(qf.mean))
        _, moran = gz.data.dims_autocorr(factors.T, np.asarray(X))
        extra = ""
        if lik == "nb":
            r_hat = np.asarray(softplus(state.model.r_raw))
            extra = (f", dispersion r_hat median {np.median(r_hat):.2f}"
                     f" (truth {args.r_true}, init 15.0)")
        print(f"{tag}: held-out mean log-lik {ll:.4f}, "
              f"Moran's I {np.round(moran, 3)}{extra}")

    gap = results["negative-binomial"] - results["poisson"]
    print(f"NB - Poisson held-out log-lik gap: {gap:+.4f} per entry "
          f"({'NB wins' if gap > 0 else 'Poisson wins'})")


if __name__ == "__main__":
    main()
