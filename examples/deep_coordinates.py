"""Deep / latent-coordinate GP compositions (reference: Coordinates.ipynb,
Coordinates-checkerboard.ipynb, Deep Coordinates.ipynb): the (qF, qU, pU)
contract composes — a stack of SVGPs where each layer's sampled output
becomes the next layer's input, with every layer's KL in the ELBO.

Variants:
  two          — 2-layer regression stack (Coordinates.ipynb)
  checkerboard — 2-layer + Gram head ``mean = F2ᵀF2`` fit to a log
                 periodic/decaying similarity matrix
                 (Coordinates-checkerboard.ipynb cells 2-18; layer-1 mu
                 warm-started to (sin Z, cos Z, sin Z))
  three        — 3-layer stack fit to the pairwise-distance matrix of a
                 3-D curve (Deep Coordinates.ipynb cells 2-24;
                 L1=2 → L2=3 → L3=D with mu warm-starts per cell 16)

Run: python examples/deep_coordinates.py [--variant two|checkerboard|three]
     [--steps 500]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

import gpzoo_tpu as gz
from gpzoo_tpu import dists
from gpzoo_tpu.train import TrainState, make_train_step


@struct.dataclass
class DeepGP2:
    """Two stacked SVGPs: f2(f1(x)). Custom likelihoods in the reference
    notebooks compose GPs exactly like this — the library's contract is the
    (qF, qU, pU) triple, so stacking is user code, not framework code."""

    gp1: gz.gps.SVGP
    gp2: gz.gps.SVGP
    noise_raw: jnp.ndarray

    def __call__(self, x, key, E=1):
        qf1, qu1, pu1 = self.gp1(x)
        k1, k2 = jax.random.split(key)
        h = qf1.sample(k1, (E,))  # (E, N) latent coordinates
        # vmap the second GP over the E sampled coordinate sets
        qf2, qu2, pu2 = jax.vmap(lambda hh: self.gp2(hh[:, None]))(h)
        f = qf2.sample(k2)
        py = dists.Normal(f, jax.nn.softplus(self.noise_raw))
        return py, (qu1, pu1), (qu2, pu2)


def loss_fn(model, x, y, key, E=3):
    py, (qu1, pu1), (qu2, pu2) = model(x, key, E=E)
    ll = jnp.sum(jnp.mean(py.log_prob(y), axis=0))
    kl1 = jnp.sum(dists.kl_divergence(qu1, pu1))
    kl2 = jnp.mean(jnp.sum(dists.kl_divergence(qu2, pu2), axis=-1))
    return -(ll - kl1 - kl2)


def _seeded_svgp(key, L, M, z, mu, sigma=0.5, lengthscale=1.2,
                 jitter=1e-1, train_z=False):
    """Cell-10/16 init: NSF_RBF(σ=0.5, ℓ=1.2), Lu = 1e-2·I, explicit Z/mu.
    (train_z only matters for which leaves the caller chooses to freeze —
    everything here trains by default in these examples.)"""
    from gpzoo_tpu.bijectors import lower_cholesky_inverse

    kern = gz.kernels.NSFRBF.create(sigma=sigma, lengthscale=lengthscale,
                                    L=L)
    return gz.gps.SVGP(
        kernel=kern, Z=z, mu=mu,
        Lu_raw=lower_cholesky_inverse(
            jnp.broadcast_to(1e-2 * jnp.eye(M), (L, M, M))
        ),
        jitter=jitter,
    )


@struct.dataclass
class CheckerboardGP2:
    """Coordinates-checkerboard.ipynb CustomLikelihood (cell 9): 2-layer
    stack whose head is the latent Gram ``mean = F2ᵀ F2`` matched to an
    (N, N) similarity matrix under Gaussian noise."""

    gp1: gz.gps.SVGP
    gp2: gz.gps.SVGP
    noise_raw: jnp.ndarray

    def __call__(self, x, key, E=1):
        k1, k2, k3 = jax.random.split(key, 3)
        qf1, qu1, pu1 = self.gp1(x)
        x2 = qf1.sample(k1).T  # (N, L1) latent coordinates
        qf2, qu2, pu2 = self.gp2(x2)
        f2 = qf2.sample(k2, (E,))  # (E, L2, N)
        mean = jnp.einsum("...ln,...lm->...nm", f2, f2)  # F2ᵀF2
        py = dists.Normal(mean, jax.nn.softplus(self.noise_raw))
        return py, (qu1, pu1), (qu2, pu2)


@struct.dataclass
class DeepGP3:
    """Deep Coordinates.ipynb DeepGP (cell 14): 3 stacked SVGPs, Gaussian
    observation head directly on F3."""

    gp1: gz.gps.SVGP
    gp2: gz.gps.SVGP
    gp3: gz.gps.SVGP
    noise_raw: jnp.ndarray

    def __call__(self, x, key, E=1):
        k1, k2, k3 = jax.random.split(key, 3)
        qf1, qu1, pu1 = self.gp1(x)
        x2 = qf1.sample(k1).T
        qf2, qu2, pu2 = self.gp2(x2)
        x3 = qf2.sample(k2).T
        qf3, qu3, pu3 = self.gp3(x3)
        f3 = qf3.sample(k3, (E,))  # (E, L3, N)
        py = dists.Normal(f3, jax.nn.softplus(self.noise_raw))
        return py, (qu1, pu1), (qu2, pu2), (qu3, pu3)


def stack_loss(model, x, y, key, E=3):
    """−ELBO with one KL per layer (notebook train cells)."""
    out = model(x, key, E=E)
    py, kl_pairs = out[0], out[1:]
    ll = jnp.sum(jnp.mean(py.log_prob(y), axis=0))
    kl = sum(jnp.sum(dists.kl_divergence(qu, pu)) for qu, pu in kl_pairs)
    return -(ll - kl)


def checkerboard_data(n=400):
    """Cells 2-7: log of a periodic similarity decayed by |t−t'|^1.2."""
    t = np.linspace(0, 2 * np.pi, n)
    e = np.cos(4 * t)[:, None]
    mat = 1.0 - e @ e.T
    mat = mat - mat.min() + 0.1
    dist = np.abs(t[:, None] - t[None, :]) ** 1.2 + 1e-1
    return (jnp.asarray(t[:, None], jnp.float32),
            jnp.asarray(np.log(mat / dist), jnp.float32))


def curve_distance_data(n=400):
    """Deep Coordinates cells 2-12: pairwise distances of a 3-D curve."""
    t = np.linspace(-1.5 * np.pi, 1.5 * np.pi, n)
    pts = np.stack([np.cos(t), np.sin(t) * t, np.sin(4 * t)], axis=1)
    c = np.sqrt(((pts[:, None] - pts[None, :]) ** 2).sum(-1))
    return jnp.asarray(t[:, None], jnp.float32), jnp.asarray(c, jnp.float32)


def build_checkerboard(key, n=400, m=64):
    x, y = checkerboard_data(n)
    idx = jax.random.choice(key, n, (m,), replace=False)
    z = x[idx]
    mu1 = jnp.stack([jnp.sin(z[:, 0]), jnp.cos(z[:, 0]),
                     jnp.sin(z[:, 0])])  # cell 10 warm-start
    gp1 = _seeded_svgp(key, L=3, M=m, z=z, mu=mu1)
    gp2 = _seeded_svgp(key, L=10, M=m, z=mu1.T, mu=jnp.zeros((10, m)))
    model = CheckerboardGP2(gp1=gp1, gp2=gp2, noise_raw=jnp.asarray(0.1))
    return model, x, y


def build_three(key, n=400, m=64):
    x, y = curve_distance_data(n)
    idx = jax.random.choice(key, n, (m,), replace=False)
    z = x[idx]
    mu1 = jnp.stack([jnp.sin(z[:, 0]), jnp.cos(z[:, 0])])  # cell 16
    gp1 = _seeded_svgp(key, L=2, M=m, z=z, mu=mu1)
    mu2 = jnp.stack([jnp.sin(z[:, 0]), jnp.cos(z[:, 0]), jnp.sin(z[:, 0])])
    gp2 = _seeded_svgp(key, L=3, M=m, z=mu1.T, mu=mu2)
    gp3 = _seeded_svgp(key, L=n, M=m, z=mu2.T, mu=y[idx].T)  # L3 = D
    model = DeepGP3(gp1=gp1, gp2=gp2, gp3=gp3, noise_raw=jnp.asarray(0.1))
    return model, x, y


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=500)
    p.add_argument("--variant", choices=("two", "checkerboard", "three"),
                   default="two")
    p.add_argument("--n", type=int, default=400)
    args = p.parse_args()

    import optax

    if args.variant != "two":
        key = jax.random.PRNGKey(0)
        build = (build_checkerboard if args.variant == "checkerboard"
                 else build_three)
        model, x, y = build(key, n=args.n)
        opt = optax.adam(3e-3)
        state = TrainState.create(model, opt, key)
        step = make_train_step(stack_loss, opt, static_kwargs={"E": 3})
        for i in range(args.steps):
            state, loss = step(state, x, y)
            if i % max(1, args.steps // 10) == 0:
                print(f"step {i}: loss {float(loss):.1f}")
        print(f"final loss: {float(loss):.1f}")
        return

    key = jax.random.PRNGKey(0)
    x_np, y_np = gz.data.simulate_1d_regression(n=2000)
    x, y = jnp.asarray(x_np), jnp.asarray(y_np)

    k1, k2 = jax.random.split(key)
    kern1 = gz.kernels.RBF(sigma=jnp.asarray(1.0),
                           lengthscale=jnp.asarray(2.0))
    kern2 = gz.kernels.RBF(sigma=jnp.asarray(1.0),
                           lengthscale=jnp.asarray(1.0))
    model = DeepGP2(
        gp1=gz.gps.SVGP.create(k1, kern1, dim=1, M=64, jitter=1e-3),
        gp2=gz.gps.SVGP.create(k2, kern2, dim=1, M=64, jitter=1e-3),
        noise_raw=jnp.asarray(0.2),
    )

    import optax

    opt = optax.adam(3e-3)
    state = TrainState.create(model, opt, key)
    step = make_train_step(loss_fn, opt)
    for i in range(args.steps):
        state, loss = step(state, x, y)
        if i % max(1, args.steps // 10) == 0:
            print(f"step {i}: loss {float(loss):.1f}")


if __name__ == "__main__":
    main()
