"""Deep / latent-coordinate GP composition (reference: Coordinates.ipynb,
Deep Coordinates.ipynb): demonstrates that the (qF, qU, pU) contract
composes — a 2-layer deep GP where the first SVGP's sampled output becomes
the second SVGP's input, with both KL terms in the ELBO.

Run: python examples/deep_coordinates.py [--steps 500]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse

import jax
import jax.numpy as jnp
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


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=500)
    args = p.parse_args()

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
