"""Workload configurations.

The reference hard-codes every hyperparameter in notebook cells (SURVEY.md
§5 "Config"); these dataclasses pin the five BASELINE.json workloads as
reproducible configs with ``build(key, ...)`` constructors. Values cite the
notebook cells they come from.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import optax

from gpzoo_tpu import kernels, gps, models
from gpzoo_tpu.bijectors import (init_softplus, lower_cholesky_inverse,
                                 softplus_inverse)


def _apply_likelihood(model, likelihood, nb_total_count, D):
    """Swap an NSF head's count likelihood per the config's ``likelihood``
    field: ``"poisson"`` (the reference's only option) or ``"nb"``
    (beyond-reference :class:`gpzoo_tpu.models.NBNSF` — trainable
    per-gene inverse dispersion, Poisson recovered as r → ∞)."""
    if likelihood == "poisson":
        return model
    if likelihood == "nb":
        import numpy as np

        return models.NBNSF(
            prior=model.prior, W_raw=model.W_raw, V_raw=model.V_raw,
            # strong dtype — a weak-typed leaf silently recompiles the
            # training program after the first optimizer update
            r_raw=jnp.asarray(
                init_softplus(np.full(D, float(nb_total_count))),
                dtype=jnp.result_type(float),
            ),
        )
    raise ValueError(
        f"likelihood must be 'poisson' or 'nb', got {likelihood!r}")


@dataclasses.dataclass
class SVGPRegressionConfig:
    """1-D SVGP regression toy (SVGP.ipynb cells 2-9): N=10k 2sin(2x)+ε,
    RBF(σ=1, ℓ=5), M=500, jitter=1e-3, Adam(1e-3), E=20."""

    n: int = 10_000
    M: int = 500
    sigma: float = 1.0
    lengthscale: float = 5.0
    jitter: float = 1e-3
    noise: float = 0.1
    lr: float = 1e-3
    E: int = 20
    steps: int = 200
    whitened: bool = False

    def build(self, key):
        kernel = kernels.RBF(
            # strong dtypes — weak-typed hyperparams recompile the
            # training program after the first update
            sigma=jnp.asarray(self.sigma, dtype=jnp.result_type(float)),
            lengthscale=jnp.asarray(self.lengthscale,
                                    dtype=jnp.result_type(float)),
        )
        cls = gps.WSVGP if self.whitened else gps.SVGP
        gp = cls.create(key, kernel, dim=1, M=self.M, jitter=self.jitter)
        return models.GaussianLikelihood.create(gp, noise=self.noise)

    def optimizer(self):
        return optax.adam(self.lr)


@dataclasses.dataclass
class PNMFConfig:
    """Probabilistic NMF benchmark (PNMF_benchmarks.ipynb cells 8-14):
    L=4, Adam(1e-2), 10k steps, E=20."""

    D: int = 80
    N: int = 1000
    L: int = 4
    lr: float = 1e-2
    E: int = 20
    steps: int = 10_000

    def build(self, key):
        k1, k2 = jax.random.split(key)
        prior = gps.GaussianPrior.create(k1, self.N, L=self.L)
        return models.PNMF.create(k2, prior, self.D, self.N, L=self.L)

    def optimizer(self):
        return optax.adam(self.lr)


@dataclasses.dataclass
class NSFConfig:
    """NSF spatial factorization benchmark (NSF_benchmarks.ipynb cells
    9-21): L=4, M ∈ {100,250,500,1000}, NSF_RBF, jitter=1e-1, Adam(5e-3),
    full batch, E=20."""

    D: int = 80
    N: int = 1000
    L: int = 4
    M: int = 500
    sigma: float = 1.0
    lengthscale: float = 1.0
    jitter: float = 1e-1
    lr: float = 5e-3
    E: int = 20
    steps: int = 10_000
    # "poisson" (the reference's likelihood) or "nb" (beyond-reference
    # negative binomial with trainable per-gene dispersion, init
    # r = nb_total_count)
    likelihood: str = "poisson"
    nb_total_count: float = 10.0

    def build(self, key, X=None):
        k1, k2, k3 = jax.random.split(key, 3)
        kernel = kernels.NSFRBF.create(
            sigma=self.sigma, lengthscale=self.lengthscale, L=self.L
        )
        gp = gps.SVGP.create(k1, kernel, dim=2, M=self.M, jitter=self.jitter)
        if X is not None:
            idx = jax.random.choice(k3, X.shape[0], shape=(self.M,),
                                    replace=self.M > X.shape[0])
            gp = gp.replace(Z=jnp.asarray(X)[idx])
        model = models.NSF.create(k2, gp, self.D, self.N, L=self.L)
        return _apply_likelihood(model, self.likelihood,
                                 self.nb_total_count, self.D)

    def optimizer(self):
        return optax.adam(self.lr)


@dataclasses.dataclass
class MGGPNSFConfig:
    """MGGP-NSF on grouped spatial data
    (Slideseq_MGGP_NSF_newest_version.ipynb cells 20-29): L=20,
    M=215/group, MGGP_NSF_RBF(ℓ=1.5, α=2.0), jitter=1e-1, Adam(1e-3),
    batch 7000, E=1, unnormalized Poisson."""

    D: int = 100
    N: int = 10_000
    L: int = 20
    M_per_group: int = 215
    n_groups: int = 14
    sigma: float = 1.0
    lengthscale: float = 1.5
    group_diff_param: float = 2.0
    jitter: float = 1e-1
    lr: float = 1e-3
    E: int = 1
    batch_size: int = 7000
    steps: int = 11_000

    @property
    def M(self):
        return self.M_per_group * self.n_groups

    def build(self, key, X=None, groups=None):
        k1, k2 = jax.random.split(key)
        kernel = kernels.MGGPNSFRBF.create(
            sigma=self.sigma,
            lengthscale=self.lengthscale,
            group_diff_param=self.group_diff_param,
            n_groups=self.n_groups,
            L=self.L,
        )
        gp = gps.MGGPSVGP.create(
            k1, kernel, dim=2, M=self.M, jitter=self.jitter,
            n_groups=self.n_groups,
        )
        if X is not None and groups is not None:
            # Stratified inducing selection: M_per_group per group
            # (notebook cell 22).
            import numpy as np

            Xn, gn = np.asarray(X), np.asarray(groups)
            zs, gz = [], []
            rng = np.random.default_rng(0)
            for g in range(self.n_groups):
                rows = np.flatnonzero(gn == g)
                take = rng.choice(rows, size=self.M_per_group,
                                  replace=len(rows) < self.M_per_group)
                zs.append(Xn[take])
                gz.append(np.full(self.M_per_group, g))
            gp = gp.replace(
                Z=jnp.asarray(np.concatenate(zs)),
                groupsZ=jnp.asarray(np.concatenate(gz)),
            )
        return models.MGGPNSF.create(k2, gp, self.D, self.N, L=self.L)

    def optimizer(self):
        return optax.adam(self.lr)


@dataclasses.dataclass
class HybridNSFConfig:
    """Hybrid NSF benchmark (NSF_Hybrid_benchmark.ipynb cells 11-23):
    L=4 spatial + T=3 mean-field factors, M=23²=529 grid inducing points
    over [-2,2]², NSF_RBF(σ=1, ℓ=0.1), jitter=1e-3, Lu=1e-2·I,
    cf mean = 0 with scale_pf=1e-1, Adam(1e-3), FULL batch, E=1000,
    10k steps. Reference wall time: 461 s ≈ 21.7 steps/s on GPU
    (cell 23). Trainables per cell 15: σ frozen; cf.W, cf.prior.mean and
    V frozen; ℓ, Z, mu, Lu, sf.W (and cf scale) train."""

    D: int = 80
    N: int = 800
    L: int = 4
    T: int = 3
    M_grid: int = 23
    sigma: float = 1.0
    lengthscale: float = 0.1
    jitter: float = 1e-3
    scale_pf: float = 1e-1
    lr: float = 1e-3
    E: int = 1000
    steps: int = 10_000

    @property
    def M(self):
        return self.M_grid ** 2

    def build(self, key):
        k1, k2, k3 = jax.random.split(key, 3)
        kernel = kernels.NSFRBF.create(
            sigma=self.sigma, lengthscale=self.lengthscale, L=self.L
        )
        gp = gps.SVGP.create(k1, kernel, dim=2, M=self.M,
                             jitter=self.jitter)
        # cell 11: Z = cartesian grid, Lu = 1e-2·I per factor; mu is
        # NMF-warm-started there — the synthetic bench uses a small
        # random mu (per-step cost is shape-determined; quality is
        # guarded by the held-out deviance, not the init).
        side = jnp.linspace(-2.0, 2.0, self.M_grid)
        zx, zy = jnp.meshgrid(side, side, indexing="ij")
        gp = gp.replace(
            Z=jnp.stack([zx.ravel(), zy.ravel()], axis=-1),
            mu=0.1 * jax.random.normal(k3, (self.L, self.M)),
            Lu_raw=lower_cholesky_inverse(jnp.broadcast_to(
                1e-2 * jnp.eye(self.M), (self.L, self.M, self.M))),
        )
        prior2 = gps.GaussianPrior.create(k2, self.N, L=self.T,
                                          scale_pf=self.scale_pf)
        prior2 = prior2.replace(mean=jnp.zeros((self.T, self.N)))
        return models.HybridNSF.create(k1, gp, prior2, self.D, self.N,
                                       L=self.L, T=self.T)

    def trainable(self, path: str) -> bool:
        """cell 15's requires_grad flips."""
        if path.endswith("kernel.sigma"):
            return False
        if path in ("cf.W_raw", "cf.prior.mean", "V_raw"):
            return False
        return True

    def optimizer(self):
        return optax.adam(self.lr)


@dataclasses.dataclass
class SlideseqHybridMGGPConfig:
    """Slideseq-scale Hybrid-MGGP fine-tune
    (Slideseq_MGGP_hybrid_new_version-Copy1.ipynb cells 29-35): the
    PNMF-warm-started composition — L=10 spatial factors on an
    MGGP_SVGP(M=215×14 groups=3010, MGGP_NSF_RBF(σ=1, ℓ=4, α=0.7),
    jitter=1e-2) + T=10 mean-field factors, batch 6000, E=3, all three
    kernel hyperparameters frozen (cell 32), Adam (the notebook ramps
    OneCycleLR to a 1e-3 peak; a flat 1e-3 is used here — at its 1e-4
    base the warm-start-less synthetic loss descends too slowly to
    clear minibatch noise in a short certification window). In production the
    model comes from :func:`gpzoo_tpu.warmstart.hybrid_mggp_from_pnmf`;
    ``build`` constructs the same shapes synthetically."""

    D: int = 4000
    N: int = 45_000
    L: int = 10
    T: int = 10
    M_per_group: int = 215
    n_groups: int = 14
    sigma: float = 1.0
    lengthscale: float = 4.0
    group_diff_param: float = 0.7
    jitter: float = 1e-2
    lr: float = 1e-3
    E: int = 3
    batch_size: int = 6000
    steps: int = 24_000

    @property
    def M(self):
        return self.M_per_group * self.n_groups

    def build(self, key, X, groups):
        import numpy as np

        k1, k2, k3 = jax.random.split(key, 3)
        kernel = kernels.MGGPNSFRBF.create(
            sigma=self.sigma,
            lengthscale=self.lengthscale,
            group_diff_param=self.group_diff_param,
            n_groups=self.n_groups,
            L=self.L,
        )
        # cell 29: uniform (unstratified) inducing subset; mu/Lu come
        # from the PNMF posterior there — identity Lu + small random mu
        # here (same shapes; the warm-start pipeline is warmstart.py).
        Xn, gn = np.asarray(X), np.asarray(groups)
        rng = np.random.default_rng(0)
        take = rng.choice(Xn.shape[0], size=self.M, replace=False)
        gp = gps.MGGPSVGP(
            kernel=kernel,
            Z=jnp.asarray(Xn[take]),
            groupsZ=jnp.asarray(gn[take], jnp.int32),
            mu=0.1 * jax.random.normal(k3, (self.L, self.M)),
            Lu_raw=lower_cholesky_inverse(
                jnp.broadcast_to(jnp.eye(self.M),
                                 (self.L, self.M, self.M))),
            jitter=self.jitter,
        )
        prior2 = gps.GaussianPrior.create(k2, self.N, L=self.T)
        return models.HybridNSF.create(k1, gp, prior2, self.D, self.N,
                                       L=self.L, T=self.T)

    def trainable(self, path: str) -> bool:
        """cell 32: all kernel hyperparameters frozen; Z, mu, Lu, V (and
        the heads' W / mean-field params) train."""
        return ".kernel." not in path

    def optimizer(self):
        return optax.adam(self.lr)


#: Canonical shapes of the VNNGP benchmark legs, shared by bench.py and
#: the step-anatomy harness (benchmarks/vnngp_anatomy.py) — importable so
#: neither mutates sys.path to reach the other, and the tuples can never
#: drift apart. Layout: (N, D, L, M, K, batch).
VNNGP_SHAPES = {
    "quick": (10_000, 50, 10, 250, 8, 1000),
    "full": (100_000, 500, 10, 1000, 8, 5000),
}


@dataclasses.dataclass
class VNNGPConfig:
    """Nearest-neighbor NSF (nnnsf_visium_anim_experiment.ipynb cells
    9-13): NSF2(VNNGP(NSF_RBF(L=10), M=1000, K=8))."""

    D: int = 100
    N: int = 3000
    L: int = 10
    M: int = 1000
    K: int = 8
    sigma: float = 1.0
    lengthscale: float = 1.0
    jitter: float = 1e-1
    lr: float = 5e-3
    E: int = 3
    steps: int = 1000

    def build(self, key, X=None):
        k1, k2, k3 = jax.random.split(key, 3)
        kernel = kernels.NSFRBF.create(
            sigma=self.sigma, lengthscale=self.lengthscale, L=self.L
        )
        gp = gps.VNNGP.create(k1, kernel, dim=2, M=self.M, K=self.K,
                              jitter=self.jitter)
        # Lu = identity, like SlideseqNSFConfig: VNNGP.create's random
        # raw Cholesky exponentiates its diagonal (exp-diag bijector), so
        # at scale the exp(F)-rate blows up and the objective diverges
        # (round-4 verdict item 2). The reference's VNNGP toys converge
        # from comparable near-unit scales (vnngp.ipynb cell 6).
        gp = gp.replace(Lu_raw=lower_cholesky_inverse(jnp.eye(self.M)))
        if X is not None:
            idx = jax.random.choice(k3, X.shape[0], shape=(self.M,),
                                    replace=False)
            gp = gp.replace(Z=jnp.asarray(X)[idx])
        return models.NSF.create(k2, gp, self.D, self.N, L=self.L)

    def optimizer(self):
        return optax.adam(self.lr)


@dataclasses.dataclass
class SlideseqNSFConfig:
    """The north-star workload (Slideseq_NSF_newest_version.ipynb cells
    20-29): ~45k spots, L=20, M=3000, NSF_RBF(σ=1), jitter=1e-1,
    Lu = I, mu ~ N(0,1), Z = data subset (frozen), Adam(2e-3),
    batch 7000, E=1, 18k steps, unnormalized Poisson log-lik."""

    D: int = 4000
    N: int = 45_000
    L: int = 20
    M: int = 3000
    sigma: float = 1.0
    lengthscale: float = 1.0
    jitter: float = 1e-1
    lr: float = 2e-3
    E: int = 1
    batch_size: int = 7000
    steps: int = 18_000
    freeze_z: bool = True
    # cells 25-26: the 18k-step run also freezes the kernel hyperparams —
    # only mu/Lu (and the head's W/V) train.
    freeze_kernel: bool = True
    # rank > 0: beyond-reference low-rank-plus-diagonal variational
    # covariance (gps.LowRankWSVGP) instead of the full (L, M, M)
    # Cholesky — O(M·rank) state, no M×M tensor in the training step.
    # 0 (default) keeps the reference's full parameterization.
    rank: int = 0
    # "poisson" (the reference's likelihood) or "nb" (beyond-reference
    # negative binomial with trainable per-gene dispersion)
    likelihood: str = "poisson"
    nb_total_count: float = 10.0

    def build(self, key, X):
        k1, k2, k3, k4 = jax.random.split(key, 4)
        kernel = kernels.NSFRBF.create(
            sigma=self.sigma, lengthscale=self.lengthscale, L=self.L
        )
        idx = jax.random.choice(k3, X.shape[0], shape=(self.M,),
                                replace=self.M > X.shape[0])
        if self.rank > 0:
            gp = gps.LowRankWSVGP.create(k1, kernel, dim=2, M=self.M,
                                         rank=self.rank, jitter=self.jitter)
            kv = jax.random.fold_in(k1, 7)
            gp = gp.replace(
                Z=jnp.asarray(X)[idx],
                mu=jax.random.normal(k4, (self.L, self.M)),
                # D = I matches the full config's Lu = I start; V must be
                # nonzero (exact 0 is a stationary point in V).
                V=1e-2 * jax.random.normal(kv, (self.L, self.M, self.rank)),
                # full+dtype, not broadcast_to: a weak-typed leaf changes
                # the jit signature after the first update (one wasted
                # recompile of every training program)
                d_raw=jnp.full((self.L, self.M),
                               softplus_inverse(jnp.asarray(1.0)),
                               dtype=jnp.result_type(float)),
            )
        else:
            gp = gps.SVGP.create(k1, kernel, dim=2, M=self.M,
                                 jitter=self.jitter)
            gp = gp.replace(
                Z=jnp.asarray(X)[idx],
                mu=jax.random.normal(k4, (self.L, self.M)),
                # Lu = identity: raw zeros map through exp-diag to I.
                Lu_raw=lower_cholesky_inverse(
                    jnp.broadcast_to(jnp.eye(self.M),
                                     (self.L, self.M, self.M))
                ),
            )
        model = models.NSF.create(k2, gp, self.D, self.N, L=self.L)
        return _apply_likelihood(model, self.likelihood,
                                 self.nb_total_count, self.D)

    def trainable(self, path: str) -> bool:
        """Z and kernel hyperparams frozen, per the notebook's
        requires_grad flips (cells 20, 25-26)."""
        if self.freeze_z and path.endswith(".Z"):
            return False
        if self.freeze_kernel and ".kernel." in path:
            return False
        return True

    def optimizer(self):
        return optax.adam(self.lr)
