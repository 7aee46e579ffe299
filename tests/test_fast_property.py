"""Property sweep over the fast-path flag matrix.

`train/fast.py` carries 8+ interacting static knobs (factored,
shared_kernel, groups, whitened, per-factor vs shared mu/Lu,
stable_projection, grad/proj/chol precision, remat policies incl. None, microbatch).
Each gate is unit-tested individually in tests/test_fast.py; this sweep
draws ~30 random *combinations* and asserts every one equals the generic
minibatch ELBO (train/elbo.py) in float64 — value AND trainable-leaf
gradients — the SURVEY §4 parity-harness mandate applied to the build's
own fast paths. A gate-interaction regression (e.g. the round-3
shared_kernel × shared-mu KL collapse, commit 15ab5fb) trips here before
a user finds it.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import gpzoo_tpu as gz
from gpzoo_tpu.train import negative_elbo_batched
from gpzoo_tpu.train.elbo import negative_elbo_hybrid_batched
from gpzoo_tpu.train.fast import nsf_negative_elbo_batched

N, D, L, M, B, G = 160, 8, 3, 12, 32, 3


def _build_model(kind, whitened, per_factor, jitter, key):
    if "mggp" in kind:
        kernel = gz.kernels.MGGPNSFRBF.create(
            sigma=1.1, lengthscale=0.9, group_diff_param=0.6,
            n_groups=G, L=L)
        cls = gz.gps.MGGPWSVGP if whitened else gz.gps.MGGPSVGP
        gp = cls.create(key, kernel, dim=2, M=M, jitter=jitter, n_groups=G)
    else:
        kernel = gz.kernels.NSFRBF.create(L=L, sigma=1.1, lengthscale=0.9)
        cls = gz.gps.WSVGP if whitened else gz.gps.SVGP
        gp = cls.create(key, kernel, dim=2, M=M, jitter=jitter)
    if per_factor:
        m_tot = gp.Z.shape[0]
        kmu, klu = jax.random.split(jax.random.fold_in(key, 7))
        gp = gp.replace(
            mu=0.3 * jax.random.normal(kmu, (L, m_tot)),
            Lu_raw=0.3 * jax.random.normal(klu, (L, m_tot, m_tot)),
        )
    if kind.startswith("hybrid"):
        # hybrid head: GP spatial half + mean-field half, T=2 factors
        prior2 = gz.gps.GaussianPrior.create(
            jax.random.fold_in(key, 9), N, L=2, scale_pf=0.3)
        hyb = gz.models.HybridNSF.create(
            jax.random.fold_in(key, 3), gp, prior2, D, N, L=L, T=2)
        if kind.endswith("exact"):
            # draw-free lognormal-mean head (likelihoods.py:182-202)
            hyb = gz.models.HybridNSFExact(
                sf=hyb.sf, cf=hyb.cf, V_raw=hyb.V_raw)
        return hyb
    cls_m = gz.models.MGGPNSF if kind == "mggp" else gz.models.NSF
    model = cls_m.create(jax.random.fold_in(key, 3), gp, D=D, N=N, L=L)
    if kind == "nb":
        # negative-binomial head (beyond-reference): same rate math,
        # per-gene dispersion likelihood — the fast paths dispatch on the
        # r_raw field (tests/test_nb.py holds the focused suite)
        from gpzoo_tpu.bijectors import init_softplus

        model = gz.models.NBNSF(
            prior=model.prior, W_raw=model.W_raw, V_raw=model.V_raw,
            r_raw=jnp.asarray(init_softplus(np.full(D, 4.0)),
                              jnp.float64),
        )
    return model


def _draw_configs(n_cfg, seed=12345):
    """n_cfg deterministic random points of the flag matrix."""
    r = np.random.default_rng(seed)

    def pick(opts):
        return opts[int(r.integers(len(opts)))]

    cfgs = []
    for _ in range(n_cfg):
        cfgs.append(dict(
            kind=pick(["plain", "nb", "mggp", "hybrid", "hybrid-mggp",
                       "hybrid-exact", "hybrid-mggp-exact"]),
            whitened=bool(r.integers(2)),
            per_factor=bool(r.integers(2)),
            jitter=pick([1e-1, 1e-3]),
            factored=bool(r.integers(4) > 0),  # mostly the factored paths
            shared_kernel=bool(r.integers(2)),
            stable_projection=pick([None, True, False]),
            grad_precision=pick([None, "default", "highest"]),
            proj_precision=pick([None, "high", "highest"]),
            chol_precision=pick([None, "high", "highest"]),
            remat=pick([None, True, False, "save_proj", "save_proj_kzx"]),
            microbatch=pick([B, B // 2, B // 4]),
            E=pick([1, 2]),
        ))
    return cfgs


@pytest.mark.parametrize("cfg", _draw_configs(30),
                         ids=lambda c: "-".join(
                             f"{k}={v}" for k, v in c.items()))
def test_random_flag_combination_matches_generic(cfg, rng):
    coords = rng.uniform(-2, 2, (N, 2))
    counts = rng.poisson(3.0, (D, N)).astype(np.float64)
    x, y = jnp.asarray(coords), jnp.asarray(counts)
    groups = jnp.asarray(rng.integers(0, G, N)) \
        if "mggp" in cfg["kind"] else None
    key = jax.random.PRNGKey(11)
    model = _build_model(cfg["kind"], cfg["whitened"], cfg["per_factor"],
                         cfg["jitter"], jax.random.PRNGKey(5))
    idx = jax.random.choice(jax.random.PRNGKey(2), N, (B,), replace=False)

    gen_kw = {"groups_x": groups} if groups is not None else {}
    generic = (negative_elbo_hybrid_batched
               if cfg["kind"].startswith("hybrid")
               else negative_elbo_batched)

    def ref_loss(m):
        return generic(m, x, y, idx, key, E=cfg["E"], **gen_kw)

    def fast_loss(m):
        return nsf_negative_elbo_batched(
            m, x, y, idx, key, E=cfg["E"],
            microbatch=cfg["microbatch"], factored=cfg["factored"],
            shared_kernel=cfg["shared_kernel"], groups=groups,
            stable_projection=cfg["stable_projection"],
            grad_precision=cfg["grad_precision"],
            proj_precision=cfg["proj_precision"],
            chol_precision=cfg["chol_precision"], remat=cfg["remat"])

    ref_v, ref_g = jax.value_and_grad(ref_loss, allow_int=True)(model)
    v, g = jax.value_and_grad(fast_loss, allow_int=True)(model)
    assert float(v) == pytest.approx(float(ref_v), rel=1e-8), cfg

    for (path, a), b in zip(jax.tree_util.tree_leaves_with_path(ref_g),
                            jax.tree_util.tree_leaves(g)):
        a = np.asarray(a)
        if a.dtype.kind != "f":  # float0 grads of int leaves (groupsZ)
            continue
        is_kernel_leaf = any(
            getattr(k, "name", None) == "kernel" for k in path)
        if cfg["shared_kernel"] and is_kernel_leaf:
            # The Gram collapse routes every factor's hyperparameter
            # gradient through factor 0's entry (the generic path
            # distributes the same total per factor) — the contract is
            # "equal hyperparameters", where only the SUM is meaningful
            # (and production configs freeze the kernel anyway).
            # atol scales with the summands' mass: the sum itself can
            # cancel to ~0 (the MGGP embedding's symmetric distances do
            # exactly this), leaving only float64 accumulation noise of
            # the two algorithmically different paths to compare.
            np.testing.assert_allclose(
                float(np.sum(np.asarray(b))), float(np.sum(a)),
                rtol=1e-6,
                atol=1e-9 * max(float(np.sum(np.abs(a))), 1.0),
                err_msg=f"{path} (summed) under {cfg}")
            continue
        np.testing.assert_allclose(
            np.asarray(b), a, rtol=1e-6,
            atol=1e-9 * max(float(np.max(np.abs(a))), 1.0),
            err_msg=f"{path} under {cfg}")


@pytest.mark.parametrize("per_factor", [False, True])
@pytest.mark.parametrize("shared_kernel", [False, True])
@pytest.mark.parametrize("E", [1, 2])
def test_vnngp_flag_grid_matches_generic(rng, per_factor, shared_kernel, E):
    """Full small grid for the VNNGP fast loss — incl. the degenerate
    shared-mu layout (the VNNGPConfig default and the 100k bench
    configuration). Regression: under shared_kernel=True the collapsed
    marginal used to lose the factor axis — one shared noise draw
    broadcast over all L factors and the KL counted once instead of L
    times (silently at E=1, a shape error at E>1) — so the round-3
    VNNGP bench trained a mis-specified objective."""
    from gpzoo_tpu.train.fast import vnngp_nsf_negative_elbo_batched

    K = 4
    coords = rng.uniform(-2, 2, (N, 2))
    counts = rng.poisson(3.0, (D, N)).astype(np.float64)
    x, y = jnp.asarray(coords), jnp.asarray(counts)
    key = jax.random.PRNGKey(13)
    model = gz.VNNGPConfig(D=D, N=N, L=L, M=M, K=K).build(
        jax.random.PRNGKey(5), X=x)
    if per_factor:
        gp = model.prior
        gp = gp.replace(
            mu=0.3 * jax.random.normal(jax.random.PRNGKey(6), (L, M)),
            Lu_raw=0.3 * jax.random.normal(jax.random.PRNGKey(7),
                                           (L, M, M)))
        model = gz.models.NSF.create(jax.random.PRNGKey(8), gp,
                                     D=D, N=N, L=L)
    idx = jax.random.choice(jax.random.PRNGKey(2), N, (B,), replace=False)

    def ref_loss(m):
        return negative_elbo_batched(m, x, y, idx, key, E=E)

    def fast_loss(m):
        return vnngp_nsf_negative_elbo_batched(
            m, x, y, idx, key, E=E, shared_kernel=shared_kernel)

    ref_v, ref_g = jax.value_and_grad(ref_loss)(model)
    v, g = jax.value_and_grad(fast_loss)(model)
    assert float(v) == pytest.approx(float(ref_v), rel=1e-9)
    for (path, a), b in zip(jax.tree_util.tree_leaves_with_path(ref_g),
                            jax.tree_util.tree_leaves(g)):
        a = np.asarray(a)
        if a.dtype.kind != "f":
            continue
        is_kernel_leaf = any(
            getattr(k, "name", None) == "kernel" for k in path)
        if shared_kernel and is_kernel_leaf:
            np.testing.assert_allclose(
                float(np.sum(np.asarray(b))), float(np.sum(a)),
                rtol=1e-6, atol=1e-9, err_msg=f"{path} (summed)")
            continue
        np.testing.assert_allclose(
            np.asarray(b), a, rtol=1e-6,
            atol=1e-9 * max(float(np.max(np.abs(a))), 1.0),
            err_msg=str(path))
