"""Float64 Gram-matrix parity vs the PyTorch reference for every kernel
family (SURVEY.md §2.1)."""

import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")
from parity_utils import import_reference, t2n  # noqa: E402

gpzoo = import_reference()

from gpzoo_tpu import kernels  # noqa: E402

torch.set_default_dtype(torch.float64)


@pytest.fixture
def xz(rng):
    x = rng.standard_normal((13, 2))
    z = rng.standard_normal((9, 2))
    return x, z


def _assert_gram(ours, theirs, rtol=1e-9, atol=1e-12):
    np.testing.assert_allclose(np.asarray(ours), t2n(theirs), rtol=rtol,
                               atol=atol)


def test_rbf(xz):
    x, z = xz
    ref = gpzoo.kernels.RBF(sigma=1.3, lengthscale=0.7).double()
    ours = kernels.RBF(sigma=jnp.asarray(1.3), lengthscale=jnp.asarray(0.7))
    _assert_gram(ours.gram(jnp.asarray(x), jnp.asarray(z)),
                 ref(torch.tensor(x), torch.tensor(z)))
    _assert_gram(ours.diag(jnp.asarray(x)),
                 ref(torch.tensor(x), torch.tensor(x), diag=True))
    g, d = ours.gram_and_distance(jnp.asarray(x), jnp.asarray(z))
    _, dref = ref(torch.tensor(x), torch.tensor(z), return_distance=True)
    np.testing.assert_allclose(np.asarray(d), t2n(dref), rtol=1e-7,
                               atol=1e-9)


def test_nsf_rbf(xz):
    x, z = xz
    L = 4
    ref = gpzoo.kernels.NSF_RBF(sigma=1.1, lengthscale=0.9, L=L).double()
    ours = kernels.NSFRBF(
        sigma=jnp.asarray(t2n(ref.sigma)),
        lengthscale=jnp.asarray(t2n(ref.lengthscale)),
    )
    _assert_gram(ours.gram(jnp.asarray(x), jnp.asarray(z)),
                 ref(torch.tensor(x), torch.tensor(z)))
    _assert_gram(ours.diag(jnp.asarray(x)),
                 ref(torch.tensor(x), torch.tensor(x), diag=True))


def test_batched_rbf_vector_hyperparams(xz):
    x, z = xz
    L = 3
    sig = np.array([1.0, 1.5, 0.7])
    ell = np.array([0.5, 1.0, 2.0])
    ref = gpzoo.kernels.batched_RBF(
        sigma=torch.tensor(sig), lengthscale=torch.tensor(ell)
    ).double()
    ours = kernels.BatchedRBF(sigma=jnp.asarray(sig),
                              lengthscale=jnp.asarray(ell))
    # reference forward(X, Z) vmaps Z outer → transpose gives (L, N, M)
    _assert_gram(ours.gram(jnp.asarray(x), jnp.asarray(z)),
                 ref(torch.tensor(x), torch.tensor(z)))


def test_batched_matern32(xz):
    x, z = xz
    ref = gpzoo.kernels.batched_Matern32(sigma=1.2, lengthscale=0.8).double()
    ours = kernels.Matern32(sigma=jnp.asarray(1.2),
                            lengthscale=jnp.asarray(0.8))
    _assert_gram(ours.gram(jnp.asarray(x), jnp.asarray(z)),
                 ref(torch.tensor(x), torch.tensor(z)), rtol=1e-7)


def test_mggp_rbf(xz, rng):
    x, z = xz
    n_groups = 3
    gx = rng.integers(0, n_groups, x.shape[0])
    gz = rng.integers(0, n_groups, z.shape[0])
    ref = gpzoo.kernels.MGGP_RBF(
        sigma=1.1, lengthscale=0.9, group_diff_param=0.8, n_groups=n_groups
    ).double()
    ours = kernels.MGGPRBF.create(
        sigma=1.1, lengthscale=0.9, group_diff_param=0.8, n_groups=n_groups
    )
    ours = ours.replace(embedding=jnp.asarray(t2n(ref.embedding)))
    _assert_gram(
        ours.gram(jnp.asarray(x), jnp.asarray(z), jnp.asarray(gx),
                  jnp.asarray(gz)),
        ref(torch.tensor(x), torch.tensor(z), torch.tensor(gx),
            torch.tensor(gz)),
        rtol=1e-8,
    )


def test_mggp_nsf_rbf(xz, rng):
    x, z = xz
    n_groups, L = 3, 4
    gx = rng.integers(0, n_groups, x.shape[0])
    gz = rng.integers(0, n_groups, z.shape[0])
    ref = gpzoo.kernels.MGGP_NSF_RBF(
        sigma=1.2, lengthscale=1.1, group_diff_param=0.5,
        n_groups=n_groups, L=L,
    ).double()
    ours = kernels.MGGPNSFRBF.create(
        sigma=1.2, lengthscale=1.1, group_diff_param=0.5,
        n_groups=n_groups, L=L,
    ).replace(embedding=jnp.asarray(t2n(ref.embedding)))
    _assert_gram(
        ours.gram(jnp.asarray(x), jnp.asarray(z), jnp.asarray(gx),
                  jnp.asarray(gz)),
        ref(torch.tensor(x), torch.tensor(z), torch.tensor(gx),
            torch.tensor(gz)),
        rtol=1e-8,
    )


def test_batched_mggp_rbf(xz, rng):
    x, z = xz
    n_groups = 4
    gx = rng.integers(0, n_groups, x.shape[0])
    gz = rng.integers(0, n_groups, z.shape[0])
    ref = gpzoo.kernels.batched_MGGP_RBF(
        sigma=1.0, lengthscale=1.3, group_diff_param=-0.7, n_groups=n_groups
    ).double()
    # input_dim=2 here: the reference's per-pair p = x.shape[-1] = 2.
    ours = kernels.BatchedMGGPRBF.create(
        sigma=1.0, lengthscale=1.3, group_diff_param=-0.7,
        n_groups=n_groups, input_dim=2,
    ).replace(embedding=jnp.asarray(t2n(ref.embedding)))
    _assert_gram(
        ours.gram(jnp.asarray(x), jnp.asarray(z), jnp.asarray(gx),
                  jnp.asarray(gz)),
        ref(torch.tensor(x), torch.tensor(z), torch.tensor(gx),
            torch.tensor(gz)),
        rtol=1e-8,
    )


def test_mds_embedding_parity():
    """Our MDS (ops.embed_distance_matrix) vs the reference's
    _embed_distance_matrix on the complete-graph distances."""
    from gpzoo_tpu.ops import embed_distance_matrix

    n = 5
    d = np.ones((n, n)) - np.eye(n)
    ref = gpzoo.utilities._embed_distance_matrix(torch.tensor(d))
    ours = embed_distance_matrix(jnp.asarray(d))
    # eigh sign/order conventions may differ; compare the reconstructed
    # Gram of embeddings (the quantity the kernels consume via distances).
    ge = t2n(ref) @ t2n(ref).T
    go = np.asarray(ours) @ np.asarray(ours).T
    np.testing.assert_allclose(go, ge, atol=1e-8)
