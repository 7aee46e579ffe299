"""Posterior extraction (the reference's prediction workflow).

The reference extracts factors with one full-N GP forward — moved to CPU
to dodge GPU OOM (Slideseq_NSF_newest_version.ipynb cells 32-33). Here the
full-N forward stays on device: chunked over the spot axis to bound
memory, optionally sharded over a mesh, and jitted once.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def latent_posterior(gp, x, groups=None, chunk_size=None, mesh=None):
    """qF (marginal mean/scale) of a GP at all N points, chunked and/or
    sharded.

    gp: any :mod:`gpzoo_tpu.gps` posterior (SVGP/WSVGP/MGGP*/VNNGP);
    x: (N, dim); groups: (N,) labels for MGGP GPs;
    chunk_size: spot-axis block (default: all at once);
    mesh: a ``jax.sharding.Mesh`` with a ``"data"`` axis — the spot axis
    is sharded across it (parameters replicated, XLA partitions the
    Kxx/Kzx/posterior math per shard; the reference moves this forward
    to CPU instead, Slideseq_NSF_newest_version.ipynb cells 32-33).
    ``chunk_size`` is ignored with a mesh: per-device memory is already
    the full working set divided by the device count.

    Returns (mean, scale) as (L, N) or (N,) arrays.
    """
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec

        from gpzoo_tpu.parallel import put_sharded

        if "data" not in mesh.axis_names:
            raise ValueError(f"mesh {mesh.axis_names} has no 'data' axis")
        n = x.shape[0]
        pad = (-n) % mesh.shape["data"]
        # put_sharded (not raw device_put): safe under multi-process
        # meshes with non-addressable devices.
        x_p = put_sharded(
            jnp.pad(x, ((0, pad), (0, 0))),
            NamedSharding(mesh, PartitionSpec("data", None)))
        g_p = (put_sharded(jnp.pad(groups, (0, pad)),
                           NamedSharding(mesh, PartitionSpec("data")))
               if groups is not None else None)
        gp_r = put_sharded(gp, NamedSharding(mesh, PartitionSpec()))
        # GSPMD propagates the spot-axis sharding through the forward;
        # per-device memory is the full working set / n_devices, so the
        # host-side chunking is unnecessary here.
        mean, scale = _sharded_forward(gp_r, x_p, g_p)
        return mean[..., :n], scale[..., :n]

    n = x.shape[0]
    if chunk_size is None or chunk_size >= n:
        qf, _, _ = (gp(x, groups) if groups is not None else gp(x))
        return qf.loc, qf.scale

    pad = (-n) % chunk_size
    x_p = jnp.pad(x, ((0, pad), (0, 0)))
    g_p = jnp.pad(groups, (0, pad)) if groups is not None else None
    nc = (n + pad) // chunk_size

    def one(xc, gc):
        qf, _, _ = (gp(xc, gc) if gc is not None else gp(xc))
        return qf.loc, qf.scale

    xs = x_p.reshape(nc, chunk_size, -1)
    if g_p is not None:
        gs = g_p.reshape(nc, chunk_size)
        means, scales = jax.lax.map(lambda args: one(*args), (xs, gs))
    else:
        means, scales = jax.lax.map(lambda xc: one(xc, None), xs)
    # (nc, ..., chunk) → (..., nc*chunk) → trim padding
    means = jnp.moveaxis(means, 0, -2).reshape(means.shape[1:-1] + (-1,))
    scales = jnp.moveaxis(scales, 0, -2).reshape(scales.shape[1:-1] + (-1,))
    return means[..., :n], scales[..., :n]


@jax.jit
def _sharded_forward(gp, x, groups):
    """Module-level jitted forward so repeated mesh= calls reuse the
    compiled N-sized program instead of retracing per call."""
    return latent_posterior(gp, x, groups)


def extract_factors(model, x, groups=None, chunk_size=None, coords=None):
    """NSF factor extraction + Moran's-I ranking (notebook cells 32-33):
    returns (factors (L, N) = exp(qF.mean), moran_idx, moran_I).
    ``coords`` defaults to ``x`` for the autocorrelation ranking."""
    gp = model.prior if hasattr(model, "prior") else model.gp
    mean, _ = latent_posterior(gp, x, groups=groups, chunk_size=chunk_size)
    factors = np.exp(np.asarray(mean))
    from gpzoo_tpu.data.metrics import dims_autocorr

    ref_coords = np.asarray(x if coords is None else coords)
    idx, morans = dims_autocorr(factors.T, ref_coords)
    return factors, idx, morans
