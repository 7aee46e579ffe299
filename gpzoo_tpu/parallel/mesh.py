"""Device-mesh construction helpers.

The reference is single-process single-device (SURVEY.md §2.7); scaling
here is the TPU-native design: a :class:`jax.sharding.Mesh` over the chips
of a slice, with the spot (N) axis of each minibatch data-parallel over the
``"data"`` axis and, optionally, the latent-factor (L) axis of the batched
Choleskys model-parallel over a ``"factor"`` axis. Collectives are inserted
by XLA's SPMD partitioner and ride ICI.
"""

from __future__ import annotations

import numpy as np
import jax
from jax.sharding import Mesh


def create_mesh(axis_sizes: dict, devices=None) -> Mesh:
    """Mesh from ``{"axis": size, ...}``; sizes must multiply to the device
    count (one size may be -1 to infer)."""
    devices = list(jax.devices()) if devices is None else list(devices)
    names = tuple(axis_sizes.keys())
    sizes = list(axis_sizes.values())
    if -1 in sizes:
        known = int(np.prod([s for s in sizes if s != -1]))
        sizes[sizes.index(-1)] = len(devices) // known
    total = int(np.prod(sizes))
    if total != len(devices):
        raise ValueError(
            f"mesh {dict(zip(names, sizes))} needs {total} devices, "
            f"have {len(devices)}"
        )
    arr = np.array(devices).reshape(sizes)
    return Mesh(arr, names)


def data_parallel_mesh(devices=None) -> Mesh:
    """1-D mesh over all (or given) devices with axis ``"data"`` — the
    default layout for minibatch-sharded NSF training."""
    devices = list(jax.devices()) if devices is None else list(devices)
    return Mesh(np.array(devices), ("data",))


def hybrid_mesh(dcn_axis_sizes: dict, ici_axis_sizes: dict,
                devices=None) -> Mesh:
    """DCN-aware mesh for multi-host slices: the leading (DCN) axes span
    hosts, the trailing (ICI) axes span each host's local chips, so
    collectives over the ICI axes ride intra-slice links and only the DCN
    axes cross the data-center network.

    Devices are ordered ``(process_index, id)`` and reshaped to
    ``dcn_sizes + ici_sizes`` — each contiguous ICI block is one host's
    chips. Sizes may use -1 (inferred) in at most one axis overall. On a
    single host this degrades gracefully to :func:`create_mesh` semantics
    (any grouping of local devices is ICI).
    """
    devices = list(jax.devices()) if devices is None else list(devices)
    devices.sort(key=lambda d: (getattr(d, "process_index", 0),
                                getattr(d, "id", 0)))
    merged = {**dcn_axis_sizes, **ici_axis_sizes}
    if len(merged) != len(dcn_axis_sizes) + len(ici_axis_sizes):
        raise ValueError("dcn and ici axis names must be disjoint")
    return create_mesh(merged, devices=devices)


def initialize_distributed(**kwargs):
    """Multi-host bring-up: ``jax.distributed.initialize`` passthrough.

    On a TPU pod slice the coordinator/process env is auto-detected; after
    this, ``jax.devices()`` spans all hosts and the mesh builders above
    lay meshes over the full slice (ICI within a slice, DCN across
    hosts — XLA routes collectives accordingly). Safe to call once per
    process; no-op arguments default to auto-detection.
    """
    import jax.distributed

    jax.distributed.initialize(**kwargs)
