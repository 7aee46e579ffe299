"""Checkpoint / deterministic resume — sharding-aware.

The reference checkpoints with notebook-level ``torch.save(state_dict)``
and never saves optimizer state (SURVEY.md §5). Here one artifact holds the
complete resume state — model pytree, optax state, step counter, PRNG key —
so a restored run continues bit-identically (same minibatch indices, same
sample noise).

Sharding contract (round 3):

* **save, single process** (any number of local devices): every shard is
  addressable, so the state gathers to host and serializes to ONE flax
  msgpack file — including TP-sharded TrainStates from
  :func:`gpzoo_tpu.parallel.shard_factor_params`.
* **save, multi process**: ``jax.device_get`` of non-addressable shards
  would crash; instead each process writes ``<path>.shard<p>`` holding the
  unique shards it can address (``replica_id == 0`` de-duplicates
  replicated leaves), and all files together — on a shared filesystem —
  form the checkpoint. A global device barrier orders the writes.
* **restore**: pass ``shardings=`` (the pytree returned by
  ``shard_factor_params`` / ``factor_shardings``, or any pytree of
  ``NamedSharding``/``None`` leaves) to lay the restored state directly
  onto its mesh — values land pre-partitioned, nothing is replicated
  first. Without it the state is restored to host/default-device arrays
  (single-process only).

Round-trip of a factor-sharded TrainState — values to 1e-9 AND restored
shardings — is asserted in tests/test_sharding.py; the 2-process CPU
bring-up test exercises the multi-process shard files.
"""

from __future__ import annotations

import glob
import os
import re
import threading

import jax
import jax.numpy as jnp
import numpy as np
from flax import serialization


def _atomic_write(path, data):
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(data)
    os.replace(tmp, path)


def _slice_key(index, shape):
    """Encode a global-shard index (tuple of slices) as 'a:b,c:d,...'."""
    parts = []
    for s, dim in zip(index, shape):
        start = 0 if s.start is None else int(s.start)
        stop = dim if s.stop is None else int(s.stop)
        parts.append(f"{start}:{stop}")
    return ",".join(parts)


def _parse_slice_key(key):
    if not key:
        return ()
    return tuple(
        slice(int(a), int(b))
        for a, b in (p.split(":") for p in key.split(","))
    )


def _write_single(path, host_state):
    """Serialize a host pytree and atomically write it to ``path``."""
    _atomic_write(path, serialization.to_bytes(host_state))


# One jitted buffer-copy program per pytree-of-shapes: a single device
# dispatch (eager per-leaf copies cost ~0.75 s/op through the TPU
# tunnel), fresh output buffers (no donation → XLA cannot alias them),
# so the snapshot stays valid after the live state's buffers are
# donated into the next training step.
@jax.jit
def _copy_arrays(arrs):
    return [jnp.copy(a) for a in arrs]


def _device_snapshot(state):
    """Device-side copy of every ``jax.Array`` leaf (non-array leaves
    pass through untouched) — the donation-safe snapshot an async save
    hands to its background writer. Cost: one compiled all-buffers copy
    (~ms at the 2 GB production state) plus transient HBM for the copy
    itself, which the writer releases after the device→host transfer."""
    leaves, treedef = jax.tree_util.tree_flatten(state)
    arr_idx = [i for i, leaf in enumerate(leaves)
               if isinstance(leaf, jax.Array)]
    copies = _copy_arrays([leaves[i] for i in arr_idx]) if arr_idx else []
    out = list(leaves)
    for i, c in zip(arr_idx, copies):
        out[i] = c
    return jax.tree_util.tree_unflatten(treedef, out)


class AsyncCheckpointer:
    """Non-blocking :func:`save_checkpoint`.

    ``save(path, state)`` joins any previous in-flight write, snapshots
    the state *on device* (a jitted buffer copy — the only work on the
    step stream), and hands device→host transfer + serialization +
    atomic write to a daemon thread; training proceeds while the bytes
    drain.  The snapshot is taken before returning, so the saved
    checkpoint is exactly the state at the call — donating the live
    state into subsequent steps is safe, and the bit-identical-resume
    contract is unchanged (tests/test_train.py).

    ``wait()`` joins the in-flight write and re-raises any background
    failure — call it before reading the file, at run end, or rely on
    the implicit join at the next ``save``.  A crash mid-write leaves
    only a ``.tmp`` file (same atomicity as the sync save); the previous
    completed checkpoint is untouched.

    Multi-process saves degrade to the synchronous
    :func:`save_checkpoint`: the save-id broadcast and completion
    barrier are collectives, which must issue from the main thread in a
    stable order across processes.
    """

    def __init__(self):
        self._thread = None
        self._exc = None

    def save(self, path, state, _after_write=None, block_snapshot=False):
        self.wait()
        if jax.process_count() > 1:
            save_checkpoint(path, state)
            if _after_write is not None:
                _after_write()
            return path
        snap = _device_snapshot(state)
        if block_snapshot:
            # The snapshot copy is DISPATCHED asynchronously, so the
            # call time alone measures enqueue, not the device copy —
            # which serializes with the next step on the compute stream
            # either way. Measurement code sets this to make save()
            # return only once the snapshot has materialized, i.e. the
            # call time IS the true step-stream stall. (Blocks before
            # the writer thread starts — no race with its eager
            # HBM-free of the snapshot buffers.)
            jax.block_until_ready(snap)

        def work():
            try:
                host = jax.device_get(snap)
                for leaf in jax.tree_util.tree_leaves(snap):
                    if isinstance(leaf, jax.Array):
                        leaf.delete()  # free the HBM copy eagerly
                _write_single(path, host)
                if _after_write is not None:
                    _after_write()
            except BaseException as e:  # surfaced by the next wait()
                self._exc = e

        self._thread = threading.Thread(target=work, daemon=True,
                                        name="gpzoo-ckpt-writer")
        self._thread.start()
        return path

    def wait(self):
        t, self._thread = self._thread, None
        if t is not None:
            t.join()
        if self._exc is not None:
            exc, self._exc = self._exc, None
            raise RuntimeError("async checkpoint write failed") from exc


def save_checkpoint(path, state):
    """Serialize a :class:`gpzoo_tpu.train.loop.TrainState` (or any
    pytree) to ``path``; see the module docstring for the sharding and
    multi-process contract. Returns ``path``. Blocks until the bytes
    are on disk — :class:`AsyncCheckpointer` is the non-blocking form
    (a 2.16 GB production state serializes for ~90 s; synchronous saves
    stall the step stream for all of it)."""
    if jax.process_count() == 1:
        _write_single(path, jax.device_get(state))
        return path

    # Multi-process: persist only the shards this process can address.
    from jax.experimental import multihost_utils

    # One save-id shared by every process's file for THIS save call:
    # restore refuses to mix shard files from different saves (a crash
    # between two processes' atomic replaces leaves step-N and step-N-k
    # files side by side — silently resuming from that mix is corruption
    # in exactly the crash scenario checkpoints exist for).
    save_id = int(multihost_utils.broadcast_one_to_all(
        np.int64(np.random.default_rng().integers(0, 2**62))))
    flat, _ = jax.tree_util.tree_flatten(state)
    local = {"__meta__": {
        "process_index": np.int64(jax.process_index()),
        "process_count": np.int64(jax.process_count()),
        "save_id": np.int64(save_id),
    }}
    for i, leaf in enumerate(flat):
        if isinstance(leaf, jax.Array):
            for sh in leaf.addressable_shards:
                # replica 0 only: exactly one copy of each distinct shard
                # is written across the whole job.
                if sh.replica_id == 0:
                    key = f"{i}|{_slice_key(sh.index, leaf.shape)}"
                    local[key] = np.asarray(sh.data)
        elif jax.process_index() == 0:
            local[f"{i}|"] = np.asarray(leaf)
    shard_path = f"{path}.shard{jax.process_index()}"
    data = serialization.msgpack_serialize(local)
    _atomic_write(shard_path, data)
    # Barrier so no process reports success until every file is on disk.
    multihost_utils.sync_global_devices("gpzoo_ckpt_save")
    return path


def _load_multiprocess(path, template):
    """Reassemble a multi-process checkpoint (``<path>.shard*``) into host
    numpy arrays shaped like ``template``'s leaves."""
    # Match only completed shard files: a crash mid-save can leave a
    # stale ``.shard<p>.tmp`` beside the good previous files, and the
    # ``.shard*`` glob picks it up — filter to exact ``.shard<digits>``.
    indexed = []
    for p in glob.glob(glob.escape(path) + ".shard*"):
        m = re.search(r"\.shard(\d+)$", p)
        if m:
            indexed.append((int(m.group(1)), p))
    files = [p for _, p in sorted(indexed)]
    if not files:
        raise FileNotFoundError(f"no checkpoint at {path}(.shard*)")
    flat, treedef = jax.tree_util.tree_flatten(template)
    out = [None] * len(flat)
    covered = [0] * len(flat)  # elements written per leaf
    metas = []
    for fp in files:
        with open(fp, "rb") as f:
            local = serialization.msgpack_restore(f.read())
        meta = local.pop("__meta__", None)
        if meta is not None:
            metas.append((fp, meta))
        for key, arr in local.items():
            idx_s, slice_s = key.split("|")
            i = int(idx_s)
            tmpl = flat[i]
            sl = _parse_slice_key(slice_s)
            if not sl or all(
                s == slice(0, d)
                for s, d in zip(sl, np.shape(tmpl))
            ):
                out[i] = arr
                covered[i] = int(np.size(tmpl))
            else:
                if out[i] is None:
                    out[i] = np.empty(np.shape(tmpl), dtype=arr.dtype)
                out[i][sl] = arr
                covered[i] += int(np.asarray(arr).size)
    # Reject incomplete or inconsistent shard sets BEFORE handing back
    # data: a lost shard file or a crash between two processes' atomic
    # replaces must fail loudly, never resume from np.empty regions or
    # a mix of two different saves.
    if metas:
        counts = {int(m["process_count"]) for _, m in metas}
        ids = {int(m["save_id"]) for _, m in metas}
        if len(ids) != 1:
            raise ValueError(
                f"checkpoint {path}: shard files come from different "
                f"saves (save_ids {sorted(ids)}) — a save crashed "
                "between processes; restore an older step instead")
        if len(metas) != len(files) or counts != {len(files)}:
            raise ValueError(
                f"checkpoint {path}: found {len(files)} shard files "
                f"but the save ran with {sorted(counts)} processes")
    missing = [i for i, o in enumerate(out) if o is None]
    if missing:
        raise ValueError(f"checkpoint {path} missing leaves {missing}")
    partial = [i for i, (o, c) in enumerate(zip(out, covered))
               if o is not None and c != int(np.size(flat[i]))]
    if partial:
        raise ValueError(
            f"checkpoint {path}: leaves {partial} only partially "
            "covered by the shard files (incomplete shard set)")
    return jax.tree_util.tree_unflatten(treedef, out)


def _place(state, shardings):
    """Lay restored host arrays onto their mesh per ``shardings`` (leaves
    may be ``None`` → leave as-is)."""
    # One placement implementation for the whole library (multi-process
    # device_put vs make_array_from_callback logic lives in exactly one
    # spot). Imported lazily: parallel.sharding imports train.loop, so a
    # top-level import would cycle through the package inits.
    from gpzoo_tpu.parallel.sharding import _put_leaf

    def put(leaf, sh):
        if sh is None:
            return leaf
        return _put_leaf(np.asarray(leaf), sh)

    # shardings is the structure tree (None = leave that subtree alone):
    # flattening it first lets a None cover a whole state subtree.
    return jax.tree_util.tree_map(
        lambda sh, leaf: put(leaf, sh), shardings, state,
        is_leaf=lambda x: x is None,
    )


def make_restore_template(state):
    """Host zeros pytree shaped like ``state`` — the ``template`` argument
    :func:`restore_checkpoint` expects. Never touches device memory
    (``jax.eval_shape``), so it works even when ``state``'s buffers have
    been donated away or live on another process's devices."""
    return jax.tree_util.tree_map(
        lambda a: np.zeros(a.shape, a.dtype),
        jax.eval_shape(lambda: state),
    )


def _clone_checkpoint(src, dst):
    """Duplicate an on-disk checkpoint under a second name without
    re-serializing (atomic per file; handles both the single-file and the
    per-process ``.shard<p>`` layouts — each process copies only the
    shard file it wrote)."""
    import shutil

    def copy(s, d):
        tmp = d + ".tmp"
        shutil.copyfile(s, tmp)
        os.replace(tmp, d)

    if os.path.exists(src):
        copy(src, dst)
        return
    p = jax.process_index()
    shard = f"{src}.shard{p}"
    if os.path.exists(shard):
        copy(shard, f"{dst}.shard{p}")


def restore_checkpoint(path, template, shardings=None):
    """Restore a pytree saved by :func:`save_checkpoint`.

    ``template`` must have the same structure (e.g. a freshly-built
    TrainState). ``shardings`` (optional): a matching pytree of
    ``NamedSharding`` (or ``None``) leaves — e.g. the second return of
    :func:`gpzoo_tpu.parallel.shard_factor_params` — applied so the
    restored state lands partitioned on its mesh rather than replicated.
    """
    has_single = os.path.exists(path)
    has_shards = any(
        re.search(r"\.shard\d+$", p)
        for p in glob.glob(glob.escape(path) + ".shard*")
    )
    if has_single and has_shards:
        # A run that saved single-process and later multi-process (or
        # vice versa) under the same name leaves both layouts on disk;
        # silently preferring one can resume from a stale state.
        raise ValueError(
            f"checkpoint {path}: both a single-file checkpoint and "
            f"{path}.shard* files exist — ambiguous; delete the stale "
            "layout (they come from different runs/process counts)")
    if has_single:
        with open(path, "rb") as f:
            data = f.read()
        state = serialization.from_bytes(template, data)
    else:
        state = _load_multiprocess(path, template)
    if shardings is not None:
        state = _place(state, shardings)
    return state


def _remove_checkpoint_files(ckpt_path):
    """Remove exactly one checkpoint's files: the single file, its
    per-process shard files, and any stale .tmp — but NOT other steps
    sharing the prefix ('run.step5' must not glob away 'run.step50')."""
    pat = re.compile(re.escape(ckpt_path) + r"(\.shard\d+)?(\.tmp)?$")
    for f in glob.glob(glob.escape(ckpt_path) + "*"):
        if pat.fullmatch(f):
            try:
                os.remove(f)
            except OSError:
                pass


class CheckpointHook:
    """Periodic checkpointing for ``make_scan_runner(on_chunk=)``.

    Writes ``<path>.step<N>`` every ``every``-th chunk (atomic per file),
    keeps the newest ``keep`` checkpoints, and always refreshes
    ``<path>.latest`` — the resume entry point after a crash:

        hook = CheckpointHook("/ckpts/run", every=10)
        runner = make_scan_runner(step, 10, on_chunk=hook)
        ...
        hook.wait()   # flush the in-flight write at run end
        state = restore_checkpoint(hook.latest_path, template)

    Together with the bit-deterministic resume contract (module
    docstring), a killed run restarted from ``.latest`` continues the
    exact loss trajectory. Works with sharded TrainStates like
    :func:`save_checkpoint` does.

    ``async_save`` (default: on for single-process runs): saves go
    through :class:`AsyncCheckpointer` — the step stream stalls only
    for the on-device snapshot, while serialization, the write, the
    ``.latest`` refresh and rotation run on the writer thread (at the
    2.16 GB production state the synchronous save stalls ~96 s — about
    2,350 north-star steps — per save). Multi-process runs save
    synchronously: the save barrier and the post-clone barrier (which
    makes ``.latest``'s shard set complete-or-absent for any reader)
    are collectives and must issue from the main thread.
    """

    def __init__(self, path, every=1, keep=2, async_save=None):
        self.path = path
        self.every = int(every)
        self.keep = int(keep)
        self.saved = []  # step-tagged paths, oldest first
        self._chunks = 0
        if async_save is None:
            async_save = jax.process_count() == 1
        self._async = AsyncCheckpointer() if async_save else None

    @property
    def latest_path(self):
        return f"{self.path}.latest"

    def __call__(self, state, losses):
        self._chunks += 1
        if self._chunks % self.every:
            return
        step = int(jax.device_get(state.step))
        tagged = f"{self.path}.step{step}"
        self.saved.append(tagged)
        stale = []
        while len(self.saved) > self.keep:
            stale.append(self.saved.pop(0))

        def after_write():
            # Refresh .latest by copying the bytes just written — a
            # second save_checkpoint would device_get + serialize the
            # full state again (~2× the stall at 2.16 GB). Runs on the
            # writer thread in async mode; rotation too (the previous
            # write was joined before this save started, so the stale
            # files are complete and safe to delete).
            _clone_checkpoint(tagged, self.latest_path)
            if jax.process_count() > 1:
                # .latest must be complete-or-absent: without a barrier
                # a crash (or an early reader) between two processes'
                # clones observes a mixed shard set (advisor round 3).
                from jax.experimental import multihost_utils

                multihost_utils.sync_global_devices("gpzoo_ckpt_latest")
            for old in stale:
                _remove_checkpoint_files(old)

        if self._async is not None:
            self._async.save(tagged, state, _after_write=after_write)
        else:
            save_checkpoint(tagged, state)
            after_write()

    def wait(self):
        """Join the in-flight async write (no-op in sync mode)."""
        if self._async is not None:
            self._async.wait()
