"""Device mesh construction and sharding helpers.

The TPU-native replacement for the reference's DDP/NCCL process-group layer
(/root/reference/utils.py:112-152, main.py:156-160): one logical SPMD
program over a ``jax.sharding.Mesh`` instead of one process per GPU.

Mesh layout: a 2D ``('data', 'model')`` mesh. SeLaVi's parallelism is pure
data parallelism (reference §2.9 of SURVEY.md — the models are ~33 M
params), so ``model=1`` by default; the axis exists so head-stacks or larger
towers can be sharded without restructuring. Batches are sharded over
``data`` (gradient psum and global BatchNorm statistics are inserted by
GSPMD); parameters are replicated.
"""

from __future__ import annotations

import functools
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    devices: Optional[Sequence] = None, model_axis: int = 1
) -> Mesh:
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    assert n % model_axis == 0, (n, model_axis)
    arr = np.asarray(devices).reshape(n // model_axis, model_axis)
    return Mesh(arr, ("data", "model"))


def data_sharding(mesh: Mesh) -> NamedSharding:
    """Leading axis sharded over the data axis (batches, feature matrices)."""
    return NamedSharding(mesh, P("data"))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch: dict) -> dict:
    """Device-put a host batch with the leading axis over 'data'."""
    s = data_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, s), batch)


def state_shardings(mesh: Mesh, state, headcount: int):
    """Per-leaf shardings for a TrainState: head-stack leaves (params,
    BN stats, and their mirrored optimizer moments — any leaf whose path
    crosses ``heads_v``/``heads_a`` with a leading ``[H, ...]`` axis) are
    sharded over the mesh's 'model' axis; everything else is replicated.

    The heads are ``headcount`` fully independent classifiers (reference
    model.py:210-219), so the head axis is an embarrassingly-parallel
    "expert" dimension: with ``--model_axis M``, each device group holds
    H/M heads, cutting head-side memory and compute per chip with zero
    extra communication in the train step (logits stay head-sharded
    through the per-head CE mean). With model_axis=1 this degenerates to
    fully replicated.
    """
    import jax.tree_util as jtu

    model_size = dict(zip(mesh.axis_names, mesh.devices.shape)).get(
        "model", 1
    )
    if headcount % model_size != 0:
        raise ValueError(
            f"--model_axis {model_size} must divide --headcount "
            f"{headcount} (heads shard over the model axis)"
        )
    rep = NamedSharding(mesh, P())
    head_sh = NamedSharding(mesh, P("model"))

    def rule(path, leaf):
        names = jtu.keystr(path)
        if (
            ("heads_v" in names or "heads_a" in names)
            and getattr(leaf, "ndim", 0) >= 1
            and leaf.shape[0] == headcount
        ):
            return head_sh
        return rep

    return jtu.tree_map_with_path(rule, state)


def fetch_to_host(x) -> np.ndarray:
    """``np.asarray`` for arrays that may span non-addressable devices.

    Multi-host SPMD arrays (e.g. the row-sharded Sinkhorn labels) cannot be
    fetched directly — every process first reshards to fully-replicated
    (an all-gather over ICI), then reads its local copy. Single-host or
    fully-addressable arrays take the fast path. Must be called from ALL
    processes (it launches a collective)."""
    if not hasattr(x, "is_fully_addressable") or x.is_fully_addressable:
        return np.asarray(x)
    if x.is_fully_replicated:
        return np.asarray(x.addressable_shards[0].data)
    mesh = x.sharding.mesh
    rep = _replicate_fn(NamedSharding(mesh, P()))(x)
    return np.asarray(rep.addressable_shards[0].data)


@functools.lru_cache(maxsize=None)
def _replicate_fn(sharding):
    """Cached jitted identity per target sharding: a fresh ``jax.jit``
    per call would never hit the jit cache (keyed on the function
    object), recompiling the resharding program for every array."""
    return jax.jit(lambda a: a, out_shardings=sharding)


def pad_local_rows(x: np.ndarray, multiple: int) -> np.ndarray:
    """Pad the leading dim up to a multiple by repeating the last row.

    ``make_array_from_process_local_data`` rejects shard sizes that don't
    divide the data axis, so the ragged tail batch of a drop_last=False
    loader (equal across processes, but not a multiple of
    devices-per-process) must be padded. Duplicated rows are harmless for
    the multi-host consumers: SK feature aggregation scatters by sample
    index (idempotent), and training loaders use drop_last=True."""
    rows = x.shape[0]
    pad = (-rows) % multiple
    if not pad:
        return x
    reps = np.repeat(x[-1:], pad, axis=0)
    return np.concatenate([x, reps], axis=0)


def global_batch_from_local(mesh: Mesh, local_batch: dict) -> dict:
    """Assemble a globally-sharded batch from per-host shards.

    Single-host: plain device_put with the data sharding. Multi-host: each
    process contributes its local arrays as its address-local shards of the
    global batch (``jax.make_array_from_process_local_data``) — the TPU-pod
    replacement for the reference's DistributedSampler per-rank subsets
    (/root/reference/main.py:93-101). Ragged tail batches are padded per
    process (``pad_local_rows``)."""
    s = data_sharding(mesh)
    if jax.process_count() == 1:
        return jax.tree.map(lambda x: jax.device_put(x, s), local_batch)
    per_proc = max(mesh.shape["data"] // jax.process_count(), 1)
    return jax.tree.map(
        lambda x: jax.make_array_from_process_local_data(
            s, pad_local_rows(np.asarray(x), per_proc)
        ),
        local_batch,
    )
