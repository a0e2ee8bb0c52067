"""Batch loader: host workers -> pinned numpy batches -> sharded device puts.

The reference uses torch DataLoader with 10 fork workers
(/root/reference/main.py:94-101). TPU-native equivalent: a thread-pool
loader (decode/transform code is numpy/PIL which releases the GIL for the
heavy parts) producing fixed-shape numpy batches, plus a device prefetcher
that keeps ``prefetch`` batches in flight on the mesh so host decode overlaps
device compute (double buffering over HBM).
"""

from __future__ import annotations

import collections
import concurrent.futures as cf
import contextlib
import multiprocessing
import os
import time
from typing import Iterator, Optional

import jax
import numpy as np

_WORKER_DATASET = None


def _process_worker_init(dataset):
    # runs in the spawned child: hold the dataset once instead of pickling
    # it per task
    global _WORKER_DATASET
    _WORKER_DATASET = dataset


def _process_fetch(idx: int, seed_tuple):
    rng = np.random.default_rng(seed_tuple)
    return _WORKER_DATASET.get_example(int(idx), rng)


@contextlib.contextmanager
def _no_accelerator_env():
    """Spawned loader workers must never initialize an accelerator client
    (on single-chip deployments a worker claiming the device deadlocks the
    trainer). Strips the env triggers around child creation."""
    saved = {
        k: os.environ.get(k)
        for k in ("PALLAS_AXON_POOL_IPS", "PYTHONPATH", "JAX_PLATFORMS")
    }
    try:
        os.environ.pop("PALLAS_AXON_POOL_IPS", None)
        os.environ["JAX_PLATFORMS"] = "cpu"
        pythonpath = [
            p for p in (saved["PYTHONPATH"] or "").split(os.pathsep)
            if p and "axon" not in p
        ]
        repo_root = os.path.dirname(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        )
        if repo_root not in pythonpath:
            pythonpath.append(repo_root)
        os.environ["PYTHONPATH"] = os.pathsep.join(pythonpath)
        yield
    finally:
        for k, v in saved.items():
            if v is None:
                os.environ.pop(k, None)
            else:
                os.environ[k] = v


class DataLoader:
    """Map-style loader. ``dataset.get_example(idx, rng) -> dict`` of numpy.

    Yields dict batches with a leading batch axis; ``set_epoch`` reshuffles
    deterministically (the reference's DistributedSampler.set_epoch).
    Model-facing layouts are produced here: video ``[B,T,H,W,3] uint8``,
    audio ``[B,F,T,1] float32``.
    """

    def __init__(
        self,
        dataset,
        batch_size: int,
        shuffle: bool = True,
        drop_last: bool = True,
        num_workers: int = 0,
        seed: int = 0,
        rank: int = 0,
        world_size: int = 1,
        worker_mode: str = "thread",  # 'thread' | 'process'
    ):
        """``batch_size`` is the per-process batch; with ``world_size`` > 1
        each process iterates a strided subset of the epoch permutation
        (the reference's DistributedSampler strategy).

        ``worker_mode='process'`` uses spawned worker processes (the torch
        DataLoader analog) — sidesteps the GIL for Python-heavy decode at
        the cost of pickling examples back; the dataset must be picklable.
        Measured on synthetic paper-shape samples: threads 83 samples/s vs
        processes 55 (pickling dominates), so threads stay the default;
        process mode is for GIL-bound pure-Python decode paths.
        """
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.num_workers = num_workers
        self.seed = seed
        self.rank = rank
        self.world_size = world_size
        self.worker_mode = worker_mode
        self.epoch = 0
        self._pool = None

    def _get_pool(self):
        if self._pool is None:
            with _no_accelerator_env():
                ctx = multiprocessing.get_context("spawn")
                self._pool = cf.ProcessPoolExecutor(
                    self.num_workers,
                    mp_context=ctx,
                    initializer=_process_worker_init,
                    initargs=(self.dataset,),
                )
                # ProcessPoolExecutor spawns workers lazily at submit
                # time — which would be AFTER this context restored the
                # accelerator env (children inherit os.environ at
                # process-creation time). Force every worker to spawn
                # now: each sleeping task occupies a worker, so each
                # submit spawns a fresh process.
                cf.wait([
                    self._pool.submit(time.sleep, 0.2)
                    for _ in range(self.num_workers)
                ])
        return self._pool

    def close(self):
        if self._pool is not None:
            self._pool.shutdown()
            self._pool = None

    def set_epoch(self, epoch: int):
        self.epoch = epoch

    def __len__(self):
        """Exact number of batches every rank yields (identical across
        ranks for any (N, world_size, batch_size, drop_last))."""
        n = len(self.dataset)
        if self.drop_last:
            return (n // self.world_size) // self.batch_size
        per_rank = -(-n // self.world_size)
        return -(-per_rank // self.batch_size)

    def _order(self) -> np.ndarray:
        n = len(self.dataset)
        if not self.shuffle:
            order = np.arange(n)
        else:
            rng = np.random.default_rng((self.seed, self.epoch))
            order = rng.permutation(n)
        if self.world_size > 1:
            # Same permutation on every process (seeded), strided subset.
            # Every rank MUST end up with the same index count, or one host
            # yields an extra batch and the SPMD program deadlocks at its
            # make_array_from_process_local_data. Under drop_last we
            # truncate to floor(N/W)*W (the tail is resampled next epoch —
            # reference DistributedSampler semantics, main.py:93); otherwise
            # we pad by wrapping (duplicates are harmless: training
            # resamples, eval scatter-by-index is idempotent).
            if self.drop_last:
                order = order[
                    : (len(order) // self.world_size) * self.world_size
                ]
            else:
                pad = (-len(order)) % self.world_size
                if pad:
                    # np.resize tiles: a single wrap (order[:pad]) is too
                    # short when N < world_size/2 and would leave ranks
                    # with unequal counts — the exact deadlock above
                    order = np.resize(order, len(order) + pad)
            order = order[self.rank :: self.world_size]
        return order

    def _collate(self, examples) -> dict:
        batch = {}
        if "video_y" in examples[0]:
            # YUV 4:2:0 wire format: half the video bytes over the wire;
            # RGB is reconstructed on device (ops.preprocess)
            batch["video_y"] = np.stack([e["video_y"] for e in examples])
            batch["video_uv"] = np.stack([e["video_uv"] for e in examples])
        else:
            batch["video"] = np.stack([e["video"] for e in examples])
        if "audio_pcm" in examples[0]:
            # raw waveforms: the spectrogram is computed on device; int16
            # (packed shards) stays int16 over the wire
            pcm = np.stack([e["audio_pcm"] for e in examples])
            batch["audio_pcm"] = (
                pcm if pcm.dtype == np.int16 else pcm.astype(np.float32)
            )
        elif "audio" in examples[0]:
            audio = np.stack([e["audio"] for e in examples])
            if audio.ndim == 3:  # [B, F, T] -> add channel axis
                audio = audio[..., None]
            batch["audio"] = audio.astype(np.float32)
        batch["label"] = np.asarray(
            [e["label"] for e in examples], np.int32
        )
        batch["index"] = np.asarray(
            [e["index"] for e in examples], np.int32
        )
        batch["vid_idx"] = np.asarray(
            [e["vid_idx"] for e in examples], np.int32
        )
        return batch

    def __iter__(self) -> Iterator[dict]:
        order = self._order()
        n = len(order)
        bs = self.batch_size
        starts = range(0, n - bs + 1 if self.drop_last else n, bs)

        def fetch(i, pos):
            rng = np.random.default_rng((self.seed, self.epoch, int(i)))
            return self.dataset.get_example(int(i), rng)

        if self.num_workers <= 0:
            for s in starts:
                idxs = order[s : s + bs]
                yield self._collate(
                    [fetch(i, s + j) for j, i in enumerate(idxs)]
                )
        elif self.worker_mode == "process":
            pool = self._get_pool()
            starts = list(starts)
            depth = max(2, self.num_workers // 2)
            pending = collections.deque()

            def submit(s):
                idxs = order[s : s + bs]
                return [
                    pool.submit(
                        _process_fetch, int(i),
                        (self.seed, self.epoch, int(i)),
                    )
                    for i in idxs
                ]

            for s in starts[:depth]:
                pending.append(submit(s))
            consumed = 0
            while pending:
                futs = pending.popleft()
                consumed += 1
                if consumed + len(pending) <= len(starts) - 1:
                    pending.append(submit(starts[consumed + len(pending)]))
                yield self._collate([f.result() for f in futs])
        else:
            with cf.ThreadPoolExecutor(self.num_workers) as pool:
                pending = collections.deque()
                starts = list(starts)
                depth = max(2, self.num_workers // 2)
                it = iter(starts)

                def submit(s):
                    idxs = order[s : s + bs]
                    return [
                        pool.submit(fetch, i, s + j)
                        for j, i in enumerate(idxs)
                    ]

                for s in starts[:depth]:
                    pending.append(submit(s))
                consumed = 0
                while pending:
                    futs = pending.popleft()
                    consumed += 1
                    if consumed + len(pending) <= len(starts) - 1:
                        nxt = starts[consumed + len(pending)]
                        pending.append(submit(nxt))
                    yield self._collate([f.result() for f in futs])


def _batch_sharding(x, sharding):
    """``sharding`` unless the leading dim doesn't divide the data axis
    (the ragged final batch of a drop_last=False eval loader):
    ``device_put`` rejects uneven shards, so the tail batch is left on
    the default device instead (jit replicates it on use) — every
    consumer works unchanged at the cost of one unsharded batch."""
    if sharding is None:
        return None
    try:
        # only the LEADING dim's partitioning constrains x.shape[0]; other
        # entries of the spec shard other dims and are irrelevant here
        lead = sharding.spec[0] if len(sharding.spec) else None
        axes = (
            ()
            if lead is None
            else (lead,) if isinstance(lead, str) else tuple(lead)
        )
        n = int(np.prod([sharding.mesh.shape[a] for a in axes] or [1]))
    except AttributeError:  # not a NamedSharding; let device_put decide
        return sharding
    return sharding if x.shape[0] % n == 0 else None


def device_prefetch(
    batch_iter: Iterator[dict],
    sharding=None,
    depth: int = 2,
    mesh=None,
) -> Iterator[dict]:
    """Keep ``depth`` batches in flight on device (double buffering).

    With ``mesh`` given, batches are assembled as globally-sharded arrays
    from per-process shards (multi-host pods); otherwise a plain
    device_put with ``sharding`` (ragged tail batches are replicated, see
    ``_batch_sharding``).
    """
    queue: collections.deque = collections.deque()

    def put(b):
        if mesh is not None:
            from selavi_tpu.parallel.mesh import global_batch_from_local

            return global_batch_from_local(mesh, b)
        if sharding is None:
            return jax.tree.map(jax.device_put, b)
        return jax.tree.map(
            lambda x: jax.device_put(x, _batch_sharding(x, sharding)), b
        )

    for batch in batch_iter:
        queue.append(put(batch))
        if len(queue) >= depth:
            yield queue.popleft()
    while queue:
        yield queue.popleft()


class BatchCoalescer:
    """Pack a whole batch into ONE ``[B, rec_bytes]`` uint8 buffer.

    On links with high per-transfer latency (the dev relay: ~50 ms
    round-trip regardless of size; real DCN links have the same shape),
    a batch of 6 small device_puts is latency-bound. Coalescing makes it
    one put; the device side slices static byte columns and bitcasts back
    (reshape/bitcast are free — the row layout keeps the batch axis
    leading, so the buffer shards over 'data' exactly like its fields).
    """

    def __init__(self):
        self._fields = None  # [(key, dtype, trailing_shape, off, nbytes)]
        self._rec_bytes = 0

    def _plan(self, batch: dict):
        fields, off = [], 0
        for key in sorted(batch):
            a = batch[key]
            nbytes = int(np.prod(a.shape[1:])) * a.dtype.itemsize
            fields.append((key, a.dtype, a.shape[1:], off, nbytes))
            off += nbytes
        self._fields, self._rec_bytes = fields, off

    def pack(self, batch: dict) -> np.ndarray:
        if self._fields is None:
            self._plan(batch)
        b = next(iter(batch.values())).shape[0]
        buf = np.empty((b, self._rec_bytes), np.uint8)
        for key, dtype, _, off, nbytes in self._fields:
            buf[:, off : off + nbytes] = (
                np.ascontiguousarray(batch[key])
                .view(np.uint8)
                .reshape(b, nbytes)
            )
        return buf

    def unpack_fn(self):
        """Jittable ``buf [B, rec_bytes] -> dict`` (slices are static)."""
        import jax.numpy as jnp
        from jax import lax

        fields = self._fields

        def unpack(buf):
            out = {}
            for key, dtype, shape, off, nbytes in fields:
                col = buf[:, off : off + nbytes]
                if dtype == np.uint8:
                    arr = col.reshape((col.shape[0],) + shape)
                else:
                    w = dtype.itemsize
                    arr = lax.bitcast_convert_type(
                        col.reshape(col.shape[0], nbytes // w, w),
                        jnp.dtype(dtype),
                    ).reshape((col.shape[0],) + shape)
                out[key] = arr
            return out

        return unpack


def coalesced_device_batches(
    batch_iter: Iterator[dict], sharding=None, depth: int = 2, mesh=None
) -> Iterator[dict]:
    """device_prefetch variant with one H2D transfer per batch.

    Measured on the bandwidth/latency-limited dev relay: 92.6 clips/s
    end-to-end vs ~50 for per-field puts (YUV shard, depth 4) — the single
    put saturates link bandwidth instead of paying per-field round trips.
    With ``mesh`` given, the packed buffer is assembled from per-process
    shards like global_batch_from_local.
    """
    import jax

    co = BatchCoalescer()
    unpack = None
    queue: collections.deque = collections.deque()

    def put(b):
        buf = co.pack(b)
        if mesh is not None and jax.process_count() > 1:
            from selavi_tpu.parallel.mesh import (
                data_sharding,
                pad_local_rows,
            )

            per_proc = max(
                mesh.shape["data"] // jax.process_count(), 1
            )
            return jax.make_array_from_process_local_data(
                data_sharding(mesh), pad_local_rows(buf, per_proc)
            )
        return jax.device_put(buf, _batch_sharding(buf, sharding))

    for batch in batch_iter:
        if unpack is None:
            co._plan(batch)
            unpack = jax.jit(co.unpack_fn())
        queue.append(put(batch))
        if len(queue) >= depth:
            yield unpack(queue.popleft())
    while queue:
        yield unpack(queue.popleft())


@jax.jit
def _pcm_to_f32(x):
    import jax.numpy as jnp

    return x.astype(jnp.float32)


def decode_wire_batches(batch_iter: Iterator[dict]) -> Iterator[dict]:
    """Expand wire-efficient batch encodings on device.

    Sits after ``device_prefetch`` (arrays are already sharded on the
    mesh): YUV 4:2:0 planes become RGB uint8, int16 PCM becomes float32 —
    both elementwise jit ops that preserve the batch sharding. Pass-through
    for plain batches, so it is always safe to apply.
    """
    import jax.numpy as jnp

    from selavi_tpu.ops.preprocess import yuv420_to_rgb_batch

    for batch in batch_iter:
        if "video_y" in batch:
            batch = dict(batch)
            batch["video"] = yuv420_to_rgb_batch(
                batch.pop("video_y"), batch.pop("video_uv")
            )
        if (
            "audio_pcm" in batch
            and batch["audio_pcm"].dtype == jnp.int16
        ):
            batch = dict(batch)
            batch["audio_pcm"] = _pcm_to_f32(batch["audio_pcm"])
        yield batch
