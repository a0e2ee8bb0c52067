"""Cluster-assignment dump: full-dataset head activations -> pickle.

Capability parity with /root/reference/get_clusters.py:57-162: run the model
(eval mode, center-crop, no jitter) over a dataset, aggregate pooled
features, apply every head, and dump ``[PS_v_heads, labels, PS_a_heads]`` —
the same pickle schema the reference's ``clustering_metrics.py`` consumes,
so dumps are cross-checkable against the PyTorch reference.
"""

from __future__ import annotations

import functools
import logging
import pickle
from typing import Callable, Iterator

import jax
import jax.numpy as jnp
import numpy as np

logger = logging.getLogger(__name__)


@functools.partial(jax.jit, donate_argnums=(0,))
def _scatter_labels(buf, labels, idx):
    return buf.at[idx].set(labels.astype(jnp.int32))


def dump_cluster_matrices(
    encode_fn: Callable,
    head_logits_fn: Callable,
    batch_iter: Iterator[dict],
    n: int,
    out_path: str,
    feat_dim: int = 512,
    sharding=None,
    feat_dim_a: int | None = None,
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Returns (PS_v [H,N,K], labels [N], PS_a [H,N,K]) and writes the
    reference-schema pickle (list of per-head matrices).

    Pod-sharded inference (reference get_clusters.py:98-147,257-265: each
    rank encodes a strided subset, then all_gather): pass a row
    ``sharding`` and globally-assembled batches — the accumulators stay
    distributed over the mesh, labels are scattered on device, and only
    process 0 writes the pickle (every process returns the full arrays).
    """
    from selavi_tpu.parallel.mesh import fetch_to_host
    from selavi_tpu.selflabel.engine import _scatter_features

    labels_dev = jnp.zeros(n, jnp.int32)
    feats_v = jnp.zeros((n, feat_dim), jnp.float32)
    feats_a = jnp.zeros((n, feat_dim_a or feat_dim), jnp.float32)
    if sharding is not None:
        labels_dev = jax.device_put(labels_dev, sharding)
        feats_v = jax.device_put(feats_v, sharding)
        feats_a = jax.device_put(feats_a, sharding)
    for batch in batch_iter:
        fv, fa = encode_fn(
            batch["video"], batch.get("audio", batch.get("audio_pcm"))
        )
        idx = jnp.asarray(batch["index"])
        feats_v, feats_a = _scatter_features(feats_v, feats_a, fv, fa, idx)
        labels_dev = _scatter_labels(
            labels_dev, jnp.asarray(batch["label"]), idx
        )

    labels = fetch_to_host(labels_dev).astype(np.int64)
    ps_v = fetch_to_host(head_logits_fn(feats_v, "v"))  # [H, N, K]
    ps_a = fetch_to_host(head_logits_fn(feats_a, "a"))

    # the reference's clustering_metrics.py calls .cpu()/F.softmax on the
    # dump entries, so a truly cross-checkable pickle must hold torch
    # tensors; our own evaluate_dump reads either via np.asarray
    try:
        import torch

        def wrap(a):
            # copy: torch rejects the non-writable views flax restores
            return torch.from_numpy(np.array(a, copy=True))
    except ImportError:  # torch-less host: numpy-only dump

        def wrap(a):
            return a

    payload = [
        [wrap(ps_v[h]) for h in range(ps_v.shape[0])],
        wrap(labels),
        [wrap(ps_a[h]) for h in range(ps_a.shape[0])],
    ]
    if jax.process_index() == 0:
        with open(out_path, "wb") as f:
            pickle.dump(payload, f)
        logger.info("dumped cluster matrices to %s", out_path)
    return ps_v, labels, ps_a


def evaluate_dump(path: str, ncentroids: int, use_all_heads: bool = True):
    """The reference ``k_means`` report over a dump file
    (clustering_metrics.py:95-175)."""
    from selavi_tpu.eval.clustering import best_head_labels, clustering_report

    with open(path, "rb") as f:
        ps = pickle.load(f)
    ps_v_heads = np.stack([np.asarray(m) for m in ps[0]])
    labels = np.asarray(ps[1])
    ps_a_heads = np.stack([np.asarray(m) for m in ps[2]])

    if use_all_heads:
        preds, best_h = best_head_labels(ps_v_heads, ps_a_heads, labels)
        logger.info("best head: %d", best_h)
    else:
        from scipy.special import log_softmax

        log_ps = log_softmax(ps_v_heads[0].astype(np.float64), 1) + \
            log_softmax(ps_a_heads[0].astype(np.float64), 1)
        preds = log_ps.argmax(1)
    report = clustering_report(preds, labels, ncentroids)
    for k, v in report.items():
        print(f"{k}: {v:.4f}")
    return report
