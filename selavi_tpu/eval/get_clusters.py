"""Cluster-assignment dump: full-dataset head activations -> pickle.

Capability parity with /root/reference/get_clusters.py:57-162: run the model
(eval mode, center-crop, no jitter) over a dataset, aggregate pooled
features, apply every head, and dump ``[PS_v_heads, labels, PS_a_heads]`` —
the same pickle schema the reference's ``clustering_metrics.py`` consumes,
so dumps are cross-checkable against the PyTorch reference.
"""

from __future__ import annotations

import logging
import pickle
from typing import Callable, Iterator

import jax.numpy as jnp
import numpy as np

logger = logging.getLogger(__name__)


def dump_cluster_matrices(
    encode_fn: Callable,
    head_logits_fn: Callable,
    batch_iter: Iterator[dict],
    n: int,
    out_path: str,
    feat_dim: int = 512,
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Returns (PS_v [H,N,K], labels [N], PS_a [H,N,K]) and writes the
    reference-schema pickle (list of per-head matrices)."""
    from selavi_tpu.selflabel.engine import _scatter_features

    labels = np.zeros(n, np.int64)
    feats_v = jnp.zeros((n, feat_dim), jnp.float32)
    feats_a = jnp.zeros((n, feat_dim), jnp.float32)
    for batch in batch_iter:
        fv, fa = encode_fn(
            batch["video"], batch.get("audio", batch.get("audio_pcm"))
        )
        feats_v, feats_a = _scatter_features(
            feats_v, feats_a, fv, fa, jnp.asarray(batch["index"])
        )
        labels[np.asarray(batch["index"])] = np.asarray(batch["label"])

    ps_v = np.asarray(head_logits_fn(feats_v, "v"))  # [H, N, K]
    ps_a = np.asarray(head_logits_fn(feats_a, "a"))

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
