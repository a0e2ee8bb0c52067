"""Nearest-neighbor video retrieval.

Capability parity with /root/reference/src/retrieval_utils.py +
video_retrieval.py:

* video tower truncated before GAP: stem..layer4 then Max/AvgPool3d(2),
  flattened (retrieval_utils.py:80-98) — here a ``pool_op``-parameterized
  method on the flax tower returning the pre-GAP feature map, pooled and
  flattened on device;
* features for N clips/video over train and test splits, optional
  per-feature L2 norm, per-video mean (:318-376);
* sklearn NearestNeighbors(50) with Recall@{1,5,10,20,50}, hit = query
  class present among the neighbors (:379-443); tasks v-v / v-a / a-v /
  a-a plumbed.
"""

from __future__ import annotations

import logging
from collections import defaultdict
from typing import Callable, Iterator, Optional

import jax
import jax.numpy as jnp
import numpy as np

logger = logging.getLogger(__name__)

RECALL_THRESHOLDS = (1, 5, 10, 20, 50)


def make_retrieval_encode_fn(model, pool_op: str = "max", compute_dtype=jnp.float32):
    """Jitted truncated-tower features: [B,T,H,W,3]u8 -> [B, D_flat]."""

    @jax.jit
    def encode(params, batch_stats, video_u8):
        video = (
            (video_u8.astype(jnp.float32) / 255.0 - 0.45) / 0.225
        ).astype(compute_dtype)
        fmap = model.apply(
            {"params": params, "batch_stats": batch_stats},
            video,
            train=False,
            method=model.video_feature_map,
        )  # [B, t, h, w, 512]
        window = (2, 2, 2)
        if any(s < w for s, w in zip(fmap.shape[1:4], window)):
            raise ValueError(
                f"feature map {fmap.shape[1:4]} smaller than pool window "
                f"{window}: use >=16 frames and >=64px crops (reference "
                "retrieval uses clip_len 32 @ 112px)"
            )
        if pool_op == "max":
            pooled = jax.lax.reduce_window(
                fmap,
                -jnp.inf,
                jax.lax.max,
                (1, *window, 1),
                (1, *window, 1),
                "VALID",
            )
        else:
            pooled = jax.lax.reduce_window(
                fmap, 0.0, jax.lax.add, (1, *window, 1), (1, *window, 1),
                "VALID",
            ) / np.prod(window)
        return pooled.reshape(pooled.shape[0], -1).astype(jnp.float32)

    return encode


def collect_features(
    encode_fn: Optional[Callable],
    batch_iter: Iterator[dict],
    audio_encode_fn: Optional[Callable] = None,
    joint_encode_fn: Optional[Callable] = None,
):
    """Run the encoder(s) over a split; returns (features, vid_indices,
    labels[, audio_features]) with one row per clip.

    ``joint_encode_fn(video, audio) -> (feat_v, feat_a)`` encodes both
    modalities in ONE model apply (the reference's get_audio=True
    ``model(video, audio)`` path, retrieval_utils.py:199-201 — both
    512-d GAP); otherwise ``encode_fn(video)`` (plus optional
    ``audio_encode_fn``) run separately.

    Multi-host aware: batch arrays may span processes (globally-assembled
    pod-sharded loaders) — every value is gathered via ``fetch_to_host``,
    and rows are deduplicated + sorted by the batch ``index`` so the
    rank-padding duplicates of ragged tails (mesh.py::pad_local_rows)
    drop out and the row order is identical for ANY process count."""
    from selavi_tpu.parallel.mesh import fetch_to_host

    feats, vids, labels, afeats, indices = [], [], [], [], []
    for batch in batch_iter:
        if joint_encode_fn is not None:
            fv, fa = joint_encode_fn(
                batch["video"],
                batch.get("audio", batch.get("audio_pcm")),
            )
            feats.append(fetch_to_host(fv))
            afeats.append(fetch_to_host(fa))
        else:
            feats.append(fetch_to_host(encode_fn(batch["video"])))
            if audio_encode_fn is not None:
                afeats.append(
                    fetch_to_host(
                        audio_encode_fn(
                            batch.get("audio", batch.get("audio_pcm"))
                        )
                    )
                )
        vids.append(fetch_to_host(batch["vid_idx"]))
        labels.append(fetch_to_host(batch["label"]))
        if "index" in batch:
            indices.append(fetch_to_host(batch["index"]))
    out = (
        np.concatenate(feats),
        np.concatenate(vids),
        np.concatenate(labels),
    )
    if indices:
        _, first = np.unique(np.concatenate(indices), return_index=True)
        out = tuple(a[first] for a in out)
        afeats = [np.concatenate(afeats)[first]] if afeats else afeats
    if afeats:
        return out + (np.concatenate(afeats),)
    return out


def average_features(
    features: np.ndarray,
    vid_indices: np.ndarray,
    labels: np.ndarray,
    norm_feats: bool = True,
):
    """Per-clip L2 norm then per-video mean (retrieval_utils.py:318-376)."""
    if norm_feats:
        features = features / np.maximum(
            np.sqrt((features ** 2).sum(1, keepdims=True)), 1e-12
        )
    feat_dict = defaultdict(list)
    label_dict = {}
    for f, v, l in zip(features, vid_indices, labels):
        feat_dict[int(v)].append(f)
        label_dict[int(v)] = int(l)
    avg_feats, avg_vids, avg_labels = [], [], []
    for vid, fl in feat_dict.items():
        avg_feats.append(np.mean(np.stack(fl), axis=0))
        avg_vids.append(vid)
        avg_labels.append(label_dict[vid])
    return (
        np.stack(avg_feats),
        np.asarray(avg_vids),
        np.asarray(avg_labels),
    )


def select_task_features(task: str, train_v, train_a, val_v, val_a):
    """Pick (train, val) feature sets for a retrieval task
    (reference retrieval_utils.py:379-407)."""
    assert task in ("v-v", "v-a", "a-v", "a-a"), task
    if task in ("v-a", "a-v", "a-a"):
        assert train_a is not None and val_a is not None, (
            f"task {task} needs audio features"
        )
    feat_val = val_v if task.startswith("v") else val_a
    feat_train = train_v if task.endswith("v") else train_a
    return feat_train, feat_val


def retrieval(
    train_features: np.ndarray,
    train_labels: np.ndarray,
    val_features: np.ndarray,
    val_labels: np.ndarray,
    thresholds=RECALL_THRESHOLDS,
) -> dict:
    """Recall@k: fraction of queries whose class appears among the k nearest
    train neighbors (retrieval_utils.py:379-443). One kneighbors call at
    max-k instead of the reference's per-threshold re-query — identical
    results (the k-NN list is nested)."""
    from sklearn.neighbors import NearestNeighbors

    max_k = min(max(thresholds), len(train_features))
    thresholds = [k for k in thresholds if k <= max_k] or [max_k]
    neigh = NearestNeighbors(n_neighbors=max_k)
    neigh.fit(train_features)
    _, indices = neigh.kneighbors(val_features, max_k)
    neighbor_labels = train_labels[indices]  # [Nval, max_k]

    recalls = {}
    for k in thresholds:
        hit = (neighbor_labels[:, :k] == val_labels[:, None]).any(axis=1)
        recalls[k] = float(100.0 * hit.mean())
        logger.info("Recall @ %d: %.2f", k, recalls[k])
    return recalls
