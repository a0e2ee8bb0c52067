"""Clustering-quality metrics: NMI / aNMI / aRI / entropy / purity /
Hungarian-matched accuracy.

Capability parity with /root/reference/clustering_metrics.py:19-175
(``_hungarian_match``, ``cluster_acc``, ``k_means`` report) — numpy/scipy/
sklearn host math, no torch.
"""

from __future__ import annotations

import numpy as np
from scipy.optimize import linear_sum_assignment
from scipy.stats import entropy as scipy_entropy
from sklearn.metrics.cluster import (
    adjusted_mutual_info_score,
    adjusted_rand_score,
    normalized_mutual_info_score,
)


def hungarian_match(
    preds: np.ndarray, targets: np.ndarray, num_k: int
) -> list[tuple[int, int]]:
    """Optimal one-to-one cluster<->class matching via the vote matrix
    (reference clustering_metrics.py:41-66). Vectorized: the K x K vote
    matrix is one bincount instead of K^2 masked sums."""
    assert preds.shape == targets.shape
    votes = np.bincount(
        preds.astype(np.int64) * num_k + targets.astype(np.int64),
        minlength=num_k * num_k,
    ).reshape(num_k, num_k)
    rows, cols = linear_sum_assignment(len(preds) - votes)
    return list(zip(rows.tolist(), cols.tolist()))


def cluster_accuracy(
    preds: np.ndarray, targets: np.ndarray, num_k: int
) -> float:
    """Accuracy after optimal relabeling (reference :69-92)."""
    match = hungarian_match(preds, targets, num_k)
    reordered = np.zeros(len(targets), np.int64)
    for pred_i, target_i in match:
        reordered[preds == pred_i] = target_i
    return float((reordered == targets).mean())


def entropy_purity(preds: np.ndarray, targets: np.ndarray):
    entropies, purities = [], []
    for c in np.unique(preds):
        mask = preds == c
        if mask.sum() == 0:
            continue
        _, counts = np.unique(targets[mask], return_counts=True)
        frac = counts / counts.sum()
        purities.append(frac.max())
        entropies.append(scipy_entropy(frac))
    return float(np.mean(entropies)), float(np.mean(purities))


def clustering_report(
    preds: np.ndarray, targets: np.ndarray, num_clusters: int
) -> dict:
    """Full metric set of the reference ``k_means`` report
    (clustering_metrics.py:135-175). Ground-truth labels are re-indexed to
    0..C-1 before Hungarian matching, as in the reference (:166-168)."""
    nmi = normalized_mutual_info_score(
        preds, targets, average_method="arithmetic"
    )
    anmi = adjusted_mutual_info_score(
        preds, targets, average_method="arithmetic"
    )
    ari = adjusted_rand_score(preds, targets)
    ent, pur = entropy_purity(preds, targets)
    uniq = {v: i for i, v in enumerate(np.unique(targets))}
    remapped = np.asarray([uniq[v] for v in targets])
    acc = cluster_accuracy(preds, remapped, num_clusters)
    return {
        "nmi": float(nmi),
        "anmi": float(anmi),
        "ari": float(ari),
        "entropy": ent,
        "purity": pur,
        "accuracy": acc,
    }


def best_head_labels(
    logits_v_heads: np.ndarray,
    logits_a_heads: np.ndarray,
    targets: np.ndarray,
) -> tuple[np.ndarray, int]:
    """Pick the head whose ``softmax_v * softmax_a`` argmax labels maximize
    NMI vs. ground truth (reference clustering_metrics.py:104-125).
    Inputs [H, N, K]."""
    from scipy.special import log_softmax

    best_nmi, best_labels, best_h = -1.0, None, 0
    for h in range(logits_v_heads.shape[0]):
        log_ps = log_softmax(
            logits_v_heads[h].astype(np.float64), axis=1
        ) + log_softmax(logits_a_heads[h].astype(np.float64), axis=1)
        labels = log_ps.argmax(1)
        nmi = normalized_mutual_info_score(
            labels, targets, average_method="arithmetic"
        )
        if nmi > best_nmi:
            best_nmi, best_labels, best_h = nmi, labels, h
    return best_labels, best_h
