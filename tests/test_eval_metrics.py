"""Clustering metrics: Hungarian matching, accuracy, report."""

import numpy as np

from selavi_tpu.eval.clustering import (
    cluster_accuracy,
    clustering_report,
    entropy_purity,
    hungarian_match,
)


def test_hungarian_perfect_permutation():
    rng = np.random.default_rng(0)
    targets = rng.integers(0, 5, 200)
    perm = np.array([3, 4, 0, 2, 1])
    preds = perm[targets]
    match = hungarian_match(preds, targets, 5)
    # match maps pred cluster -> target class; must invert perm
    mapping = dict(match)
    for cls in range(5):
        assert mapping[perm[cls]] == cls
    assert cluster_accuracy(preds, targets, 5) == 1.0


def test_cluster_accuracy_with_noise():
    rng = np.random.default_rng(1)
    targets = rng.integers(0, 4, 1000)
    preds = targets.copy()
    flip = rng.random(1000) < 0.1
    preds[flip] = rng.integers(0, 4, flip.sum())
    acc = cluster_accuracy(preds, targets, 4)
    assert 0.85 < acc < 1.0


def test_entropy_purity_pure_clusters():
    targets = np.repeat(np.arange(3), 10)
    preds = np.repeat(np.arange(3), 10)
    ent, pur = entropy_purity(preds, targets)
    assert ent == 0.0
    assert pur == 1.0


def test_clustering_report_keys():
    rng = np.random.default_rng(2)
    targets = rng.integers(0, 6, 300)
    preds = rng.integers(0, 6, 300)
    rep = clustering_report(preds, targets, 6)
    for k in ("nmi", "anmi", "ari", "entropy", "purity", "accuracy"):
        assert k in rep
    assert rep["nmi"] < 0.2  # random labels carry no information
