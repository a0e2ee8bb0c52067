"""Coverage for observability utilities and remaining eval helpers."""

import numpy as np
import pytest

from selavi_tpu.eval.clustering import best_head_labels
from selavi_tpu.utils.logger import PDStats, create_logger
from selavi_tpu.utils.meters import (
    MovingAverage,
    QueueAverage,
    aggregate_video_accuracy,
    topk_accuracy,
)


def test_pdstats_roundtrip_and_schema_check(tmp_path):
    path = str(tmp_path / "stats0.pkl")
    stats = PDStats(path, ["epoch", "loss"])
    stats.update([0, 1.5])
    stats.update([1, 1.2])
    # reload with the same schema succeeds and keeps rows
    stats2 = PDStats(path, ["epoch", "loss"])
    assert len(stats2.stats) == 2
    # schema mismatch is rejected (reference PD_Stats contract)
    with pytest.raises(ValueError):
        PDStats(path, ["epoch", "accuracy"])


def test_create_logger_writes_rank_files(tmp_path):
    log = create_logger(str(tmp_path / "train.log"), rank=0)
    log.info("hello rank0")
    assert (tmp_path / "train.log").exists()
    log1 = create_logger(str(tmp_path / "train.log"), rank=1)
    log1.info("hello rank1")
    assert (tmp_path / "train.log-1").exists()
    # restore a clean rank-0 logger for subsequent tests
    create_logger(None, rank=0)


def test_moving_and_queue_averages():
    ma = MovingAverage(inertia=0.5)
    ma.update(10.0)
    ma.update(20.0)
    assert abs(ma.avg - (0.5 * (0.5 * 0 + 0.5 * 10) + 0.5 * 20)) < 1e-9
    qa = QueueAverage()
    qa.update(1.0)
    assert qa.val == 1.0
    qa.update(3.0)
    assert qa.val == 5.0  # linear extrapolation 2*3-1
    qa.update(5.0)
    assert qa.val == 7.0  # 2*5-3


def test_topk_and_video_aggregation():
    out = np.array([[0.1, 0.9], [0.8, 0.2], [0.3, 0.7]])
    target = np.array([1, 0, 0])
    acc1, acc2 = topk_accuracy(out, target, (1, 2))
    assert abs(acc1 - 200 / 3) < 1e-6
    assert acc2 == 100.0
    # two clips of video 0 average to the correct class
    sm = {0: [np.array([0.9, 0.1]), np.array([0.2, 0.8])],
          1: [np.array([0.1, 0.9])]}
    labels = {0: 0, 1: 1}
    (v1,) = aggregate_video_accuracy(sm, labels, topk=(1,))
    assert v1 == 100.0


def test_best_head_labels_picks_informative_head():
    rng = np.random.default_rng(0)
    n, k = 120, 4
    truth = rng.integers(0, k, n)
    # head 0: random logits; head 1: logits aligned with truth
    logits_rand = rng.standard_normal((n, k))
    logits_good = np.full((n, k), -3.0)
    logits_good[np.arange(n), truth] = 3.0
    lv = np.stack([logits_rand, logits_good])
    la = np.stack([logits_rand, logits_good])
    labels, best = best_head_labels(lv, la, truth)
    assert best == 1
    # labels from the informative head match truth up to permutation: NMI 1
    from sklearn.metrics.cluster import normalized_mutual_info_score

    assert normalized_mutual_info_score(labels, truth) > 0.99


def test_checkpoint_archive_copies(tmp_path):
    """Periodic ckp-{epoch} archives (reference main.py:238-242)."""
    import os

    import jax.numpy as jnp
    import optax

    from selavi_tpu.train.checkpoint import restore_checkpoint, save_checkpoint
    from selavi_tpu.train.state import SelfLabelState, TrainState

    tx = optax.sgd(0.1)
    params = {"w": jnp.ones((3,))}
    state = TrainState(
        step=jnp.zeros((), jnp.int32), params=params, batch_stats={},
        opt_state=tx.init(params), tx=tx,
    )
    sl = SelfLabelState.init(4, 1)
    dump = str(tmp_path)
    arch = str(tmp_path / "checkpoints")
    os.makedirs(arch, exist_ok=True)
    for epoch in range(4):
        save_checkpoint(dump, state, sl, epoch, checkpoint_freq=2,
                        total_epochs=4, dump_checkpoints=arch)
    # archives at epochs 0, 2 (freq) and 3 (last)
    names = sorted(os.listdir(arch))
    assert names == ["ckp-0.msgpack", "ckp-2.msgpack", "ckp-3.msgpack"]
    # the live checkpoint restores
    state2, sl2, start = restore_checkpoint(dump, state, sl)
    assert start == 4
