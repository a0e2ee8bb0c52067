"""Preemption handling: SIGUSR1 flag -> checkpoint written -> clean exit,
and the fresh process resumes (reference utils.py:74-109 + SURVEY §5.3)."""

import os
import signal

import numpy as np
import pytest

from selavi_tpu.config import parse_arguments
from selavi_tpu.data.synthetic import SyntheticAVDataset
from selavi_tpu.parallel.dist import init_signal_handler, signal_received
from selavi_tpu.train.loop import Trainer

# full Trainer runs + signal-driven checkpoint/exit — slow tier; the merge gate (plain pytest) still runs these
pytestmark = pytest.mark.slow


def test_signal_flag_roundtrip():
    init_signal_handler()
    assert not signal_received()
    os.kill(os.getpid(), signal.SIGUSR1)
    assert signal_received()
    # SIGTERM is ignored, not fatal, and does not set the flag
    init_signal_handler()
    os.kill(os.getpid(), signal.SIGTERM)
    assert not signal_received()


def test_preemption_checkpoints_and_exits(tmp_path):
    argv = [
        "--ds_name", "synthetic", "--num_data_samples", "16",
        "--num_frames", "2", "--train_crop_size", "32",
        "--aud_sample_rate", "16000", "--aud_spec_type", "1",
        "--epochs", "1", "--batch_size", "1", "--nopts", "1",
        "--headcount", "1", "--mlp_dim", "4", "--match", "false",
        "--workers", "0", "--compute_dtype", "float32",
        "--bn_warmup_batches", "0", "--dump_path", str(tmp_path),
    ]
    args = parse_arguments().parse_args(argv)
    dataset = SyntheticAVDataset(
        num_samples=16, num_classes=2, num_frames=2, crop_size=32,
        aud_sample_rate=16000,
    )
    trainer = Trainer(args, dataset)
    init_signal_handler()
    try:
        os.kill(os.getpid(), signal.SIGUSR1)  # preempt before first step
        with pytest.raises(SystemExit):
            trainer.train_epoch(0)
        assert os.path.isfile(
            os.path.join(str(tmp_path), "checkpoint.msgpack")
        )

        # a fresh trainer resumes from the preemption checkpoint AT the
        # interrupted epoch: a mid-epoch preemption must re-run the
        # epoch's remaining batches (and its scheduled SK steps), not
        # mark them done
        trainer2 = Trainer(args, dataset)
        start = trainer2.resume()
        assert start == 0
    finally:
        init_signal_handler()  # clear the flag for later tests


def test_memory_watchdog_trips_preemption_path():
    """Host-RSS watchdog (dist.init_memory_watchdog): above the limit,
    memory_pressure() reports True AND arms the same flag the SIGUSR1
    preemption path polls, so the train loop checkpoints and exits
    cleanly instead of being OOM-killed (extension beyond reference
    utils.py:74-109 — see docstring for why)."""
    from selavi_tpu.parallel import dist

    try:
        dist.init_memory_watchdog(0)  # disabled
        assert dist.memory_pressure() is False

        rss = dist.host_rss_bytes()
        assert rss > 10_000_000  # this test process is well above 10 MB

        dist.init_memory_watchdog((rss + 10e9) / 1e9)  # above current
        assert dist.memory_pressure() is False
        assert dist.signal_received() is False

        dist.init_memory_watchdog(0.001)  # 1 MB: below current RSS
        assert dist.memory_pressure() is True
        assert dist.signal_received() is True  # preemption path armed
    finally:
        dist.init_memory_watchdog(0)
        init_signal_handler()  # clear the flag for later tests
