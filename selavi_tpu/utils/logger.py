"""Experiment logging: per-process file logs with elapsed-time prefixes and a
pandas training-stats pickle.

Capability parity with /root/reference/src/logger.py:15-95 (``create_logger``
with rank-suffixed file handlers + ``PD_Stats``). In single-controller JAX
the "rank" is ``jax.process_index()``.
"""

from __future__ import annotations

import logging
import os
import time
from datetime import timedelta
from pathlib import Path

import pandas as pd


class _ElapsedFormatter(logging.Formatter):
    """``LEVEL - time - elapsed - message`` (reference LogFormatter)."""

    def __init__(self):
        super().__init__()
        self.start_time = time.time()

    def format(self, record):
        elapsed = timedelta(seconds=round(record.created - self.start_time))
        prefix = "%s - %s - %s" % (
            record.levelname,
            time.strftime("%x %X"),
            elapsed,
        )
        message = record.getMessage()
        message = message.replace("\n", "\n" + " " * (len(prefix) + 3))
        return "%s - %s" % (prefix, message)


def create_logger(filepath: str | None, rank: int = 0) -> logging.Logger:
    """Rank-0 writes ``train.log``; every rank writes ``train.log-{rank}``;
    console shows INFO on rank 0 only."""
    log = logging.getLogger()
    log.handlers.clear()
    log.setLevel(logging.DEBUG)
    # library loggers (jax cache-key tracing etc.) flood DEBUG; cap at INFO
    for noisy in ("jax", "orbax", "flax", "absl"):
        logging.getLogger(noisy).setLevel(logging.INFO)
    formatter = _ElapsedFormatter()

    if filepath is not None:
        if rank > 0:
            filepath = "%s-%i" % (filepath, rank)
        Path(filepath).parent.mkdir(parents=True, exist_ok=True)
        fh = logging.FileHandler(filepath, "a")
        fh.setLevel(logging.DEBUG)
        fh.setFormatter(formatter)
        log.addHandler(fh)

    if rank == 0:
        ch = logging.StreamHandler()
        ch.setLevel(logging.INFO)
        ch.setFormatter(formatter)
        log.addHandler(ch)

    log.reset_time = formatter.start_time  # type: ignore[attr-defined]
    return log


class PDStats:
    """Epoch-level stats appended to a pandas DataFrame pickle
    (reference ``PD_Stats``), with a column-schema check on resume."""

    def __init__(self, path: str, columns):
        self.path = path
        if os.path.isfile(path):
            self.stats = pd.read_pickle(path)
            assert list(self.stats.columns) == list(columns)
        else:
            self.stats = pd.DataFrame(columns=columns)

    def update(self, row, save: bool = True):
        self.stats.loc[len(self.stats.index)] = row
        if save:
            self.stats.to_pickle(self.path)
