"""Experiment logging: per-process file logs with elapsed-time prefixes and a
pandas training-stats pickle.

Capability parity with /root/reference/src/logger.py:15-95 (rank-suffixed
file handlers, elapsed-time prefix, epoch-stats pickle) — implemented with
stdlib logging idioms: a ``logging.Filter`` injects the elapsed field and a
plain format string renders the line. Line layout is
``LEVEL - date time - H:MM:SS - message`` (continuation lines are indented
four spaces rather than prefix-aligned; see docs/DEVIATIONS.md). In
single-controller JAX the "rank" is ``jax.process_index()``.
"""

from __future__ import annotations

import logging
import os
import time
from pathlib import Path

import pandas as pd

_FMT = "%(levelname)s - %(asctime)s - %(elapsed)s - %(message)s"
_DATEFMT = "%x %X"
_CONTINUATION_INDENT = "\n    "


class _ElapsedFilter(logging.Filter):
    """Attaches ``record.elapsed`` = wall time since logger creation, as
    H:MM:SS (logging filters are the stdlib hook for computed fields)."""

    def __init__(self, t0: float):
        super().__init__()
        self.t0 = t0

    def filter(self, record: logging.LogRecord) -> bool:
        dt = max(int(record.created - self.t0), 0)
        record.elapsed = "{}:{:02d}:{:02d}".format(
            dt // 3600, dt % 3600 // 60, dt % 60
        )
        return True


class _IndentingFormatter(logging.Formatter):
    """Indents continuation lines of multi-line messages so log files stay
    line-greppable (one prefixed line per record head)."""

    def format(self, record: logging.LogRecord) -> str:
        out = super().format(record)
        if "\n" in out:
            head, _, rest = out.partition("\n")
            out = head + _CONTINUATION_INDENT + rest.replace(
                "\n", _CONTINUATION_INDENT
            )
        return out


def create_logger(filepath: str | None, rank: int = 0) -> logging.Logger:
    """Rank-0 writes ``train.log``; every rank writes ``train.log-{rank}``;
    console shows INFO on rank 0 only."""
    log = logging.getLogger()
    log.handlers.clear()
    log.setLevel(logging.DEBUG)
    # library loggers (jax cache-key tracing etc.) flood DEBUG; cap at INFO
    for noisy in ("jax", "orbax", "flax", "absl"):
        logging.getLogger(noisy).setLevel(logging.INFO)

    t0 = time.time()
    elapsed = _ElapsedFilter(t0)
    formatter = _IndentingFormatter(_FMT, datefmt=_DATEFMT)

    handlers: list[logging.Handler] = []
    if filepath is not None:
        target = f"{filepath}-{rank}" if rank > 0 else filepath
        Path(target).parent.mkdir(parents=True, exist_ok=True)
        fh = logging.FileHandler(target, "a")
        fh.setLevel(logging.DEBUG)
        handlers.append(fh)
    if rank == 0:
        ch = logging.StreamHandler()
        ch.setLevel(logging.INFO)
        handlers.append(ch)
    for h in handlers:
        h.addFilter(elapsed)
        h.setFormatter(formatter)
        log.addHandler(h)

    log.reset_time = t0  # type: ignore[attr-defined]
    return log


class PDStats:
    """Epoch-level stats appended to a pandas DataFrame pickle
    (reference ``PD_Stats`` contract: same path, resume-compatible), with a
    column-schema check on resume."""

    def __init__(self, path: str, columns):
        self.path = path
        self.columns = list(columns)
        if os.path.isfile(path):
            self.stats = pd.read_pickle(path)
            if list(self.stats.columns) != self.columns:
                raise ValueError(
                    f"stats file {path} has columns "
                    f"{list(self.stats.columns)}, expected {self.columns}"
                )
        else:
            self.stats = pd.DataFrame(columns=self.columns)

    def update(self, row, save: bool = True):
        new = pd.DataFrame([list(row)], columns=self.columns)
        self.stats = (
            new if self.stats.empty
            else pd.concat([self.stats, new], ignore_index=True)
        )
        if save:
            self.stats.to_pickle(self.path)
