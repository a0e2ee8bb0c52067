"""Multi-host initialization and preemption handling.

TPU-native replacement for the reference's L0 runtime:

* ``init_distributed_mode`` (reference utils.py:112-152): on a TPU pod,
  ``jax.distributed.initialize()`` forms the runtime from the TPU
  environment — no NCCL URL / SLURM env parsing needed. Safe to call on a
  single host (no-op).
* signal handling (reference utils.py:74-109): SIGUSR1/SIGTERM set a flag
  polled at safe points in the train loop; the loop then writes a final
  checkpoint and exits cleanly (the pod scheduler restarts the job, which
  resumes from the checkpoint) — the analog of SLURM ``scontrol requeue``.
"""

from __future__ import annotations

import logging
import os
import signal

import jax

logger = logging.getLogger(__name__)

_SIGNAL_FLAG = {"received": False}


def init_distributed_mode(args=None) -> tuple[int, int]:
    """Initialize multi-host JAX if running on a multi-process deployment.

    Returns (process_index, process_count). Also records them on ``args``
    as ``rank`` / ``world_size`` for reference-CLI compatibility.
    """
    if (
        "JAX_PROCESS_COUNT" in os.environ
        or "MEGASCALE_COORDINATOR_ADDRESS" in os.environ
    ):
        try:
            jax.distributed.initialize()
        except Exception as e:  # already initialized or single-host
            logger.info("jax.distributed.initialize skipped: %s", e)
    rank = jax.process_index()
    world_size = jax.process_count()
    if args is not None:
        args.rank = rank
        args.world_size = world_size
    return rank, world_size


def _handler(signum, frame):
    logger.warning("signal %d received; will checkpoint and exit", signum)
    _SIGNAL_FLAG["received"] = True


def init_signal_handler():
    """Install SIGUSR1 preemption-warning handler; ignore bare SIGTERM the
    same way the reference does (utils.py:74-94)."""
    _SIGNAL_FLAG["received"] = False
    signal.signal(signal.SIGUSR1, _handler)
    signal.signal(signal.SIGTERM, lambda s, f: logger.info("sigterm ignored"))


def signal_received() -> bool:
    return _SIGNAL_FLAG["received"]


def sync_hosts(name: str = "sync"):
    """Host-phase barrier (the reference's dist.barrier analog). SPMD device
    code needs no barriers; this is only for host-side phase boundaries."""
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils

        multihost_utils.sync_global_devices(name)
