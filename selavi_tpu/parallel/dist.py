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


_MEM_WATCHDOG = {"limit_bytes": 0, "page": 0}


def init_memory_watchdog(limit_gb: float):
    """Arm the host-RSS watchdog: once :func:`memory_pressure` sees RSS
    above ``limit_gb``, the train loop checkpoints and exits cleanly via
    the same path as a SIGUSR1 preemption, so an outer requeue loop
    resumes at the interrupted epoch instead of losing work to an OOM
    kill. The reference has only the signal path (utils.py:74-109); this
    extension exists because long runs on some hosts grow RSS from causes
    outside the trainer's control (e.g. the dev relay client retains
    every H2D buffer — measured 1:1 with transferred bytes)."""
    import resource

    _MEM_WATCHDOG["limit_bytes"] = int(limit_gb * 1e9)
    _MEM_WATCHDOG["page"] = resource.getpagesize()
    if limit_gb > 0:
        logger.info("host-RSS watchdog armed at %.1f GB", limit_gb)


def host_rss_bytes() -> int:
    """Current RSS from /proc/self/statm (no psutil dependency; ~µs)."""
    page = _MEM_WATCHDOG["page"] or 4096
    try:
        with open("/proc/self/statm") as f:
            return int(f.read().split()[1]) * page
    except OSError:  # non-Linux: watchdog inert
        return 0


def memory_pressure() -> bool:
    limit = _MEM_WATCHDOG["limit_bytes"]
    if not limit:
        return False
    rss = host_rss_bytes()
    if rss >= limit:
        logger.warning(
            "host RSS %.1f GB >= limit %.1f GB; will checkpoint and exit "
            "for requeue",
            rss / 1e9,
            limit / 1e9,
        )
        _SIGNAL_FLAG["received"] = True  # reuse the preemption exit path
        return True
    return False


def sync_hosts(name: str = "sync"):
    """Host-phase barrier (the reference's dist.barrier analog). SPMD device
    code needs no barriers; this is only for host-side phase boundaries."""
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils

        multihost_utils.sync_global_devices(name)
