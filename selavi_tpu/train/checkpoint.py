"""Single-file checkpointing with SeLaVi-complete state.

Reference contract (/root/reference/main.py:222-242, utils.py:219-261): one
``checkpoint.pth.tar`` per epoch holding ``{epoch+1, dist (cached Gaussian
marginals), model, optimizer, selflabels}``, archived every
``checkpoint_freq`` epochs; resume restores all of it and fast-forwards the
SK schedule / LR scheduler.

Implementation: flax msgpack serialization of the device pytree + pickled
host state, in one file. (orbax is available but writes directory trees;
the single-file layout keeps the reference's copy-to-archive semantics
trivial and makes checkpoints portable.)
"""

from __future__ import annotations

import logging
import os
import pickle
import shutil
import threading
from typing import Optional

import jax
import numpy as np
from flax import serialization

from selavi_tpu.selflabel.marginals import MarginalState
from selavi_tpu.train.state import SelfLabelState, TrainState

logger = logging.getLogger(__name__)

CKPT_NAME = "checkpoint.msgpack"

_pending_lock = threading.Lock()
_pending_write: Optional[threading.Thread] = None


def wait_for_pending_checkpoint():
    """Join any in-flight async checkpoint write. Call before process exit
    (preemption) and before reading a just-written checkpoint."""
    with _pending_lock:
        t = _pending_write
    if t is not None:
        t.join()


def save_checkpoint(
    dump_path: str,
    state: TrainState,
    sl_state: SelfLabelState,
    epoch: int,
    checkpoint_freq: int = 5,
    total_epochs: Optional[int] = None,
    dump_checkpoints: Optional[str] = None,
    async_write: bool = False,
    resume_epoch: Optional[int] = None,
):
    """Write the checkpoint; rank 0 does the IO.

    The device->host fetch is a COLLECTIVE when state is sharded across
    hosts (head stacks over 'model' on a multi-host mesh), so every
    process enters; only process 0 serializes and writes. With
    ``async_write`` the serialization + disk write happen on a background
    thread over the host snapshot (the step loop continues immediately —
    at scale a few-hundred-MB synchronous save per epoch stalls every
    chip); at most one write is in flight, and the published file is
    still atomically replaced.
    """
    from selavi_tpu.parallel.mesh import fetch_to_host

    global _pending_write
    device_state = {
        "step": state.step,
        "params": state.params,
        "batch_stats": state.batch_stats,
        "opt_state": state.opt_state,
    }
    host_state = jax.tree.map(fetch_to_host, device_state)  # all processes
    if jax.process_index() != 0:
        return
    if resume_epoch is None:
        resume_epoch = epoch + 1  # epoch completed
    host_sl = {
        # resume_epoch == epoch (mid-epoch preemption): restart AT this
        # epoch so its remaining batches + scheduled SK steps re-run
        "epoch": resume_epoch,
        "selflabels": np.asarray(sl_state.selflabels).copy(),
        "dist": sl_state.marginals.to_dict(),
        "sk_counter": sl_state.sk_counter,
    }

    def _write():
        payload = dict(
            host_sl, device=serialization.to_bytes(host_state)
        )
        os.makedirs(dump_path, exist_ok=True)
        path = os.path.join(dump_path, CKPT_NAME)
        tmp = path + ".tmp"
        with open(tmp, "wb") as f:
            pickle.dump(payload, f)
        os.replace(tmp, path)
        if dump_checkpoints and resume_epoch > epoch and (
            epoch % checkpoint_freq == 0
            or (total_epochs is not None and epoch == total_epochs - 1)
        ):
            shutil.copyfile(
                path,
                os.path.join(dump_checkpoints, f"ckp-{epoch}.msgpack"),
            )

    wait_for_pending_checkpoint()  # at most one write in flight
    if async_write:
        t = threading.Thread(
            target=_write, daemon=True, name=f"ckpt-write-ep{epoch}"
        )
        with _pending_lock:
            _pending_write = t
        t.start()
    else:
        _write()


def restore_checkpoint(
    dump_path: str, state: TrainState, sl_state: SelfLabelState
) -> tuple[TrainState, SelfLabelState, int]:
    """Restore in place of the fresh (target-structured) state. Returns
    (state, sl_state, start_epoch); untouched when no checkpoint exists."""
    wait_for_pending_checkpoint()
    path = (
        dump_path
        if dump_path.endswith(".msgpack")
        else os.path.join(dump_path, CKPT_NAME)
    )
    if not os.path.isfile(path):
        return state, sl_state, 0
    logger.info("Found checkpoint at %s", path)
    with open(path, "rb") as f:
        payload = pickle.load(f)
    target = {
        "step": jax.device_get(state.step),
        "params": jax.device_get(state.params),
        "batch_stats": jax.device_get(state.batch_stats),
        "opt_state": jax.device_get(state.opt_state),
    }
    device_state = serialization.from_bytes(target, payload["device"])
    state = state.replace(
        step=jax.numpy.asarray(device_state["step"]),
        params=device_state["params"],
        batch_stats=device_state["batch_stats"],
        opt_state=device_state["opt_state"],
    )
    sl_state = SelfLabelState(
        selflabels=np.asarray(payload["selflabels"]),
        marginals=MarginalState.from_dict(payload["dist"]),
        sk_counter=int(payload["sk_counter"]),
        epoch=int(payload["epoch"]),
    )
    return state, sl_state, int(payload["epoch"])


def load_model_parameters(state: TrainState, ckpt_path: str) -> TrainState:
    """Eval-tool loader: restore params/batch_stats only
    (reference ``load_model_parameters``, utils.py:264-274)."""
    with open(ckpt_path, "rb") as f:
        payload = pickle.load(f)
    target = {
        "step": jax.device_get(state.step),
        "params": jax.device_get(state.params),
        "batch_stats": jax.device_get(state.batch_stats),
        "opt_state": jax.device_get(state.opt_state),
    }
    device_state = serialization.from_bytes(target, payload["device"])
    return state.replace(
        params=device_state["params"],
        batch_stats=device_state["batch_stats"],
    )
