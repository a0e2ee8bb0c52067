"""Genuine multi-process (2 hosts x 4 virtual devices) regression tests.

The 8-device single-process suite cannot catch cross-process desyncs (the
r1 loader bug deadlocked only with jax.process_count() > 1). These tests
spawn two real jax.distributed CPU processes — the JAX-native analog of
the reference's multi-node validation under SLURM (scripts/master.sh).
"""

import os
import socket
import subprocess
import sys

import pytest


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def _scrubbed_env() -> dict:
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["PYTHONPATH"] = repo
    env.pop("XLA_FLAGS", None)
    env.pop("JAX_PLATFORMS", None)  # the worker sets its own
    return env


@pytest.mark.parametrize("n_samples", [16, 17])  # N % world_size in {0, 1}
def test_two_process_loader_and_sharded_sk(n_samples):
    port = _free_port()
    worker = os.path.join(os.path.dirname(__file__), "mp_worker.py")
    procs = [
        subprocess.Popen(
            [sys.executable, worker, str(pid), "2", str(port),
             str(n_samples)],
            env=_scrubbed_env(),
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            text=True,
        )
        for pid in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=600)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail(
                "multi-process run deadlocked (per-rank batch-count skew?)"
            )
        outs.append(out)
    digests, losses, wsums = [], [], []
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"pid {pid} failed:\n{out}"
        assert "MP_OK" in out, out
        digests.append(out.split("digest=")[1].split()[0])
        losses.append(out.split("loss=")[1].split()[0])
        wsums.append(out.split("wsum=")[1].split()[0])
    # both processes computed identical selflabels (SPMD consistency)
    assert digests[0] == digests[1], digests
    # and the cross-process train step kept loss + params bit-identical
    assert losses[0] == losses[1], losses
    assert wsums[0] == wsums[1], wsums
