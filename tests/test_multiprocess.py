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

# real 2-process jax.distributed runs — slow tier; the merge gate (plain pytest) still runs these
pytestmark = pytest.mark.slow


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
            # generous bound: contended 1-core hosts take >600 s through
            # the cold cross-process compiles (r4); a real deadlock still
            # hangs forever, so detection is preserved
            out, _ = p.communicate(timeout=1500)
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


def _run_eval_tool(tool: str, nproc: int, out_path: str, timeout=1500):
    worker = os.path.join(os.path.dirname(__file__), "mp_eval_worker.py")
    port = _free_port()
    procs = [
        subprocess.Popen(
            [sys.executable, worker, tool, str(pid), str(nproc), str(port),
             out_path],
            env=_scrubbed_env(),
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            text=True,
        )
        for pid in range(nproc)
    ]
    for pid, p in enumerate(procs):
        try:
            out, _ = p.communicate(timeout=timeout)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail(f"{tool} x{nproc} deadlocked")
        assert p.returncode == 0, f"{tool} pid {pid} failed:\n{out}"
        assert "MP_EVAL_OK" in out


@pytest.mark.parametrize("tool", ["get_clusters", "retrieval", "finetune"])
def test_two_process_eval_tools(tool, tmp_path):
    """Pod-sharded eval CLIs: a 2-process run must produce the same
    dump/metrics as a 1-process run on the same data (VERDICT r2 item 4;
    reference get_clusters.py:57-148,257-265 sharded inference)."""
    out1 = str(tmp_path / f"{tool}_1proc.out")
    out2 = str(tmp_path / f"{tool}_2proc.out")
    _run_eval_tool(tool, 1, out1)
    _run_eval_tool(tool, 2, out2)

    if tool == "get_clusters":
        import pickle

        import numpy as np

        with open(out1, "rb") as f:
            a = pickle.load(f)
        with open(out2, "rb") as f:
            b = pickle.load(f)
        np.testing.assert_array_equal(np.asarray(a[1]), np.asarray(b[1]))
        for head_a, head_b in zip(a[0] + a[2], b[0] + b[2]):
            np.testing.assert_allclose(
                np.asarray(head_a), np.asarray(head_b), atol=2e-4,
                rtol=1e-4,
            )
    else:
        import json

        with open(out1) as f:
            a = json.load(f)
        with open(out2) as f:
            b = json.load(f)
        assert a == b, (a, b)
