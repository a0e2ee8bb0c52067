"""Driver entry points: entry() must return a jittable forward and
dryrun_multichip must pass from an arbitrary environment (it re-execs
itself into a scrubbed CPU subprocess - the round-1 driver failure mode
was attaching to the host's real accelerator)."""

import sys
import pytest

import jax
import numpy as np

sys.path.insert(0, "/root/repo")

import __graft_entry__ as graft  # noqa: E402

# driver entries incl. the self-isolating multichip dryrun subprocess — slow tier; the merge gate (plain pytest) still runs these
pytestmark = pytest.mark.slow


def test_entry_compiles_and_runs():
    fn, args = graft.entry()
    out_v, out_a = jax.jit(fn)(*args)
    assert out_v.shape[0] == 10 and out_v.shape[-1] == 309
    assert np.isfinite(np.asarray(out_v, np.float32)).all()


def test_dryrun_multichip_self_isolates():
    # would raise on any failure; prints the child's OK line
    graft.dryrun_multichip(4)
