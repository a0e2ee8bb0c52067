#!/usr/bin/env python
"""XLA flag + batch-size sweep on the flagship train step.

The composed conv graph runs ~70 TFLOP/s effective (BASELINE.md stage
breakdown) and hand kernels are closed — the remaining lever is XLA's own
compiler knobs. This sweeps the well-known TPU flags (latency-hiding
scheduler, scoped-VMEM budget) plus intermediate batch sizes, one
subprocess per config (flags are process-level), reusing bench.py as the
measurement harness.

Detection canary: `vmem_tiny` (4 MiB scoped VMEM) MUST clearly regress if
client-side XLA_FLAGS reach the compiler at all — this environment
compiles remotely (PALLAS_AXON_REMOTE_COMPILE=1), so flag propagation is
not a given. If the canary matches control, flag results are meaningless
and the sweep says so.

Run (default env, ONE process at a time; first compiles are slow):
    python experiments/xla_flag_sweep.py
"""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CONFIGS = [
    ("control_bs16", [], ""),
    ("vmem_tiny_canary", [], "--xla_tpu_scoped_vmem_limit_kib=4096"),
    ("bs24", ["--batch_size", "24"], ""),
    ("bs20", ["--batch_size", "20"], ""),
    ("lhs_on", [], "--xla_tpu_enable_latency_hiding_scheduler=true"),
    ("lhs_off", [], "--xla_tpu_enable_latency_hiding_scheduler=false"),
    ("vmem_32m", [], "--xla_tpu_scoped_vmem_limit_kib=32768"),
    ("vmem_64m", [], "--xla_tpu_scoped_vmem_limit_kib=65536"),
]


def run_one(tag, extra_args, xla_flags):
    env = dict(os.environ)
    base = env.get("XLA_FLAGS", "")
    env["XLA_FLAGS"] = (base + " " + xla_flags).strip()
    cmd = [sys.executable, os.path.join(REPO, "bench.py"),
           "--steps", "15"] + extra_args
    print(f"== {tag}: XLA_FLAGS='{env['XLA_FLAGS']}' {' '.join(cmd[1:])}",
          flush=True)
    proc = subprocess.run(cmd, env=env, cwd=REPO, capture_output=True,
                          text=True, timeout=1500)
    line = None
    for ln in (proc.stdout or "").splitlines():
        if ln.startswith("{"):
            line = json.loads(ln)
    if proc.returncode != 0 or line is None:
        print(f"   {tag}: FAILED rc={proc.returncode}\n"
              f"{(proc.stderr or '')[-800:]}", flush=True)
        return None
    print(f"   {tag}: {line['value']} clips/s/chip", flush=True)
    return line["value"]


def main():
    results = {}
    for tag, extra, flags in CONFIGS:
        results[tag] = run_one(tag, extra, flags)
    ctrl = results.get("control_bs16")
    canary = results.get("vmem_tiny_canary")
    flags_propagate = (
        ctrl is not None and canary is not None and canary < 0.9 * ctrl
    )
    print(json.dumps({
        "results": results,
        "flags_propagate": flags_propagate,
        "note": ("flag rows meaningful" if flags_propagate else
                 "canary did not regress -> client XLA_FLAGS do NOT reach "
                 "the remote compiler; only batch-size rows meaningful"),
    }))


if __name__ == "__main__":
    main()
