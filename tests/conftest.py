"""Test harness: force an 8-device CPU mesh regardless of the host's
accelerator setup. The axon sitecustomize may have eagerly initialized a TPU
backend before pytest starts, so clearing the backend cache after flipping
the platform config is required (verified: registration-then-clear yields a
clean 8-device CPU runtime)."""

import os

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
if "--xla_force_host_platform_device_count" not in os.environ.get(
    "XLA_FLAGS", ""
):
    os.environ["XLA_FLAGS"] += " --xla_force_host_platform_device_count=8"
# Few-core hosts: XLA:CPU in-process collectives SIGABRT if all virtual
# device threads can't reach a rendezvous within 40 s (compile/dispatch
# contention on one core). Liveness knob only.
if "collective_call_terminate" not in os.environ["XLA_FLAGS"]:
    os.environ["XLA_FLAGS"] += (
        " --xla_cpu_collective_call_warn_stuck_timeout_seconds=300"
        " --xla_cpu_collective_call_terminate_timeout_seconds=1200"
    )
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
try:
    import jax.extend.backend as _jeb

    _jeb.clear_backends()
except Exception:
    pass

assert jax.default_backend() == "cpu", jax.default_backend()

# persistent compile cache: model compiles dominate suite wall time
# (~30 min cold); cache keys hash the traced HLO, so code changes miss
# safely and repeat runs reuse everything unchanged
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_tests")
