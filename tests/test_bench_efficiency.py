"""bench.py absolute-efficiency reporting (VERDICT r3 #4).

The JSON line the driver records must carry effective TFLOP/s and MFU at
the flagship shape, derived from the analytic per-clip step FLOPs
(experiments/step_flops.py XLA cost analysis) and the public v5e bf16
peak. Pure-arithmetic test — no TPU needed.
"""

import importlib.util
import os

_spec = importlib.util.spec_from_file_location(
    "bench", os.path.join(os.path.dirname(__file__), "..", "bench.py")
)
bench = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(bench)


def test_flagship_shape_reports_mfu():
    fields = bench.efficiency_fields(190.9, True, (30, 112, 10, 309))
    # 190.9 clips/s * 423.02 GFLOP/clip = 80.75 TFLOP/s
    assert abs(fields["tflops_effective"] - 80.8) < 0.2
    # vs 197 TFLOP/s v5e bf16 peak -> ~41% MFU
    assert abs(fields["mfu_vs_v5e_bf16_peak"] - 0.41) < 0.005
    # parity widths burn more FLOPs per clip at the same rate
    parity = bench.efficiency_fields(190.9, False, (30, 112, 10, 309))
    assert parity["tflops_effective"] > fields["tflops_effective"]


def test_non_flagship_shapes_report_nothing():
    assert bench.efficiency_fields(100.0, True, (8, 64, 10, 256)) == {}
    assert bench.efficiency_fields(100.0, True, (30, 112, 1, 28)) == {}


def test_constants_sane():
    # analytic FLOPs: ~0.4 TFLOP/clip fwd+bwd for R(2+1)D-18 + ResNet-9
    # at 30x112x112 — order-of-magnitude pin so accidental edits
    # (e.g. dropping the 1e9) fail loudly
    for v in bench.ANALYTIC_STEP_FLOPS_PER_CLIP.values():
        assert 1e11 < v < 1e12
    assert 100.0 < bench.V5E_BF16_PEAK_TFLOPS < 1000.0
