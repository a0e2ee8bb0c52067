#!/usr/bin/env python
"""Analytic train-step FLOPs for the flagship bench config (VERDICT r3 #4).

Computes FLOPs per clip for the full fwd+bwd train step via XLA's
compiled-HLO cost analysis, evaluated at two batch sizes and differenced
(slope) so batch-independent constant work (optimizer update, etc.) drops
out:

    flops_per_clip = (flops(b2) - flops(b1)) / (b2 - b1)

Run on CPU (the HLO-level FLOP count is backend-independent; conv/dot
FLOPs are counted from shapes, not from the backend's schedule):

    PYTHONPATH=/root/repo JAX_PLATFORMS=cpu python experiments/step_flops.py

The resulting constants are embedded in bench.py
(ANALYTIC_STEP_FLOPS_PER_CLIP) so the TPU bench can report effective
TFLOP/s and MFU against the v5e bf16 peak without relying on the axon
relay supporting cost_analysis. Re-run this script whenever the flagship
architecture changes.

Reference scale anchor: SURVEY.md §6 north-star metrics.
"""

from __future__ import annotations

import argparse
import json


def step_flops(batch_size: int, num_frames: int, crop: int, headcount: int,
               clusters: int, aligned: bool) -> float:
    import jax
    import jax.numpy as jnp
    import numpy as np

    from selavi_tpu.models import load_model
    from selavi_tpu.train.optim import make_optimizer
    from selavi_tpu.train.state import create_train_state
    from selavi_tpu.train.step import make_train_step

    model = load_model(
        headcount=headcount, num_classes=clusters, dtype=jnp.bfloat16,
        midplanes_mode="aligned" if aligned else "parity",
    )
    b = batch_size
    video = jnp.asarray(np.zeros(
        (b, num_frames, crop, crop, 3), np.uint8
    ))
    audio = jnp.asarray(np.zeros((b, 257, 99, 1), np.float32))
    labels = jnp.zeros((b, headcount), jnp.int32)
    tx = make_optimizer(0.01, 1e-5, multiplier=1.0,
                        warmup_epochs=10, batches_per_epoch=100)
    rng = jax.random.PRNGKey(0)
    state = create_train_state(
        model, tx, rng, (2,) + video.shape[1:], (2, 257, 99, 1)
    )
    step = make_train_step(model, compute_dtype=jnp.bfloat16, donate=False)
    batch = {"video": video, "audio": audio}
    compiled = step.lower(state, batch, labels, rng).compile()
    costs = compiled.cost_analysis()
    if isinstance(costs, (list, tuple)):  # older jax returns [dict]
        costs = costs[0]
    return float(costs["flops"])


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--num_frames", type=int, default=30)
    p.add_argument("--crop", type=int, default=112)
    p.add_argument("--headcount", type=int, default=10)
    p.add_argument("--clusters", type=int, default=309)
    p.add_argument("--b1", type=int, default=2)
    p.add_argument("--b2", type=int, default=4)
    args = p.parse_args()

    out = {}
    for aligned in (True, False):
        f1 = step_flops(args.b1, args.num_frames, args.crop,
                        args.headcount, args.clusters, aligned)
        f2 = step_flops(args.b2, args.num_frames, args.crop,
                        args.headcount, args.clusters, aligned)
        per_clip = (f2 - f1) / (args.b2 - args.b1)
        key = "aligned" if aligned else "parity"
        out[key] = {
            "flops_per_clip": per_clip,
            "flops_b1": f1,
            "flops_b2": f2,
            "const_overhead_flops": f1 - per_clip * args.b1,
        }
        print(f"{key}: {per_clip/1e9:.2f} GFLOP/clip "
              f"(const overhead {out[key]['const_overhead_flops']/1e9:.2f} "
              f"GFLOP/step)")
    print(json.dumps(out))


if __name__ == "__main__":
    main()
