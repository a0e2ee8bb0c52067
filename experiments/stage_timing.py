#!/usr/bin/env python
"""Per-stage fwd+bwd timing of the video tower on the real chip, plus a
space-to-depth stem probe.

The train step is ~100% video tower (r1). This breaks the tower into
cumulative prefixes (stem, +layer1..+layer4) to find where the 86 ms go,
and times the classic TPU space-to-depth trick on the stem's 7x7/2 conv
(3 input channels waste 125/128 of the MXU's contraction lanes; reshaping
2x2 spatial phases into 12 channels quarters the spatial extent).

Run (default env, ONE process): python experiments/stage_timing.py
"""

import json
import time

import numpy as np


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import flax.linen as nn
    import jax.numpy as jnp

    from selavi_tpu.models.r2plus1d import (
        BN,
        BasicBlock2Plus1D,
        SpatialConv,
        TemporalConv,
    )

    results = {}
    bs, t, c = 16, 30, 112
    dtype = jnp.bfloat16

    class Prefix(nn.Module):
        stages: int  # 0 = stem only, 1..4 = stem + layers 1..n
        s2d: bool = False

        @nn.compact
        def __call__(self, x, train: bool = True):
            if self.s2d:
                b, tt, h, w, ch = x.shape
                x = x.reshape(b, tt, h // 2, 2, w // 2, 2, ch)
                x = x.transpose(0, 1, 2, 4, 3, 5, 6).reshape(
                    b, tt, h // 2, w // 2, 4 * ch
                )
                x = SpatialConv(45, 4, 1, 2, dtype=dtype,
                                name="stem_spatial")(x)
            else:
                x = SpatialConv(45, 7, 2, 3, dtype=dtype,
                                name="stem_spatial")(x)
            x = BN(dtype=dtype, name="stem_bn1")(x, train)
            x = nn.relu(x)
            x = TemporalConv(64, 3, 1, 1, dtype=dtype,
                             name="stem_temporal")(x)
            x = BN(dtype=dtype, name="stem_bn2")(x, train)
            x = nn.relu(x)
            plan = [(64, 64, 1), (64, 128, 2), (128, 256, 2),
                    (256, 512, 2)]
            for stage, (inp, pl, st) in enumerate(plan[: self.stages], 1):
                x = BasicBlock2Plus1D(
                    inp, pl, st, dtype=dtype, midplanes_mode="aligned",
                    name=f"layer{stage}_block0")(x, train)
                x = BasicBlock2Plus1D(
                    pl, pl, 1, dtype=dtype, midplanes_mode="aligned",
                    name=f"layer{stage}_block1")(x, train)
            return jnp.mean(x.astype(jnp.float32), axis=(1, 2, 3))

    video = jnp.asarray(
        np.random.randn(bs, t, c, c, 3).astype(np.float32), dtype
    )
    rng = jax.random.PRNGKey(0)

    def time_fwd_bwd(model, x, label):
        variables = model.init({"params": rng}, x, train=True)

        def loss(params, bstats):
            out, upd = model.apply(
                {"params": params, "batch_stats": bstats}, x, train=True,
                mutable=["batch_stats"],
            )
            return (out ** 2).mean()

        g = jax.jit(jax.grad(loss))
        p, b = variables["params"], variables["batch_stats"]
        gr = g(p, b)
        float(jax.tree.leaves(gr)[0].sum())  # fence through relay
        t0 = time.perf_counter()
        reps = 5
        for _ in range(reps):
            gr = g(p, b)
        float(jax.tree.leaves(gr)[0].sum())
        dt = (time.perf_counter() - t0) / reps
        results[label] = round(dt * 1000, 2)

    for stages in range(5):
        time_fwd_bwd(Prefix(stages=stages), video, f"prefix{stages}_ms")
    time_fwd_bwd(Prefix(stages=0, s2d=True), video, "prefix0_s2d_ms")
    time_fwd_bwd(Prefix(stages=4, s2d=True), video, "prefix4_s2d_ms")

    # marginal per-stage cost
    for i in range(1, 5):
        results[f"layer{i}_marginal_ms"] = round(
            results[f"prefix{i}_ms"] - results[f"prefix{i-1}_ms"], 2
        )
    print(json.dumps(results, indent=1))


if __name__ == "__main__":
    main()
