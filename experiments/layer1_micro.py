#!/usr/bin/env python
"""Layer1 micro-timing: where do its 48 ms (56% of the step) go, and does
expressing the temporal (3,1,1) conv as 3 shifted matmuls beat XLA's conv?

Shapes: layer1 blocks run at [16, 30, 56, 56, 64<->128] — the largest
activations in the network (385 MB bf16 at 128ch), so HBM traffic from
BN/ReLU passes may rival the conv FLOPs.

Run (default env, ONE process): python experiments/layer1_micro.py
"""

import json
import time

import numpy as np


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    results = {}
    bs, t, s = 16, 30, 56
    dtype = jnp.bfloat16
    rng = np.random.default_rng(0)

    x64 = jnp.asarray(rng.standard_normal((bs, t, s, s, 64)), dtype)
    w_sp = jnp.asarray(rng.standard_normal((1, 3, 3, 64, 128)) * 0.05,
                       dtype)
    w_tm = jnp.asarray(rng.standard_normal((3, 1, 1, 128, 64)) * 0.05,
                       dtype)

    def timeit(label, fn, *args):
        g = jax.jit(jax.grad(lambda *a: fn(*a).astype(jnp.float32).sum()))
        out = g(*args)
        float(jax.tree.leaves(out)[0].reshape(-1)[0])
        reps = 5
        t0 = time.perf_counter()
        for _ in range(reps):
            out = g(*args)
        float(jax.tree.leaves(out)[0].reshape(-1)[0])
        results[label] = round((time.perf_counter() - t0) / reps * 1000, 2)

    dn = jax.lax.conv_dimension_numbers(
        x64.shape, w_sp.shape, ("NTHWC", "THWIO", "NTHWC")
    )

    def spatial_conv(x):
        return jax.lax.conv_general_dilated(
            x, w_sp, (1, 1, 1), [(0, 0), (1, 1), (1, 1)],
            dimension_numbers=dn,
        )

    timeit("spatial_64to128_ms", spatial_conv, x64)

    x128 = jnp.asarray(rng.standard_normal((bs, t, s, s, 128)), dtype)
    dn2 = jax.lax.conv_dimension_numbers(
        x128.shape, w_tm.shape, ("NTHWC", "THWIO", "NTHWC")
    )

    def temporal_conv(x):
        return jax.lax.conv_general_dilated(
            x, w_tm, (1, 1, 1), [(1, 1), (0, 0), (0, 0)],
            dimension_numbers=dn2,
        )

    timeit("temporal_conv_128to64_ms", temporal_conv, x128)

    def temporal_matmul(x):
        # (3,1,1) conv == sum of 3 time-shifted [C_in, C_out] matmuls
        xp = jnp.pad(x, ((0, 0), (1, 1), (0, 0), (0, 0), (0, 0)))
        return (
            jnp.einsum("bthwc,cd->bthwd", xp[:, :-2], w_tm[0, 0, 0])
            + jnp.einsum("bthwc,cd->bthwd", xp[:, 1:-1], w_tm[1, 0, 0])
            + jnp.einsum("bthwc,cd->bthwd", xp[:, 2:], w_tm[2, 0, 0])
        )

    timeit("temporal_matmul_128to64_ms", temporal_matmul, x128)

    # sanity: identical math
    a = temporal_conv(x128)
    b = temporal_matmul(x128)
    results["temporal_expr_max_diff"] = float(
        jnp.max(jnp.abs(a.astype(jnp.float32) - b.astype(jnp.float32)))
    )

    # elementwise HBM probe: BN-like normalize + relu over the 128ch tensor
    gamma = jnp.ones((128,), dtype)

    def bn_relu(x):
        m = x.astype(jnp.float32).mean(axis=(0, 1, 2, 3))
        v = x.astype(jnp.float32).var(axis=(0, 1, 2, 3))
        y = (x.astype(jnp.float32) - m) * jax.lax.rsqrt(v + 1e-5)
        return jax.nn.relu(y * gamma.astype(jnp.float32)).astype(dtype)

    timeit("bn_relu_128ch_ms", lambda x: bn_relu(x), x128)

    print(json.dumps(results, indent=1))


if __name__ == "__main__":
    main()
