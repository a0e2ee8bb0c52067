#!/usr/bin/env python
"""Perf probe: R(2+1)D tower with ALL tensors kept 4D (collapsed layouts).

Hypothesis (CLAUDE.md conv findings): the 2D-expressed tower loses to 3D
end-to-end because XLA inserts layout copies at 5D<->4D reshape boundaries
between convs and BNs. This probe never materializes a 5D tensor: spatial
convs run on [B*T, H, W, C], temporal convs on [B, T, H*W, C], and BN/ReLU/
residual math happens in whichever view is current (BN reduces over all
non-channel dims, so views are equivalent). View switches are metadata-only
reshapes of a row-major buffer.

Compares fwd and fwd+bwd wall time against the production '3d' tower at the
bench config (bs16, 30x112x112, bf16, aligned midplanes).
"""

import time

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")

from selavi_tpu.models.r2plus1d import R2Plus1D18, _aligned_midplanes

B, T0, H0, W0 = 16, 30, 112, 112
DTYPE = jnp.bfloat16


def conv2d(x, k, stride, pad):
    return jax.lax.conv_general_dilated(
        x, k, (stride, stride), [(pad, pad), (pad, pad)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


def bn_relu(x, relu=True):
    # train-mode BN cost model: mean/var over all non-channel dims (fp32)
    xf = x.astype(jnp.float32)
    axes = tuple(range(x.ndim - 1))
    mean = jnp.mean(xf, axes, keepdims=True)
    var = jnp.mean(jnp.square(xf), axes, keepdims=True) - jnp.square(mean)
    y = (xf - mean) * jax.lax.rsqrt(var + 1e-5)
    y = y.astype(DTYPE)
    return jnp.maximum(y, 0) if relu else y


def make_params(rng):
    params = []

    def kconv(ci, co, kh, kw):
        nonlocal rng
        rng, sub = jax.random.split(rng)
        params.append(
            (jax.random.normal(sub, (kh, kw, ci, co), jnp.float32) * 0.05
             ).astype(DTYPE)
        )
        return len(params) - 1

    plan = [(64, 64, 1), (64, 128, 2), (128, 256, 2), (256, 512, 2)]
    idxs = {"stem_s": kconv(3, 45, 7, 7), "stem_t": kconv(45, 64, 3, 1)}
    for s, (ci, co, stride) in enumerate(plan, 1):
        for b in range(2):
            cin = ci if b == 0 else co
            mid = _aligned_midplanes(cin, co)
            mid2 = _aligned_midplanes(co, co)
            pre = f"l{s}b{b}"
            idxs[pre + "c1s"] = kconv(cin, mid, 3, 3)
            idxs[pre + "c1t"] = kconv(mid, co, 3, 1)
            idxs[pre + "c2s"] = kconv(co, mid2, 3, 3)
            idxs[pre + "c2t"] = kconv(mid2, co, 3, 1)
            if (b == 0 and (stride != 1 or cin != co)):
                idxs[pre + "ds"] = kconv(cin, co, 1, 1)
    return params, idxs


def tower_2dc(params, idxs, video):
    # video [B, T0, H0, W0, 3] -> start in spatial view [B*T, H, W, C]
    b, t, h, w, c = video.shape
    x = video.reshape(b * t, h, w, c)

    def to_temporal(x4, t):  # [B*t, h, w, c] -> [B, t, h*w, c]
        bt, h, w, c = x4.shape
        return x4.reshape(bt // t, t, h * w, c), (h, w)

    def to_spatial(x4, hw):  # [B, t, h*w, c] -> [B*t, h, w, c]
        b, t, _, c = x4.shape
        h, w = hw
        return x4.reshape(b * t, h, w, c)

    # stem
    x = conv2d(x, params[idxs["stem_s"]], 2, 3)
    x = bn_relu(x)
    xt, hw = to_temporal(x, t)
    xt = jax.lax.conv_general_dilated(
        xt, params[idxs["stem_t"]], (1, 1), [(1, 1), (0, 0)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    xt = bn_relu(xt)
    x = to_spatial(xt, hw)

    plan = [(64, 64, 1), (64, 128, 2), (128, 256, 2), (256, 512, 2)]
    for s, (ci, co, stride) in enumerate(plan, 1):
        for blk in range(2):
            st = stride if blk == 0 else 1
            pre = f"l{s}b{blk}"
            res_s = x  # spatial view residual source
            # conv1 spatial (stride st)
            y = conv2d(x, params[idxs[pre + "c1s"]], st, 1)
            y = bn_relu(y)
            yt, hw = to_temporal(y, t)
            # conv1 temporal (stride st on T)
            yt = jax.lax.conv_general_dilated(
                yt, params[idxs[pre + "c1t"]], (st, 1), [(1, 1), (0, 0)],
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
            t = yt.shape[1]
            yt = bn_relu(yt)
            y = to_spatial(yt, hw)
            # conv2 spatial
            y = conv2d(y, params[idxs[pre + "c2s"]], 1, 1)
            y = bn_relu(y)
            yt, hw = to_temporal(y, t)
            yt = jax.lax.conv_general_dilated(
                yt, params[idxs[pre + "c2t"]], (1, 1), [(1, 1), (0, 0)],
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
            yt = bn_relu(yt, relu=False)
            # downsample residual into temporal view
            if pre + "ds" in idxs:
                bt, hh, ww, cc = res_s.shape
                t_in = bt // b
                r5 = res_s.reshape(b, t_in, hh, ww, cc)[:, ::st]
                r4 = r5.reshape(b * r5.shape[1], hh, ww, cc)
                r4 = conv2d(r4, params[idxs[pre + "ds"]], st, 0)
                r4 = bn_relu(r4, relu=False)
                rt, _ = to_temporal(r4, t)
            else:
                rt, _ = to_temporal(res_s, t)
            yt = jnp.maximum(yt + rt, 0)
            x = to_spatial(yt, hw)
    # GAP
    return jnp.mean(x.astype(jnp.float32), axis=(0, 1, 2)) if False else \
        jnp.mean(x.astype(jnp.float32).reshape(b, -1, x.shape[-1]), axis=1)


def timeit(name, fn, *args, iters=10):
    r = fn(*args)
    float(jnp.sum(jax.tree.leaves(r)[0].astype(jnp.float32)))
    t0 = time.perf_counter()
    for _ in range(iters):
        r = fn(*args)
    float(jnp.sum(jax.tree.leaves(r)[0].astype(jnp.float32)))
    dt = (time.perf_counter() - t0) / iters
    print(f"{name}: {dt*1000:.1f} ms -> {B/dt:.1f} clips/s")


def main():
    rng = jax.random.PRNGKey(0)
    video = jax.random.normal(
        rng, (B, T0, H0, W0, 3), jnp.float32
    ).astype(DTYPE)

    params, idxs = make_params(rng)
    fwd2dc = jax.jit(lambda p, v: tower_2dc(p, idxs, v))
    timeit("2dc fwd", fwd2dc, params, video)

    g2dc = jax.jit(jax.grad(
        lambda p, v: jnp.sum(tower_2dc(p, idxs, v).astype(jnp.float32)),
        argnums=0,
    ))
    timeit("2dc fwd+bwd", g2dc, params, video)

    # 3d production tower for comparison (aligned widths, eval BN ~ same
    # cost class as the probe's train-mode BN)
    m3 = R2Plus1D18(dtype=DTYPE, midplanes_mode="aligned")
    v3 = m3.init(jax.random.PRNGKey(0), video[:2], train=False)
    fwd3 = jax.jit(lambda p, v: m3.apply(
        {"params": p, "batch_stats": v3["batch_stats"]}, v, train=False))
    timeit("3d fwd (eval)", fwd3, v3["params"], video)
    g3 = jax.jit(jax.grad(
        lambda p, v: jnp.sum(m3.apply(
            {"params": p, "batch_stats": v3["batch_stats"]}, v,
            train=False).astype(jnp.float32)), argnums=0))
    timeit("3d fwd+bwd (eval)", g3, v3["params"], video)


if __name__ == "__main__":
    main()
