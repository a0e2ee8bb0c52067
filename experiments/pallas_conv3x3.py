#!/usr/bin/env python
"""Pallas implicit-GEMM 3x3 conv probe for the R(2+1)D layer1 shapes.

The video tower's step time is dominated by layer1's (1,3,3) spatial convs
(BASELINE.md stage breakdown: 48 ms of an 86 ms step), which XLA runs at
~70 TFLOP/s effective — ~36% of v5e peak. This kernel tests whether an
explicit im2col-in-VMEM formulation (one fat [M, 9*C] x [9*C, Co] MXU dot
per row-strip) beats XLA's conv emitter on the exact hot shape.

Forward only: the decision gate is fwd speed on [480,56,56,64]->128. If it
does not clearly win, conv work stays closed (CLAUDE.md: conv-expression
study closed; this probes the *kernel*, not the expression).

Run on CPU for correctness (interpret mode):
    PYTHONPATH=/root/repo JAX_PLATFORMS=cpu python experiments/pallas_conv3x3.py --check
Run on TPU for the bench (default env, chip must be free):
    python experiments/pallas_conv3x3.py --bench
"""

from __future__ import annotations

import argparse
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _conv_kernel(x_ref, w_ref, o_ref, *, h_tile, h, w_dim, c_in, c_out,
                 mode):
    """One n cell: 3x3 halo windows sliced in VMEM, MXU dots per strip.

    x_ref: [1, h+2, w_dim+2, c_in] (padded input image)
    w_ref: [9*c_in, c_out]
    o_ref: [1, h, w_dim, c_out]

    Halo strips overlap, which block-index maps can't express, so the
    whole padded image is the block and strips are sliced in-kernel
    (static offsets — unrolled python loop).

    mode='im2col': concat 9 windows on lanes -> one [m, 9C] dot (lane
    boundaries at 64 multiples — relayout cost, fattest dot).
    mode='acc9': 9 accumulated [m, C] x [C, Co] dots (K=64 halves MXU
    reduction util, no relayout).
    """
    n_blk = x_ref.shape[0]
    m = n_blk * h_tile * w_dim
    for s in range(h // h_tile):
        y0 = s * h_tile
        wins = []
        for dy in range(3):
            for dx in range(3):
                win = x_ref[:, y0 + dy:y0 + dy + h_tile,
                            dx:dx + w_dim, :]
                wins.append(win.reshape(m, c_in))
        if mode == "im2col":
            patches = jnp.concatenate(wins, axis=1)  # [m, 9*c_in]
            acc = jnp.dot(patches, w_ref[:],
                          preferred_element_type=jnp.float32)
        else:  # acc9
            acc = jnp.zeros((m, c_out), jnp.float32)
            for t, win in enumerate(wins):
                acc += jnp.dot(
                    win, w_ref[t * c_in:(t + 1) * c_in, :],
                    preferred_element_type=jnp.float32,
                )
        o_ref[:, y0:y0 + h_tile] = acc.reshape(
            n_blk, h_tile, w_dim, c_out
        ).astype(o_ref.dtype)


@functools.partial(jax.jit,
                   static_argnames=("h_tile", "interpret", "mode",
                                    "n_blk"))
def conv3x3_pallas(x, w, h_tile=14, interpret=False, mode="im2col",
                   n_blk=1):
    """3x3 stride-1 'same' conv, channels last: [N,H,W,C] -> [N,H,W,Co].

    ``w`` is [3,3,C,Co]; repacked to the kernel's [9C, Co] im2col layout
    (dy-major, dx, then channel — matching the kernel's concat order).
    ``n_blk`` images are processed per grid cell (fatter dots).
    """
    n, h, w_dim, c_in = x.shape
    c_out = w.shape[-1]
    assert h % h_tile == 0, (h, h_tile)
    assert n % n_blk == 0, (n, n_blk)
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    w2 = w.reshape(9 * c_in, c_out).astype(x.dtype)

    return pl.pallas_call(
        functools.partial(
            _conv_kernel, h_tile=h_tile, h=h, w_dim=w_dim, c_in=c_in,
            c_out=c_out, mode=mode,
        ),
        grid=(n // n_blk,),
        in_specs=[
            pl.BlockSpec(
                (n_blk, h + 2, w_dim + 2, c_in),
                lambda i: (i, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (9 * c_in, c_out), lambda i: (0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (n_blk, h, w_dim, c_out), lambda i: (i, 0, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((n, h, w_dim, c_out), x.dtype),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * n * h * w_dim * 9 * c_in * c_out,
            bytes_accessed=(xp.size + w2.size + n * h * w_dim * c_out)
            * x.dtype.itemsize,
            transcendentals=0,
        ),
    )(xp, w2)


def _wgrad_kernel(x_ref, g_ref, o_ref, *, h_tile, h, w_dim, c_in, c_out):
    """Weight gradient: accumulate im2col(x)^T @ g over the n grid.

    x_ref: [1, h+2, w_dim+2, c_in]; g_ref: [1, h, w_dim, c_out];
    o_ref: [9*c_in, c_out] fp32 — same block for every grid cell
    (sequential output revisiting), zeroed at cell 0.
    """
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        o_ref[:] = jnp.zeros_like(o_ref)

    m = h_tile * w_dim
    for s in range(h // h_tile):
        y0 = s * h_tile
        cols = []
        for dy in range(3):
            for dx in range(3):
                win = x_ref[0, y0 + dy:y0 + dy + h_tile,
                            dx:dx + w_dim, :]
                cols.append(win.reshape(m, c_in))
        patches = jnp.concatenate(cols, axis=1)  # [m, 9*c_in]
        g = g_ref[0, y0:y0 + h_tile].reshape(m, c_out)
        o_ref[:] += jax.lax.dot_general(
            patches, g, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )


@functools.partial(jax.jit, static_argnames=("h_tile", "interpret"))
def conv3x3_wgrad_pallas(x, g, h_tile=14, interpret=False):
    """dW [3,3,C,Co] for the stride-1 'same' 3x3 conv."""
    n, h, w_dim, c_in = x.shape
    c_out = g.shape[-1]
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    out = pl.pallas_call(
        functools.partial(
            _wgrad_kernel, h_tile=h_tile, h=h, w_dim=w_dim, c_in=c_in,
            c_out=c_out,
        ),
        grid=(n,),
        in_specs=[
            pl.BlockSpec(
                (1, h + 2, w_dim + 2, c_in), lambda i: (i, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, h, w_dim, c_out), lambda i: (i, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (9 * c_in, c_out), lambda i: (0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((9 * c_in, c_out), jnp.float32),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * n * h * w_dim * 9 * c_in * c_out,
            bytes_accessed=(xp.size + g.size) * x.dtype.itemsize
            + 9 * c_in * c_out * 4,
            transcendentals=0,
        ),
    )(xp, g)
    return out.reshape(3, 3, c_in, c_out)


def conv3x3_dgrad_pallas(g, w, h_tile=14, interpret=False):
    """dX for the stride-1 'same' 3x3 conv: conv of g with the spatially
    rotated, io-transposed weights — reuses the forward kernel."""
    w_rot = jnp.transpose(w[::-1, ::-1], (0, 1, 3, 2))  # [3,3,Co,C]
    return conv3x3_pallas(g, w_rot.astype(g.dtype), h_tile=h_tile,
                          interpret=interpret)


@jax.jit
def conv3x3_xla(x, w):
    return jax.lax.conv_general_dilated(
        x, w, window_strides=(1, 1), padding="SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32,
    ).astype(x.dtype)


@jax.jit
def conv3x3_xla_native(x, w):
    """No preferred_element_type: the dtype-native conv (what flax
    nn.Conv(dtype=bf16) emits in the tower)."""
    return jax.lax.conv_general_dilated(
        x, w.astype(x.dtype), window_strides=(1, 1), padding="SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


def _materialize(x):
    return float(jnp.sum(x.astype(jnp.float32)))


def check(interpret: bool):
    rng = np.random.default_rng(0)
    for (n, h, wd, ci, co, ht) in [
        (2, 28, 56, 64, 128, 14),
        (1, 8, 16, 8, 16, 4),
    ]:
        x = rng.normal(0, 1, (n, h, wd, ci)).astype(np.float32)
        w = rng.normal(0, 0.1, (3, 3, ci, co)).astype(np.float32)
        got = np.asarray(conv3x3_pallas(jnp.asarray(x), jnp.asarray(w),
                                        h_tile=ht, interpret=interpret))
        ref = np.asarray(conv3x3_xla(jnp.asarray(x), jnp.asarray(w)))
        err = np.abs(got - ref).max() / (np.abs(ref).max() + 1e-6)
        print(f"shape {(n, h, wd, ci, co)}: fwd rel err {err:.2e}")
        assert err < 2e-2, err

        # backward parity vs jax.vjp of the XLA conv
        g = rng.normal(0, 1, ref.shape).astype(np.float32)
        _, vjp = jax.vjp(conv3x3_xla, jnp.asarray(x), jnp.asarray(w))
        dx_ref, dw_ref = map(np.asarray, vjp(jnp.asarray(g)))
        dx = np.asarray(conv3x3_dgrad_pallas(
            jnp.asarray(g), jnp.asarray(w), h_tile=ht,
            interpret=interpret))
        dw = np.asarray(conv3x3_wgrad_pallas(
            jnp.asarray(x), jnp.asarray(g), h_tile=ht,
            interpret=interpret))
        err_dx = np.abs(dx - dx_ref).max() / (np.abs(dx_ref).max() + 1e-6)
        err_dw = np.abs(dw - dw_ref).max() / (np.abs(dw_ref).max() + 1e-6)
        print(f"  dgrad rel err {err_dx:.2e}, wgrad rel err {err_dw:.2e}")
        assert err_dx < 2e-2 and err_dw < 2e-2, (err_dx, err_dw)
    print("CHECK OK")


def bench():
    # layer1 hot shape: [B*T, H, W, C] = [480, 56, 56, 64] -> 128
    n, h, wd, ci, co = 480, 56, 56, 64, 128
    flops = 2 * n * h * wd * 9 * ci * co
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(0, 1, (n, h, wd, ci)), jnp.bfloat16)
    w = jnp.asarray(rng.normal(0, 0.1, (3, 3, ci, co)), jnp.bfloat16)

    g = jnp.asarray(rng.normal(0, 1, (n, h, wd, co)), jnp.bfloat16)

    @jax.jit
    def xla_fwdbwd(x, w, g):
        out, vjp = jax.vjp(conv3x3_xla_native, x, w)
        return out, vjp(g)

    for name, fn in [
        ("xla_fwd", lambda: conv3x3_xla(x, w)),
        ("xla_fwd_native_bf16", lambda: conv3x3_xla_native(x, w)),
        ("pallas_fwd_ht14", lambda: conv3x3_pallas(x, w, h_tile=14)),
        ("pallas_fwd_ht28", lambda: conv3x3_pallas(x, w, h_tile=28)),
        ("pallas_fwd_ht56", lambda: conv3x3_pallas(x, w, h_tile=56)),
        ("pallas_fwd_acc9_ht14",
         lambda: conv3x3_pallas(x, w, h_tile=14, mode="acc9")),
        ("pallas_fwd_acc9_ht56",
         lambda: conv3x3_pallas(x, w, h_tile=56, mode="acc9")),
        ("pallas_fwd_ht56_nb4",
         lambda: conv3x3_pallas(x, w, h_tile=56, n_blk=4)),
        ("pallas_fwd_ht28_nb4",
         lambda: conv3x3_pallas(x, w, h_tile=28, n_blk=4)),
        ("pallas_fwd_acc9_ht56_nb4",
         lambda: conv3x3_pallas(x, w, h_tile=56, mode="acc9", n_blk=4)),
        ("xla_fwd+bwd [3x flops]", lambda: xla_fwdbwd(x, w, g)[1][0]),
        ("pallas_dgrad", lambda: conv3x3_dgrad_pallas(g, w, h_tile=14)),
        ("pallas_wgrad", lambda: conv3x3_wgrad_pallas(x, g, h_tile=14)),
    ]:
        try:
            _materialize(fn())  # compile+warm
            reps = 10
            t0 = time.perf_counter()
            for _ in range(reps):
                out = fn()
            _materialize(out)
            dt = (time.perf_counter() - t0) / reps
            print(f"{name}: {dt*1e3:.3f} ms  "
                  f"{flops/dt/1e12:.1f} TFLOP/s")
        except Exception as e:  # noqa: BLE001
            print(f"{name}: FAILED {type(e).__name__}: {e}")


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--check", action="store_true")
    p.add_argument("--bench", action="store_true")
    args = p.parse_args()
    if args.check:
        check(interpret=jax.default_backend() != "tpu")
    if args.bench:
        bench()
