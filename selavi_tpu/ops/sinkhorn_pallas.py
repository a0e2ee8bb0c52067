"""Pallas TPU kernel: fused Sinkhorn-Knopp iteration.

The log-domain SK iteration (selavi_tpu.selflabel.sinkhorn) is HBM-bandwidth
bound: each iteration does a column logsumexp of ``M + log_beta[:, None]``
and a row logsumexp of ``M + log_alpha[None, :]`` — two full sweeps over the
[N, K] matrix per iteration under XLA.

This kernel restructures the recurrence so one sweep suffices: given
``log_alpha_i``, a single pass over row-tiles of M computes

    log_beta_{i+1}[n] = log_c - LSE_k(M[n, :] + log_alpha_i[k])     (row LSE)
    err_i            += sum_n |exp(log_beta_i - log_beta_{i+1}) - 1|
    col-LSE accumulation of  M + log_beta_{i+1}[:, None]            (online)

and emits ``log_alpha_{i+1} = log_r - colLSE`` at the last tile. M is read
ONCE per iteration — 2x less HBM traffic than the XLA formulation, which is
the solver's bound (the FLOPs are trivial). The online column LSE carries a
running (max, scaled-sum) pair in VMEM scratch across sequential grid steps.

Row/column padding is masked in-kernel (padded contributions are exactly
zero), so callers may pass any N, K.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG = -1e30


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


@functools.partial(
    jax.jit, static_argnames=("tile_n", "interpret")
)
def fused_sk_iteration(
    m: jnp.ndarray,  # [N, K] (fp32 or bf16)
    log_alpha: jnp.ndarray,  # [K]
    log_beta: jnp.ndarray,  # [N]
    log_r: jnp.ndarray,  # [K]
    tile_n: int = 1024,
    interpret: bool = False,
):
    """One fused SK iteration. Returns (log_alpha_next [K],
    log_beta_new [N], err scalar)."""
    n, k = m.shape
    kp = _round_up(k, 128)
    np_ = _round_up(n, tile_n)
    ntiles = np_ // tile_n

    m_pad = jnp.pad(m, ((0, np_ - n), (0, kp - k)), constant_values=NEG)
    la_pad = jnp.pad(
        log_alpha.astype(jnp.float32), (0, kp - k), constant_values=NEG
    )[None, :]
    lb_pad = jnp.pad(log_beta.astype(jnp.float32), (0, np_ - n))[:, None]
    lr_pad = jnp.pad(
        log_r.astype(jnp.float32), (0, kp - k), constant_values=NEG
    )[None, :]
    # n, k as int32 scalars (log_c is reconstructed in-kernel as -log(n))
    scalars_i = jnp.asarray([[n, k, 0, 0]], jnp.int32)

    grid_spec = pl.GridSpec(
        grid=(ntiles,),
        in_specs=[
            pl.BlockSpec(
                (tile_n, kp), lambda i: (i, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec((1, kp), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (tile_n, 1), lambda i: (i, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec((1, kp), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 4), lambda i: (0, 0), memory_space=pltpu.SMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, kp), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (tile_n, 1), lambda i: (i, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((1, _round_up(k, 128)), jnp.float32),
            pltpu.VMEM((1, _round_up(k, 128)), jnp.float32),
            pltpu.SMEM((1, 1), jnp.float32),
        ],
    )

    alpha_next, beta_new, err = pl.pallas_call(
        _fused_sk_kernel_with_scalars,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((1, kp), jnp.float32),
            jax.ShapeDtypeStruct((np_, 1), jnp.float32),
            jax.ShapeDtypeStruct((1, 1), jnp.float32),
        ],
        interpret=interpret,
    )(m_pad, la_pad, lb_pad, lr_pad, scalars_i)

    return (
        alpha_next[0, :k],
        beta_new[:n, 0],
        err[0, 0],
    )


def _fused_sk_kernel_with_scalars(
    m_ref, log_alpha_ref, log_beta_ref, log_r_ref, scalars_ref,
    alpha_out_ref, beta_out_ref, err_out_ref,
    colmax_ref, colsum_ref, err_ref,
):
    # scalars_ref is int32 [1,4]: (n, k, unused, unused); log_c is
    # reconstructed as -log(n) (rows are uniform 1/N in SeLaVi's SK,
    # reference sk_utils.py:395).
    i = pl.program_id(0)
    ntiles = pl.num_programs(0)
    tn = m_ref.shape[0]
    kp = m_ref.shape[1]

    n_total = scalars_ref[0, 0]
    k_total = scalars_ref[0, 1]
    log_c = -jnp.log(n_total.astype(jnp.float32))

    @pl.when(i == 0)
    def _init():
        colmax_ref[:, :] = jnp.full((1, kp), NEG, jnp.float32)
        colsum_ref[:, :] = jnp.zeros((1, kp), jnp.float32)
        err_ref[0, 0] = 0.0

    row_ids = jax.lax.broadcasted_iota(jnp.int32, (tn, 1), 0) + i * tn
    col_ids = jax.lax.broadcasted_iota(jnp.int32, (1, kp), 1)
    row_valid = row_ids < n_total
    col_valid = col_ids < k_total

    m = m_ref[:, :].astype(jnp.float32)
    log_alpha = log_alpha_ref[:, :].astype(jnp.float32)

    z = jnp.where(col_valid, m + log_alpha, NEG)
    zmax = jnp.max(z, axis=1, keepdims=True)
    zsum = jnp.sum(jnp.exp(z - zmax), axis=1, keepdims=True)
    log_beta_new = log_c - (zmax + jnp.log(zsum))
    beta_out_ref[:, :] = jnp.where(row_valid, log_beta_new, 0.0)

    # expm1 has no Pallas TPU lowering; exp(x)-1 is fine at tol=0.1
    diff = jnp.abs(jnp.exp(log_beta_ref[:, :] - log_beta_new) - 1.0)
    err_ref[0, 0] += jnp.sum(jnp.where(row_valid, diff, 0.0))

    w = m + log_beta_new
    valid = jnp.logical_and(row_valid, col_valid)
    w_masked = jnp.where(valid, w, NEG)
    tile_max = jnp.max(w_masked, axis=0, keepdims=True)
    old_max = colmax_ref[:, :]
    new_max = jnp.maximum(old_max, tile_max)
    scale = jnp.where(
        colsum_ref[:, :] > 0.0, jnp.exp(old_max - new_max), 0.0
    )
    contrib = jnp.sum(
        jnp.where(valid, jnp.exp(w - new_max), 0.0), axis=0, keepdims=True
    )
    colsum_ref[:, :] = colsum_ref[:, :] * scale + contrib
    colmax_ref[:, :] = new_max

    @pl.when(i == ntiles - 1)
    def _finalize():
        lse_col = colmax_ref[0, :] + jnp.log(
            jnp.maximum(colsum_ref[0, :], 1e-38)
        )
        alpha_next = log_r_ref[0, :] - lse_col
        alpha_out_ref[0, :] = jnp.where(col_valid[0, :], alpha_next, NEG)
        err_out_ref[0, 0] = err_ref[0, 0]
