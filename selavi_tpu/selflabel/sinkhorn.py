"""Sinkhorn-Knopp optimal-transport label assignment, TPU-native.

Reference algorithm (/root/reference/src/sk_utils.py:359-422): on a single
GPU, in float64, iterate

    alpha = r / (PS^T beta),     beta = c / (PS alpha)

on ``PS = (softmax_v * softmax_a) ** (lambda/2)`` until
``sum(|beta_old/beta_new - 1|) < 0.1`` (checked every 10 iterations) or 2000
iterations; labels are the row-argmax of ``diag(beta) PS diag(alpha)``.

TPU-native redesign (not a port):

* **log-domain fp32** instead of power-domain fp64 — TPUs have no native
  fp64. With ``M = (lambda/2) * (log_softmax_v + log_softmax_a)`` the same
  fixed point is computed via logsumexp scalings, which is strictly more
  numerically robust than the reference's fp64 power iteration (``PS**10``
  underflows fp64 for small probabilities; logs never do).
* **sharded, not single-host**: M is laid out row-sharded over the mesh's
  data axis. Under jit, the column logsumexp reduction becomes an ICI
  collective inserted by GSPMD — the full [N, K] matrix never has to live on
  one chip (the reference materializes it on rank 0's GPU).
* a ``lax.while_loop`` with the same stopping rule (error check every 10
  iterations, tol 0.1, cap 2000) keeps convergence behavior aligned with the
  reference.
* under bf16 M storage (``m_bf16=True``) an additional **plateau exit**
  fires: once head logits sharpen, bf16 quantization of M puts a floor on
  the marginal error far above the reference tolerance (measured r3: err
  1.2-17.5 at the 2000-iter cap with N=16384, labels stable throughout),
  so the reference rule alone can never stop. The solver therefore exits
  when BOTH hold at an error check: (a) the error failed to improve by
  >=1% across two consecutive checks (plateau), and (b) the error is below
  the bf16 marginal-resolution bound ``N * 2^-8`` (the sum over N rows of
  per-row ratio jitter at bf16's ~2^-8 relative resolution — above it the
  solve is still genuinely converging and must continue; below it the
  scalings are within quantization noise of the fixed point and further
  iterations cannot move the argmax). At extreme sharpness the bf16
  floor sits ABOVE that bound (measured r4: err flat at ~100-120,
  N=16384), so a second, windowed exit fires when the error makes no
  net progress (<0.1%) over two consecutive 8-check windows (160
  iterations) — genuinely converging solves improve far more. fp32 solves
  keep the pure reference rule (both exits are gated on ``m_bf16``),
  preserving bit-level stopping parity.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp


class SinkhornResult(NamedTuple):
    labels: jnp.ndarray  # [N] int32 row-argmax assignments
    cost: jnp.ndarray  # scalar transport cost (reference formula)
    err: jnp.ndarray  # final marginal error
    iters: jnp.ndarray  # iterations executed


def _logsumexp(a, axis):
    return jax.scipy.special.logsumexp(a, axis=axis)


@functools.partial(
    jax.jit,
    static_argnames=(
        "max_iters", "check_every", "use_pallas", "interpret", "m_bf16",
        "plateau_exit",
    ),
)
def sinkhorn_knopp(
    log_ps: jnp.ndarray,
    log_r: jnp.ndarray,
    lamb: float = 20.0,
    tol: float = 1e-1,
    max_iters: int = 2000,
    check_every: int = 10,
    use_pallas: bool = False,
    interpret: bool = False,
    m_bf16: bool = False,
    plateau_exit: Optional[bool] = None,
) -> SinkhornResult:
    """Run SK scaling iterations in the log domain.

    Args:
      log_ps: [N, K] log joint probabilities ``log_softmax_v + log_softmax_a``
        (NOT yet scaled by lambda/2 — done here).
      log_r: [K] log of the column (cluster) target marginal, normalized to
        sum to 1 in probability space. Uniform => ``-log(K)``.
      lamb: entropic regularization weight (reference ``args.lamb``).
      tol / max_iters / check_every: reference stopping rule.

    Returns SinkhornResult with row-argmax labels and the reference's
    transport cost ``-(1/lamb) * sum_n M[n, L[n]] / N``.
    """
    n, _ = log_ps.shape
    m = (0.5 * lamb) * log_ps.astype(jnp.float32)
    if m_bf16:
        # bf16 storage of M halves the solver's HBM traffic (its actual
        # bound) on BOTH backends: the Pallas kernel upcasts each tile to
        # fp32, and XLA fuses the upcast into the LSE reductions. This is
        # how the sharded multi-chip path gets the bandwidth win too (the
        # fused kernel is single-core-only). bf16 carries ~3 significant
        # decimal digits — labels stay identical on sharp
        # (converged-training) instances; stay fp32 when bit-level
        # reference parity matters.
        m = m.astype(jnp.bfloat16)
    log_c = -jnp.log(jnp.float32(n))  # rows uniform: c = 1/N
    log_r = log_r.astype(jnp.float32)

    log_beta0 = jnp.full((n,), -jnp.log(jnp.float32(n)), jnp.float32)

    # bf16 plateau exit (see module docstring): stop once the error has
    # both plateaued (two consecutive checks with <1% improvement) AND
    # fallen below the bf16 marginal-resolution bound N*2^-8. Defaults on
    # iff M is stored bf16; `plateau_exit` overrides (tests use it to pin
    # early-exit labels against the full capped run).
    #
    # Second exit (r4): at extreme logit sharpness the bf16 floor can sit
    # ABOVE the N*2^-8 bound (measured: err flat at ~100-120 for
    # N=16384 late in the sk_bf16 campaign, every solve burning the
    # 2000-iter cap), so the bound-gated rule never fires there. A
    # windowed stall detector catches it: if the error shows no net
    # improvement (<0.1%) across two consecutive 8-check windows (160
    # iterations), the solve is pinned to its quantization floor —
    # genuinely slow convergence still makes net progress (the slowest
    # measured real instance improves ~3.6% per window).
    if plateau_exit is None:
        plateau_exit = m_bf16
    floor_bound = jnp.float32(n * 2.0**-8) if plateau_exit else (
        jnp.float32(0.0)
    )
    stall_window = 8  # checks per no-net-improvement window

    def cond(state):
        _, _, _, err, stuck, _, _, stalls, it = state
        at_floor = jnp.logical_and(stuck >= 2, err <= floor_bound)
        stop = at_floor
        if plateau_exit:
            stop = jnp.logical_or(at_floor, stalls >= 2)
        return jnp.logical_and(
            jnp.logical_and(err > tol, it < max_iters),
            jnp.logical_not(stop),
        )

    def _check_update(err_old, err_new, stuck, err_ref, chk, stalls):
        improved = err_new < 0.99 * err_old
        stuck = jnp.where(improved, 0, stuck + 1)
        chk = chk + 1
        at_boundary = (chk % stall_window) == 0
        window_stalled = err_new >= 0.999 * err_ref
        # require TWO consecutive stalled windows (160 iterations with
        # <0.1% net progress each) — a single window can be a transient
        # plateau the solve later escapes (observed on synthetic probes)
        stalls = jnp.where(
            at_boundary,
            jnp.where(window_stalled, stalls + 1, 0),
            stalls,
        )
        err_ref = jnp.where(at_boundary, err_new, err_ref)
        return err_new, stuck, err_ref, chk, stalls

    if use_pallas:
        # fused single-sweep iteration (selavi_tpu.ops.sinkhorn_pallas):
        # beta_{i+1} from alpha_i and alpha_{i+1} from beta_{i+1} in one
        # pass over M — the beta chain is IDENTICAL to the XLA loop's
        # (beta_{i+1} = g(f(beta_i)) in both), but the fused alpha runs a
        # half-step ahead. The state carries the previous alpha so the
        # final argmax pairs with the same alpha the reference/XLA loop
        # stops on (f(beta_{T-1})) — backends produce identical labels.
        from selavi_tpu.ops.sinkhorn_pallas import fused_sk_iteration

        def body(state):
            _, log_alpha, log_beta, err, stuck, err_ref, chk, stalls, \
                it = state
            log_alpha_next, log_beta_new, err_new = fused_sk_iteration(
                m, log_alpha, log_beta, log_r, interpret=interpret
            )
            err, stuck, err_ref, chk, stalls = jax.lax.cond(
                it % check_every == 0,
                lambda: _check_update(
                    err, err_new, stuck, err_ref, chk, stalls
                ),
                lambda: (err, stuck, err_ref, chk, stalls),
            )
            return (
                log_alpha, log_alpha_next, log_beta_new, err, stuck,
                err_ref, chk, stalls, it + 1,
            )

    else:

        def body(state):
            _, _, log_beta, err, stuck, err_ref, chk, stalls, it = state
            # alpha update: log_alpha[k] = log_r[k] - LSE_n(M + log_beta)
            log_alpha = log_r - _logsumexp(m + log_beta[:, None], axis=0)
            # beta update: log_beta[n] = log_c - LSE_k(M + log_alpha)
            log_beta_new = log_c - _logsumexp(
                m + log_alpha[None, :], axis=1
            )
            # reference error: sum |beta_old/beta_new - 1|
            err, stuck, err_ref, chk, stalls = jax.lax.cond(
                it % check_every == 0,
                lambda: _check_update(
                    err,
                    jnp.sum(jnp.abs(jnp.expm1(log_beta - log_beta_new))),
                    stuck, err_ref, chk, stalls,
                ),
                lambda: (err, stuck, err_ref, chk, stalls),
            )
            return (
                log_alpha, log_alpha, log_beta_new, err, stuck,
                err_ref, chk, stalls, it + 1,
            )

    log_alpha0 = log_r - _logsumexp(m + log_beta0[:, None], axis=0)
    state0 = (
        log_alpha0, log_alpha0, log_beta0, jnp.float32(1e6),
        jnp.int32(0), jnp.float32(1e6), jnp.int32(0),
        jnp.int32(0), jnp.int32(0),
    )
    log_alpha, _, log_beta, err, _, _, _, _, iters = jax.lax.while_loop(
        cond, body, state0
    )

    # Row argmax of diag(beta) PS diag(alpha): beta is constant per row,
    # so labels = argmax_k (M + log_alpha).
    scores = m + log_alpha[None, :]
    labels = jnp.argmax(scores, axis=1).astype(jnp.int32)

    # Reference cost: -(1/lamb) * nansum(log PS_sk[n, L[n]]) / N where
    # PS_sk = PS ** (lambda/2), i.e. log PS_sk = M.
    # fp32 accumulation: with bf16 M storage a bf16 sum over 10^5+ rows
    # loses the cost to mantissa truncation
    picked = jnp.take_along_axis(m, labels[:, None], axis=1)[:, 0]
    cost = -(1.0 / lamb) * jnp.sum(picked.astype(jnp.float32)) / n
    return SinkhornResult(labels, cost, err, iters)


def sinkhorn_assign(
    logits_v: jnp.ndarray,
    logits_a: jnp.ndarray,
    log_r: Optional[jnp.ndarray] = None,
    lamb: float = 20.0,
    tol: float = 1e-1,
    max_iters: int = 2000,
) -> SinkhornResult:
    """Assign labels from raw per-modality head logits.

    ``PS = softmax(logits_v) * softmax(logits_a)`` (reference
    sk_utils.py:309-315) computed as a log-space sum — one fused kernel, no
    materialized softmaxes.
    """
    log_ps = jax.nn.log_softmax(
        logits_v.astype(jnp.float32), axis=1
    ) + jax.nn.log_softmax(logits_a.astype(jnp.float32), axis=1)
    if log_r is None:
        k = logits_v.shape[1]
        log_r = jnp.full((k,), -jnp.log(jnp.float32(k)), jnp.float32)
    return sinkhorn_knopp(
        log_ps, log_r, lamb=lamb, tol=tol, max_iters=max_iters
    )
