"""Fused Pallas SK iteration: parity with the XLA log-domain solver.
Runs in interpreter mode on the CPU test mesh; the same kernel compiles
natively on TPU."""

import jax
import jax.numpy as jnp
import numpy as np

from selavi_tpu.ops.sinkhorn_pallas import fused_sk_iteration
from selavi_tpu.selflabel.sinkhorn import sinkhorn_knopp


def _setup(n, k, seed=0):
    rng = np.random.default_rng(seed)
    logits_v = rng.standard_normal((n, k)) * 2
    logits_a = rng.standard_normal((n, k)) * 2
    log_ps = jax.nn.log_softmax(
        jnp.asarray(logits_v, jnp.float32), 1
    ) + jax.nn.log_softmax(jnp.asarray(logits_a, jnp.float32), 1)
    log_r = jnp.full((k,), -jnp.log(jnp.float32(k)))
    return log_ps, log_r


def test_single_iteration_matches_xla():
    n, k = 300, 37  # deliberately unaligned shapes
    log_ps, log_r = _setup(n, k)
    m = 10.0 * log_ps  # lambda/2 = 10
    log_beta = jnp.full((n,), -jnp.log(jnp.float32(n)))
    log_alpha = log_r - jax.scipy.special.logsumexp(
        m + log_beta[:, None], axis=0
    )

    # XLA reference for one iteration
    log_beta_ref = -jnp.log(jnp.float32(n)) - jax.scipy.special.logsumexp(
        m + log_alpha[None, :], axis=1
    )
    log_alpha_ref = log_r - jax.scipy.special.logsumexp(
        m + log_beta_ref[:, None], axis=0
    )
    err_ref = jnp.sum(jnp.abs(jnp.expm1(log_beta - log_beta_ref)))

    a_next, b_new, err = fused_sk_iteration(
        m, log_alpha, log_beta, log_r, tile_n=128, interpret=True
    )
    np.testing.assert_allclose(
        np.asarray(b_new), np.asarray(log_beta_ref), rtol=1e-5, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(a_next), np.asarray(log_alpha_ref), rtol=1e-5, atol=1e-5
    )
    np.testing.assert_allclose(
        float(err), float(err_ref), rtol=1e-4, atol=1e-4
    )


def test_full_solver_pallas_matches_xla_labels():
    n, k = 257, 12
    log_ps, log_r = _setup(n, k, seed=1)
    res_xla = sinkhorn_knopp(log_ps, log_r, lamb=20.0)
    res_pal = sinkhorn_knopp(
        log_ps, log_r, lamb=20.0, use_pallas=True, interpret=True
    )
    # EXACT label parity: both backends walk the identical beta chain and
    # (since the fused state carries the previous alpha) stop on the same
    # (alpha, beta) pair — near-tie rows must not flip with the backend
    assert int(res_xla.iters) == int(res_pal.iters)
    np.testing.assert_array_equal(
        np.asarray(res_xla.labels), np.asarray(res_pal.labels)
    )
    assert float(res_pal.err) <= 0.1 or int(res_pal.iters) == 2000


def test_bf16_m_storage_matches_fp32_labels():
    n, k = 300, 10
    log_ps, log_r = _setup(n, k, seed=2)
    res32 = sinkhorn_knopp(log_ps, log_r, lamb=20.0, use_pallas=True,
                           interpret=True)
    res16 = sinkhorn_knopp(log_ps, log_r, lamb=20.0, use_pallas=True,
                           interpret=True, m_bf16=True)
    agree = (np.asarray(res32.labels) == np.asarray(res16.labels)).mean()
    assert agree > 0.97, agree
