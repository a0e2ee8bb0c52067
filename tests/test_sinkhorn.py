"""Sinkhorn-Knopp solver: convergence, marginal satisfaction, and parity
with a float64 power-domain reference implementation (the reference
algorithm, /root/reference/src/sk_utils.py:359-422, reimplemented in numpy
for verification)."""

import jax.numpy as jnp
import numpy as np
import pytest

from selavi_tpu.selflabel.sinkhorn import sinkhorn_assign, sinkhorn_knopp


def _reference_sk_numpy(ps, r, lamb=20.0, tol=1e-1, max_iters=2000):
    """Power-domain fp64 SK, the reference's algorithm in numpy."""
    n, k = ps.shape
    ps = ps.astype(np.float64) ** (0.5 * lamb)
    beta = np.ones(n) / n
    c = 1.0 / n
    err, counter = 1e6, 0
    alpha = None
    while err > tol and counter < max_iters:
        alpha = r / (ps.T @ beta)
        beta_new = c / (ps @ alpha)
        if counter % 10 == 0:
            err = np.sum(np.abs(beta / beta_new - 1.0))
        beta = beta_new
        counter += 1
    scores = ps * alpha[None, :]
    return scores.argmax(1), counter


def _random_probs(rng, n, k, sharp=3.0):
    logits_v = rng.standard_normal((n, k)) * sharp
    logits_a = rng.standard_normal((n, k)) * sharp
    return logits_v, logits_a


def test_uniform_marginals_satisfied():
    rng = np.random.default_rng(0)
    n, k = 512, 16
    logits_v, logits_a = _random_probs(rng, n, k, sharp=1.0)
    res = sinkhorn_assign(
        jnp.asarray(logits_v), jnp.asarray(logits_a), lamb=20.0
    )
    assert float(res.err) <= 1e-1
    counts = np.bincount(np.asarray(res.labels), minlength=k)
    # uniform marginal: every cluster near N/K
    assert counts.min() >= 0.5 * n / k
    assert counts.max() <= 1.7 * n / k


def test_matches_fp64_power_domain_reference():
    rng = np.random.default_rng(1)
    n, k = 256, 10
    logits_v, logits_a = _random_probs(rng, n, k, sharp=2.0)

    def softmax(x):
        e = np.exp(x - x.max(1, keepdims=True))
        return e / e.sum(1, keepdims=True)

    ps = softmax(logits_v) * softmax(logits_a)
    r = np.ones(k) / k
    ref_labels, _ = _reference_sk_numpy(ps, r, lamb=20.0)

    res = sinkhorn_assign(
        jnp.asarray(logits_v), jnp.asarray(logits_a), lamb=20.0
    )
    ours = np.asarray(res.labels)
    agreement = (ours == ref_labels).mean()
    assert agreement > 0.98, f"only {agreement:.3f} agreement"


def test_nonuniform_marginal_tracks_target():
    rng = np.random.default_rng(2)
    n, k = 2000, 8
    logits_v, logits_a = _random_probs(rng, n, k, sharp=0.5)
    # skewed target: r proportional to 1..K
    r = np.arange(1, k + 1, dtype=np.float64)
    r = r / r.sum()
    res = sinkhorn_assign(
        jnp.asarray(logits_v),
        jnp.asarray(logits_a),
        log_r=jnp.asarray(np.log(r), jnp.float32),
        lamb=20.0,
    )
    counts = np.bincount(np.asarray(res.labels), minlength=k) / n
    # cluster sizes should correlate strongly with the target marginal
    corr = np.corrcoef(counts, r)[0, 1]
    assert corr > 0.95, (counts, r)


def test_perfectly_separable_data_recovers_clusters():
    rng = np.random.default_rng(3)
    n, k = 400, 8
    true = rng.integers(0, k, n)
    logits = np.full((n, k), -5.0)
    logits[np.arange(n), true] = 5.0
    res = sinkhorn_assign(
        jnp.asarray(logits), jnp.asarray(logits), lamb=20.0
    )
    labels = np.asarray(res.labels)
    # same-cluster samples stay together (up to permutation)
    for c in range(k):
        vals = labels[true == c]
        if len(vals):
            assert (vals == vals[0]).mean() > 0.9


def test_cost_is_finite_and_iters_bounded():
    import jax

    rng = np.random.default_rng(4)
    logits_v, logits_a = _random_probs(rng, 128, 6)
    log_ps = jax.nn.log_softmax(jnp.asarray(logits_v), 1) + jax.nn.log_softmax(
        jnp.asarray(logits_a), 1
    )
    res = sinkhorn_knopp(
        log_ps, jnp.full((6,), -jnp.log(6.0), jnp.float32)
    )
    assert np.isfinite(float(res.cost))
    assert int(res.iters) <= 2000


def test_xla_bf16_m_storage_labels_agree():
    """--sk_bf16 now applies to the XLA backend too (the sharded
    multi-chip path): labels must near-match fp32 on a random instance
    and the cost must stay fp32-accumulated (finite, same scale)."""
    rng = np.random.default_rng(5)
    n, k = 400, 12
    log_ps = np.log(
        rng.dirichlet(np.ones(k), size=n).astype(np.float64) + 1e-9
    )
    log_r = np.full(k, -np.log(k), np.float32)
    r32 = sinkhorn_knopp(
        jnp.asarray(log_ps, jnp.float32), jnp.asarray(log_r)
    )
    r16 = sinkhorn_knopp(
        jnp.asarray(log_ps, jnp.float32), jnp.asarray(log_r), m_bf16=True
    )
    agree = (np.asarray(r32.labels) == np.asarray(r16.labels)).mean()
    assert agree > 0.95, agree
    assert np.isfinite(float(r16.cost))
    assert abs(float(r16.cost) - float(r32.cost)) < 0.1 * max(
        abs(float(r32.cost)), 1.0
    )
