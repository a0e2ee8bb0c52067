"""Schedule, marginals, and modality-matching unit tests."""

import jax.numpy as jnp
import numpy as np

from selavi_tpu.selflabel.marginals import MarginalState, get_marginal
from selavi_tpu.selflabel.matching import (
    column_cost_matrix,
    greedy_swap_match,
    match_order,
)
from selavi_tpu.selflabel.schedule import (
    fast_forward_schedule,
    make_sk_schedule,
)


# ------------------------- schedule -------------------------------------
def test_schedule_shape_and_monotonicity():
    sched = make_sk_schedule(epochs=10, batches_per_epoch=100, nopts=20)
    assert len(sched) == 21  # sentinel + nopts
    assert sched[0] == 12 * 100  # sentinel (epochs+2)*N_dl
    # reversed power-law: decreasing tail, first real SK at iteration 0
    assert sched[-1] == 0.0
    assert all(a >= b for a, b in zip(sched[1:], sched[2:]))
    # dense early: gaps grow toward the front
    gaps = np.diff(np.array(sched[1:]))
    assert abs(gaps[0]) > abs(gaps[-1])


def test_schedule_fast_forward():
    sched = make_sk_schedule(epochs=10, batches_per_epoch=100, nopts=20)
    remaining, done = fast_forward_schedule(sched, 100, start_epoch=5)
    assert done + len(remaining) == len(sched)
    assert all(q / 100 > 5 for q in remaining)
    # resuming at epoch 0 consumes nothing
    r0, d0 = fast_forward_schedule(sched, 100, 0)
    assert d0 == 1  # only the t=0 entry is <= epoch 0... boundary check
    # note: entries with q/N_dl > 0 survive; the t=0 first-SK entry does not.


# ------------------------- marginals -------------------------------------
def test_uniform_marginal():
    log_r, state = get_marginal(
        MarginalState(), None, 0, 1, 1000, 10, distribution="default"
    )
    np.testing.assert_allclose(np.exp(log_r), np.ones(10) / 10, rtol=1e-6)


def test_gauss_marginal_cached_and_per_head():
    rng = np.random.default_rng(0)
    state = MarginalState()
    colsum = np.arange(8, dtype=np.float64)
    log_r0, state = get_marginal(
        state, colsum, 0, 3, 800, 8,
        distribution="gauss", diff_dist_per_head=True, rng=rng,
    )
    assert state.dists.shape == (3, 8)
    # second head draws from the same cache
    d_before = state.dists.copy()
    log_r1, state = get_marginal(
        state, colsum, 1, 3, 800, 8,
        distribution="gauss", diff_dist_per_head=True, rng=rng,
    )
    np.testing.assert_allclose(
        np.sort(state.dists[1]), np.sort(d_before[1])
    )  # same values, re-sorted
    assert not np.allclose(log_r0, log_r1)  # heads differ
    # sorting trick: target sizes track colsum ranks => r = 1/sizes tracks
    # reversed ranks
    sizes = 1.0 / np.exp(log_r1)
    assert np.argmax(sizes) == np.argmax(colsum)


def test_gauss_marginal_shared_clamped():
    rng = np.random.default_rng(1)
    log_r, state = get_marginal(
        MarginalState(), None, 0, 4, 100, 50,
        distribution="gauss", gauss_sd=3.0, diff_dist_per_head=False,
        rng=rng,
    )
    # shared draw is clamped at 1 despite huge sd
    assert state.dists.min() >= 1.0
    np.testing.assert_allclose(state.dists[0], state.dists[1])


# ------------------------- matching -------------------------------------
def test_column_cost_matrix_matches_numpy():
    rng = np.random.default_rng(0)
    v = rng.random((100, 7)).astype(np.float32)
    a = rng.random((100, 7)).astype(np.float32)
    c = np.asarray(column_cost_matrix(jnp.asarray(v), jnp.asarray(a), block=32))
    expected = np.abs(v[:, :, None] - a[:, None, :]).sum(0)
    np.testing.assert_allclose(c, expected, rtol=1e-4, atol=1e-4)


def test_greedy_swap_recovers_permutation():
    rng = np.random.default_rng(0)
    k, n = 12, 500
    v = rng.random((n, k)).astype(np.float32)
    true_perm = rng.permutation(k)
    a = v[:, true_perm] + rng.normal(0, 0.01, (n, k)).astype(np.float32)
    # want perm s.t. a[:, perm] ~ v  => perm = inverse of true_perm... the
    # convention: a[:, perm][:, i] = a[:, perm[i]] should match v[:, i],
    # i.e. perm[i] = position of i in true_perm
    cost = np.abs(v[:, :, None] - a[:, None, :]).sum(0)
    perm = greedy_swap_match(cost, steps=20000, restarts=2, rng=rng)
    expected = np.argsort(true_perm)  # inverse permutation... check below
    # a[:, j] = v[:, true_perm^-1 ... ]: a column j equals v column inv[j]
    # where inv[true_perm[i]] = i. Matching v[:, i] needs perm[i] with
    # a[:, perm[i]] = v[:, i] => true col of a matching v_i is where
    # a was built from v_i: a[:, j] = v[:, true_perm[j]], so perm[i] solves
    # true_perm[perm[i]] = i => perm = argsort(true_perm)... verify by cost:
    total = sum(cost[i, perm[i]] for i in range(k))
    ideal = sum(cost[i, expected[i]] for i in range(k))
    assert total <= ideal * 1.05


def test_match_order_end_to_end_improves_cost():
    rng = np.random.default_rng(2)
    n, k = 300, 9
    logits_v = rng.normal(0, 3, (n, k)).astype(np.float32)
    shuffle = rng.permutation(k)
    logits_a = logits_v[:, shuffle] + rng.normal(0, 0.1, (n, k)).astype(
        np.float32
    )
    perm = match_order(
        jnp.asarray(logits_v), jnp.asarray(logits_a), rng=rng
    )
    # applying perm must align the modalities: softmax columns agree
    def softmax(x):
        e = np.exp(x - x.max(1, keepdims=True))
        return e / e.sum(1, keepdims=True)

    pv, pa = softmax(logits_v), softmax(logits_a)
    aligned_cost = np.abs(pv - pa[:, perm]).sum()
    identity_cost = np.abs(pv - pa).sum()
    assert aligned_cost < 0.2 * identity_cost
