"""Self-labeling engine unit test with a stub encoder: verifies feature
aggregation by index, head ordering/groups, matching hook, label writing,
and marginal caching — without running the conv towers."""

import jax
import jax.numpy as jnp
import numpy as np

from selavi_tpu.selflabel.engine import SKConfig, aggregate_features, cluster
from selavi_tpu.selflabel.marginals import MarginalState


def _make_problem(n=64, k=6, h=2, d=512, seed=0):
    rng = np.random.default_rng(seed)
    true = rng.integers(0, k, n)
    # class-separable features
    centers = rng.standard_normal((k, d)) * 3
    feats_v = centers[true] + rng.standard_normal((n, d)) * 0.3
    feats_a = centers[true] + rng.standard_normal((n, d)) * 0.3
    # per-head projection matrices to K logits
    wv = rng.standard_normal((h, d, k)) * 0.05
    wa = rng.standard_normal((h, d, k)) * 0.05
    return true, feats_v, feats_a, {"wv": wv, "wa": wa}


def test_cluster_end_to_end_with_stub_encoder():
    n, k, h = 64, 6, 2
    true, feats_v, feats_a, params = _make_problem(n, k, h)

    def make_batch_iter():
        for s in range(0, n, 16):
            idx = np.arange(s, min(s + 16, n))
            yield {
                "video": jnp.asarray(feats_v[idx]),
                "audio": jnp.asarray(feats_a[idx]),
                "index": idx,
            }

    def encode_fn(video, audio):
        return video, audio  # already "features"

    def head_logits_fn(p, feats, modality):
        w = p["wv"] if modality == "v" else p["wa"]
        return jnp.einsum("nd,hdk->hnk", feats, jnp.asarray(w))

    cfg = SKConfig(
        headcount=h, num_clusters=k, ind_groups=2, match=True,
        distribution="gauss", sk_backend="xla",
    )
    selflabels = np.zeros((n, h), np.int32)
    labels, mstate, metrics, info = cluster(
        encode_fn=encode_fn,
        head_logits_fn=head_logits_fn,
        make_batch_iter=make_batch_iter,
        params=params,
        n=n,
        cfg=cfg,
        selflabels=selflabels,
        marginal_state=MarginalState(),
        iter_num=1,  # skip matching (only runs at iter 0)
        np_rng=np.random.default_rng(0),
        true_labels=true,
    )
    assert labels.shape == (n, h)
    assert mstate.dists.shape == (h, k)
    assert np.isfinite(metrics["sk_cost"])
    # all heads assigned (non-degenerate)
    for head in range(h):
        assert len(np.unique(labels[:, head])) > 1


def test_aggregate_features_scatter_by_index():
    n, d = 20, 8
    rng = np.random.default_rng(0)
    data = rng.standard_normal((n, d)).astype(np.float32)

    def make_iter():
        # shuffled batches: scatter must land by index
        order = rng.permutation(n)
        for s in range(0, n, 7):
            idx = order[s : s + 7]
            yield {
                "video": jnp.asarray(data[idx]),
                "audio": jnp.asarray(-data[idx]),
                "index": idx,
            }

    ps_v, ps_a = aggregate_features(
        lambda v, a: (v, a), make_iter(), n, feat_dim=d
    )
    np.testing.assert_allclose(np.asarray(ps_v), data, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(ps_a), -data, rtol=1e-6)


def test_matching_at_first_iter_updates_params():
    """iter_num == 0 with match=True must run the permutation search and
    return updated params for vmapped head-stack layouts."""
    n, k, h, d = 48, 5, 2, 16
    rng = np.random.default_rng(1)
    true = rng.integers(0, k, n)
    centers = rng.standard_normal((k, d)) * 3
    feats = centers[true] + rng.standard_normal((n, d)) * 0.1
    wv = rng.standard_normal((h, d, k)).astype(np.float32)
    perm = rng.permutation(k)
    wa = wv[:, :, perm]  # audio heads are column-permuted video heads

    params = {
        "heads_a": {"heads": {"proj": {
            "kernel": wa.copy(),
            "bias": np.zeros((h, k), np.float32),
        }}},
        "_wv": wv,
    }

    def make_batch_iter():
        yield {
            "video": jnp.asarray(feats),
            "audio": jnp.asarray(feats),
            "index": np.arange(n),
        }

    def head_logits_fn(p, f, modality):
        if modality == "v":
            return jnp.einsum("nd,hdk->hnk", f, jnp.asarray(wv))
        kernel = jnp.asarray(p["heads_a"]["heads"]["proj"]["kernel"])
        bias = jnp.asarray(p["heads_a"]["heads"]["proj"]["bias"])
        return jnp.einsum("nd,hdk->hnk", f, kernel) + bias[:, None, :]

    cfg = SKConfig(headcount=h, num_clusters=k, match=True,
                   sk_backend="xla", feat_dim=d)
    labels, _, _, info = cluster(
        encode_fn=lambda v, a: (v, a),
        head_logits_fn=head_logits_fn,
        make_batch_iter=make_batch_iter,
        params=params,
        n=n,
        cfg=cfg,
        selflabels=np.zeros((n, h), np.int32),
        marginal_state=MarginalState(),
        iter_num=0,
        np_rng=np.random.default_rng(2),
        true_labels=true,
    )
    assert "params" in info
    new_kernel = np.asarray(
        info["params"]["heads_a"]["heads"]["proj"]["kernel"]
    )
    # matching must have found the inverse permutation: aligned audio
    # kernels now equal the video kernels
    for head in range(h):
        np.testing.assert_allclose(
            new_kernel[head], wv[head], rtol=1e-4, atol=1e-4
        )


def test_cache_group_batches_single_decode_fresh_augs():
    """cache_group_batches=True: the batch iterator factory is consumed
    ONCE per SK step (one decode + H2D) while each group's encode still
    draws fresh augmentations (different rng -> different features)."""
    n, k, h = 64, 6, 2
    true, feats_v, feats_a, params = _make_problem(n, k, h)
    iter_calls = {"n": 0}

    def make_batch_iter():
        iter_calls["n"] += 1

        def gen():
            for s in range(0, n, 16):
                idx = np.arange(s, min(s + 16, n))
                yield {
                    "video": jnp.asarray(feats_v[idx]),
                    "audio": jnp.asarray(feats_a[idx]),
                    "index": idx,
                }

        return gen()

    encode_rngs = []

    def encode_fn(video, audio):
        # the loop-level encode_fn splits a fresh rng per call; model it
        # with a counter-salted jitter so group features differ
        encode_rngs.append(len(encode_rngs))
        salt = float(len(encode_rngs))
        return video + salt * 1e-3, audio + salt * 1e-3

    def head_logits_fn(p, feats, modality):
        w = p["wv"] if modality == "v" else p["wa"]
        return jnp.einsum("nd,hdk->hnk", feats, jnp.asarray(w))

    cfg = SKConfig(
        headcount=h, num_clusters=k, ind_groups=2, match=False,
        distribution="gauss", sk_backend="xla", cache_group_batches=True,
    )
    labels, _, metrics, _ = cluster(
        encode_fn=encode_fn,
        head_logits_fn=head_logits_fn,
        make_batch_iter=make_batch_iter,
        params=params,
        n=n,
        cfg=cfg,
        selflabels=np.zeros((n, h), np.int32),
        marginal_state=MarginalState(),
        iter_num=1,
        np_rng=np.random.default_rng(0),
        true_labels=true,
    )
    assert iter_calls["n"] == 1  # ONE decode for both groups
    # both groups ran a full aggregation pass (4 batches each)
    assert len(encode_rngs) == 8
    assert labels.shape == (n, h)
    assert np.isfinite(metrics["sk_cost"])
