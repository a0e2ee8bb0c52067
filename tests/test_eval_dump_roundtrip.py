"""get_clusters dump -> clustering_metrics roundtrip on synthetic logits:
the pickle schema and the k_means-style report agree end to end."""

import numpy as np
import pytest

from selavi_tpu.eval.get_clusters import dump_cluster_matrices, evaluate_dump

# train->dump->metrics chains over the full model — slow tier; the merge gate (plain pytest) still runs these
pytestmark = pytest.mark.slow


def test_dump_and_evaluate_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    n, d, k, h = 40, 16, 5, 2
    truth = rng.integers(0, k, n)
    centers = rng.standard_normal((k, d)) * 3
    feats = centers[truth] + rng.standard_normal((n, d)) * 0.1
    # head projections: head 1 is informative (class-aligned columns)
    w_rand = rng.standard_normal((d, k)) * 0.01
    w_good = centers.T  # project onto class centers [d, k]
    heads = [w_rand, w_good]

    def encode_fn(video, audio):
        return video, audio

    def head_logits_fn(feats_in, modality):
        import jax.numpy as jnp

        return jnp.stack(
            [jnp.asarray(feats_in) @ jnp.asarray(w) for w in heads]
        )

    def batch_iter():
        for s in range(0, n, 16):
            idx = np.arange(s, min(s + 16, n))
            yield {
                "video": feats[idx],
                "audio": feats[idx],
                "index": idx,
                "label": truth[idx],
            }

    out = str(tmp_path / "ps.pkl")
    ps_v, labels, ps_a = dump_cluster_matrices(
        encode_fn, head_logits_fn, batch_iter(), n, out, feat_dim=d
    )
    assert ps_v.shape == (h, n, k)
    np.testing.assert_array_equal(labels, truth)

    report = evaluate_dump(out, ncentroids=k, use_all_heads=True)
    # the informative head separates classes: high NMI and accuracy
    assert report["nmi"] > 0.9
    assert report["accuracy"] > 0.9
