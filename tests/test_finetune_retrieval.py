"""Finetune LR schedule, model, optimizer groups; retrieval math."""

import jax
import pytest
import jax.numpy as jnp
import numpy as np

from selavi_tpu.eval.finetune import (
    FinetuneConfig,
    FinetuneModel,
    finetune_lr_factor,
    make_finetune_optimizer,
    make_finetune_steps,
)
from selavi_tpu.eval.retrieval import (
    average_features,
    retrieval,
)

# finetune epochs + retrieval feature sweeps — slow tier; the merge gate
# (plain pytest) still runs these
pytestmark = pytest.mark.slow


def test_finetune_lr_factor_curve():
    # warmup 2, milestones (6,10), gamma 0.05, multiplier 8
    f = lambda e: finetune_lr_factor(e, 2, (6, 10), 0.05)
    assert f(0) == 1.0
    assert f(1) == 1.0 + 7.0 * 1 / 2
    assert f(2) == 8.0
    assert f(3) == 8.0  # shifted milestones: 4, 8; e-w=1 < 4
    assert np.isclose(f(6), 8.0 * 0.05)  # e-w=4 hits milestone 4
    assert np.isclose(f(10), 8.0 * 0.05 ** 2)  # e-w=8 hits milestone 8
    # no scheduler
    assert finetune_lr_factor(5, 2, (6, 10), 0.05, use_scheduler=False) == 1.0


def test_finetune_model_shapes_and_variants():
    video = jnp.zeros((2, 4, 32, 32, 3))
    for kwargs in (
        {},
        {"use_bn": True},
        {"use_l2_norm": True, "use_dropout": True},
    ):
        model = FinetuneModel(num_classes=51, **kwargs)
        variables = model.init(
            {"params": jax.random.PRNGKey(0),
             "dropout": jax.random.PRNGKey(1)},
            video, train=False,
        )
        out = model.apply(variables, video, train=False)
        assert out.shape == (2, 51), kwargs


def test_finetune_optimizer_two_groups():
    cfg = FinetuneConfig(num_classes=5, epochs=4)
    model = FinetuneModel(num_classes=5)
    video = jnp.zeros((2, 4, 32, 32, 3))
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        video, train=False,
    )
    params = variables["params"]
    tx = make_finetune_optimizer(cfg, batches_per_epoch=2)
    opt_state = tx.init(params)
    train_step, eval_step = make_finetune_steps(model, tx)
    labels = jnp.zeros((2,), jnp.int32)
    video_u8 = jnp.zeros((2, 4, 32, 32, 3), jnp.uint8)
    p2, bs2, opt2, loss, logits = train_step(
        params, variables["batch_stats"], opt_state, video_u8, labels,
        jax.random.PRNGKey(2),
    )
    assert np.isfinite(float(loss))
    # classifier (head group) moved much more than the tower per unit grad:
    # compare relative update magnitudes
    d_head = np.abs(
        np.asarray(p2["classifier"]["kernel"])
        - np.asarray(params["classifier"]["kernel"])
    ).mean()
    assert d_head > 0  # head updated
    # frozen mode: tower params unchanged
    cfg_fe = FinetuneConfig(num_classes=5, epochs=4, feature_extract=True)
    tx_fe = make_finetune_optimizer(cfg_fe, batches_per_epoch=2)
    opt_fe = tx_fe.init(params)
    ts_fe, _ = make_finetune_steps(model, tx_fe)
    p3, _, _, _, _ = ts_fe(
        params, variables["batch_stats"], opt_fe, video_u8, labels,
        jax.random.PRNGKey(2),
    )
    base_delta = jax.tree.map(
        lambda a, b: float(np.abs(np.asarray(a) - np.asarray(b)).max()),
        p3["base"], params["base"],
    )
    assert max(jax.tree.leaves(base_delta)) == 0.0


def test_average_features_norm_and_mean():
    feats = np.array([[3.0, 4.0], [6.0, 8.0], [1.0, 0.0]])
    vids = np.array([7, 7, 9])
    labels = np.array([2, 2, 5])
    af, av, al = average_features(feats, vids, labels, norm_feats=True)
    by_vid = dict(zip(av.tolist(), af))
    np.testing.assert_allclose(by_vid[7], [0.6, 0.8], rtol=1e-6)
    np.testing.assert_allclose(by_vid[9], [1.0, 0.0], rtol=1e-6)
    assert dict(zip(av.tolist(), al.tolist())) == {7: 2, 9: 5}


def test_retrieval_recall():
    rng = np.random.default_rng(0)
    # 3 well-separated classes in feature space
    centers = np.array([[10, 0], [0, 10], [-10, -10]], np.float64)
    train_labels = np.repeat(np.arange(3), 60)
    train = centers[train_labels] + rng.normal(0, 0.5, (180, 2))
    val_labels = np.repeat(np.arange(3), 10)
    val = centers[val_labels] + rng.normal(0, 0.5, (30, 2))
    recalls = retrieval(train, train_labels, val, val_labels)
    assert recalls[1] == 100.0
    assert recalls[50] == 100.0
    # shuffled labels: R@1 should drop well below 100
    recalls_bad = retrieval(
        train, rng.permutation(train_labels), val, val_labels
    )
    assert recalls_bad[1] < 80.0


def test_cross_modal_retrieval_cli_dims(tmp_path):
    """a-v retrieval compares video and audio features, so both must come
    from the full model's 512-d GAP encoders (reference get_features with
    get_audio=True) — the truncated 2048-d pooled tower is v-v-only.
    Regression: the a-v path crashed with a NN feature-dim mismatch."""
    import video_retrieval

    cache = str(tmp_path / "feats.pkl")
    argv = [
        "--dataset", "synthetic", "--task", "a-v",
        "--num_data_samples", "6", "--clip_len", "16",
        "--batch_size", "3", "--workers", "0",
        "--headcount", "2", "--num_clusters", "8",
        "--aud_sample_rate", "24000", "--aud_spec_type", "1",
        "--feature_cache", cache,
    ]
    recalls = video_retrieval.main(argv)
    assert set(recalls) == {1, 5}
    # cache hit reproduces identically, including the audio features the
    # task needs (regression: a second dump used to strip them)
    recalls2 = video_retrieval.main(argv)
    assert recalls2 == recalls


def test_retrieval_cli_dual_data_checkpoint(tmp_path):
    """--dual_data: the 2-channel audio-stem init + spec tiling must flow
    through video_retrieval like get_clusters (ADVICE r2: a dual-trained
    checkpoint previously failed the audio-task state init)."""
    import video_retrieval

    argv = [
        "--dataset", "synthetic", "--task", "a-v",
        "--num_data_samples", "6", "--clip_len", "16",
        "--batch_size", "3", "--workers", "0",
        "--headcount", "2", "--num_clusters", "8",
        "--aud_sample_rate", "24000", "--aud_spec_type", "1",
        "--dual_data", "true",
    ]
    recalls = video_retrieval.main(argv)
    assert set(recalls) == {1, 5}
