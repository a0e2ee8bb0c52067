"""Reference-checkpoint importer: a synthetic state_dict in the reference's
torchvision layout must map onto our AVModel trees with exactly matching
structure and shapes, and the imported model must run."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from selavi_tpu.models import load_model
from selavi_tpu.train.torch_import import (
    import_audio_tower,
    import_heads,
    import_video_tower,
)


def _fake_video_sd(prefix="video_network.base."):
    """torchvision r2plus1d_18 layout with correct shapes."""
    sd = {}

    def conv(key, o, i, k):
        sd[key + ".weight"] = np.random.randn(o, i, *k).astype(np.float32)

    def bn(key, c):
        sd[key + ".weight"] = np.ones(c, np.float32)
        sd[key + ".bias"] = np.zeros(c, np.float32)
        sd[key + ".running_mean"] = np.zeros(c, np.float32)
        sd[key + ".running_var"] = np.ones(c, np.float32)

    conv(prefix + "stem.0", 45, 3, (1, 7, 7))
    bn(prefix + "stem.1", 45)
    conv(prefix + "stem.3", 64, 45, (3, 1, 1))
    bn(prefix + "stem.4", 64)

    from selavi_tpu.models.r2plus1d import _midplanes

    plan = [(64, 64, 1), (64, 128, 2), (128, 256, 2), (256, 512, 2)]
    for stage, (inp, out, stride) in enumerate(plan, 1):
        for b in range(2):
            cin = inp if b == 0 else out
            st = stride if b == 0 else 1
            t = f"{prefix}layer{stage}.{b}."
            # torchvision computes ONE midplanes per block and names the
            # block BNs conv1.1 / conv2.1 (inside the conv Sequentials)
            mid = _midplanes(cin, out)
            conv(t + "conv1.0.0", mid, cin, (1, 3, 3))
            bn(t + "conv1.0.1", mid)
            conv(t + "conv1.0.3", out, mid, (3, 1, 1))
            bn(t + "conv1.1", out)
            conv(t + "conv2.0.0", mid, out, (1, 3, 3))
            bn(t + "conv2.0.1", mid)
            conv(t + "conv2.0.3", out, mid, (3, 1, 1))
            bn(t + "conv2.1", out)
            if st != 1 or cin != out:
                conv(t + "downsample.0", out, cin, (1, 1, 1))
                bn(t + "downsample.1", out)
    return sd


def _fake_audio_sd(prefix="audio_network.base."):
    sd = {}

    def conv(key, o, i, k):
        sd[key + ".weight"] = np.random.randn(o, i, *k).astype(np.float32)

    def bn(key, c):
        sd[key + ".weight"] = np.ones(c, np.float32)
        sd[key + ".bias"] = np.zeros(c, np.float32)
        sd[key + ".running_mean"] = np.zeros(c, np.float32)
        sd[key + ".running_var"] = np.ones(c, np.float32)

    conv(prefix + "conv1", 64, 1, (7, 7))
    bn(prefix + "bn1", 64)
    plan = [(64, 64, 1), (64, 128, 2), (128, 256, 2), (256, 512, 2)]
    for stage, (inp, out, stride) in enumerate(plan, 1):
        t = f"{prefix}layer{stage}.0."
        conv(t + "conv1", out, inp, (3, 3))
        bn(t + "bn1", out)
        conv(t + "conv2", out, out, (3, 3))
        bn(t + "bn2", out)
        if stride != 1 or inp != out:
            conv(t + "downsample.0", out, inp, (1, 1))
            bn(t + "downsample.1", out)
    return sd


def _fake_heads_sd(headcount, k):
    sd = {}
    for tag in ("v", "a"):
        for i in range(headcount):
            hp = f"mlp_{tag}{i}." if headcount > 1 else f"mlp_{tag}."
            sd[hp + "block_forward.2.weight"] = np.random.randn(
                512, 512
            ).astype(np.float32)
            sd[hp + "block_forward.4.weight"] = np.ones(512, np.float32)
            sd[hp + "block_forward.4.bias"] = np.zeros(512, np.float32)
            sd[hp + "block_forward.4.running_mean"] = np.zeros(
                512, np.float32
            )
            sd[hp + "block_forward.4.running_var"] = np.ones(
                512, np.float32
            )
            sd[hp + "block_forward.8.weight"] = np.random.randn(
                k, 512
            ).astype(np.float32)
            sd[hp + "block_forward.8.bias"] = np.zeros(k, np.float32)
    return sd


def _assert_same_structure(ref_tree, got_tree, where):
    ref_flat = {
        jax.tree_util.keystr(p): np.shape(v)
        for p, v in jax.tree_util.tree_flatten_with_path(ref_tree)[0]
    }
    got_flat = {
        jax.tree_util.keystr(p): np.shape(v)
        for p, v in jax.tree_util.tree_flatten_with_path(got_tree)[0]
    }
    assert set(ref_flat) == set(got_flat), (
        where,
        sorted(set(ref_flat) ^ set(got_flat))[:8],
    )
    for key in ref_flat:
        assert ref_flat[key] == got_flat[key], (where, key)


def test_import_matches_model_structure_and_runs():
    headcount, k = 3, 12
    model = load_model(headcount=headcount, num_classes=k)
    rng = jax.random.PRNGKey(0)
    video = jnp.zeros((1, 4, 32, 32, 3))
    audio = jnp.zeros((1, 40, 51, 1))
    variables = model.init(
        {"params": rng, "dropout": rng}, video, audio, train=False
    )

    sd = {}
    sd.update(_fake_video_sd())
    sd.update(_fake_audio_sd())
    sd.update(_fake_heads_sd(headcount, k))

    vp, vbs = import_video_tower(sd)
    ap, abs_ = import_audio_tower(sd)
    hv_p, hv_bs = import_heads(sd, "v", headcount)
    ha_p, ha_bs = import_heads(sd, "a", headcount)
    params = {
        "video_network": vp, "audio_network": ap,
        "heads_v": hv_p, "heads_a": ha_p,
    }
    batch_stats = {
        "video_network": vbs, "audio_network": abs_,
        "heads_v": hv_bs, "heads_a": ha_bs,
    }

    _assert_same_structure(variables["params"], params, "params")
    _assert_same_structure(
        variables["batch_stats"], batch_stats, "batch_stats"
    )

    # imported weights actually run through the model
    out_v, out_a = model.apply(
        {
            "params": jax.tree.map(jnp.asarray, params),
            "batch_stats": jax.tree.map(jnp.asarray, batch_stats),
        },
        video,
        audio,
        train=False,
    )
    assert out_v.shape == (headcount, 1, k)
    assert np.isfinite(np.asarray(out_v)).all()


def test_import_single_head_uses_bare_names():
    """headcount==1 checkpoints use mlp_v / mlp_a without an index
    (reference model.py:201-208)."""
    headcount, k = 1, 7
    sd = _fake_heads_sd(headcount, k)
    assert "mlp_v.block_forward.2.weight" in sd
    params, stats = import_heads(sd, "v", headcount)
    assert params["heads"]["proj"]["kernel"].shape == (1, 512, k)
    assert stats["heads"]["bn"]["mean"].shape == (1, 512)
