"""Model shape / structure tests: tower output dims, stage downsampling,
head stacking, feature-vs-logits paths."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from selavi_tpu.models import AVModel, load_model
from selavi_tpu.models.r2plus1d import _midplanes


def _init(model, video_shape, audio_shape):
    rng = jax.random.PRNGKey(0)
    return model.init(
        {"params": rng, "dropout": rng},
        jnp.zeros(video_shape),
        jnp.zeros(audio_shape),
        train=False,
    )


def test_midplanes_matches_torchvision_formula():
    # torchvision Conv2Plus1D midplanes values for the 18-layer plan
    assert _midplanes(64, 64) == 144
    assert _midplanes(64, 128) == 230
    assert _midplanes(128, 128) == 288
    assert _midplanes(256, 256) == 576


def test_av_model_shapes_multihead():
    model = load_model(headcount=3, num_classes=28)
    v = jnp.zeros((2, 4, 32, 32, 3))
    a = jnp.zeros((2, 40, 51, 1))
    variables = _init(model, v.shape, a.shape)
    lv, la = model.apply(variables, v, a, train=False)
    assert lv.shape == (3, 2, 28)
    assert la.shape == (3, 2, 28)
    fv, fa = model.apply(variables, v, a, train=False, return_features=True)
    assert fv.shape == (2, 512)
    assert fa.shape == (2, 512)
    # heads applied to pooled features == full forward (eval mode)
    hv = model.apply(variables, fv, train=False, method=model.video_heads)
    np.testing.assert_allclose(
        np.asarray(hv), np.asarray(lv), rtol=2e-4, atol=2e-4
    )


def test_head_params_have_leading_head_axis():
    model = load_model(headcount=4, num_classes=16)
    variables = _init(model, (1, 4, 32, 32, 3), (1, 40, 51, 1))
    proj = variables["params"]["heads_v"]["heads"]["proj"]
    assert proj["kernel"].shape == (4, 512, 16)
    assert proj["bias"].shape == (4, 16)
    # heads are independently initialized (decorrelated)
    k = np.asarray(proj["kernel"])
    assert not np.allclose(k[0], k[1])


def test_video_tower_feature_dim_and_bn_stats():
    model = load_model(headcount=1, num_classes=8)
    variables = _init(model, (1, 4, 32, 32, 3), (1, 40, 51, 1))
    assert "batch_stats" in variables
    # train mode mutates batch stats
    out, updates = model.apply(
        variables,
        jnp.ones((2, 4, 32, 32, 3)),
        jnp.ones((2, 40, 51, 1)),
        train=True,
        rngs={"dropout": jax.random.PRNGKey(1)},
        mutable=["batch_stats"],
    )
    assert "batch_stats" in updates


def test_audio_arch_variants():
    from selavi_tpu.models.resnet_audio import AudioResNet

    x = jnp.zeros((1, 40, 51, 1))
    for arch, dim in [("resnet9", 512), ("resnet18", 512)]:
        tower = AudioResNet(arch=arch)
        variables = tower.init(jax.random.PRNGKey(0), x, train=False)
        out = tower.apply(variables, x, train=False)
        assert out.shape == (1, dim), arch


def test_linear_head_variant():
    model = load_model(headcount=2, num_classes=10, use_mlp=False)
    variables = _init(model, (1, 4, 32, 32, 3), (1, 40, 51, 1))
    lv, la = model.apply(
        variables,
        jnp.zeros((2, 4, 32, 32, 3)),
        jnp.zeros((2, 40, 51, 1)),
        train=False,
    )
    assert lv.shape == (2, 2, 10)


def test_aligned_midplanes_variant():
    from selavi_tpu.models.r2plus1d import R2Plus1D18, _aligned_midplanes

    assert _aligned_midplanes(64, 64) == 128
    assert _aligned_midplanes(64, 128) == 256
    assert _aligned_midplanes(256, 512) == 896
    m = R2Plus1D18(midplanes_mode="aligned")
    x = jnp.zeros((1, 4, 32, 32, 3))
    v = m.init(jax.random.PRNGKey(0), x, train=False)
    out = m.apply(v, x, train=False)
    assert out.shape == (1, 512)
    # spatial conv of layer1 block0 uses the aligned width
    k = v["params"]["layer1_block0"]["conv1"]["spatial"]["conv"]["kernel"]
    assert k.shape[-1] == 128
