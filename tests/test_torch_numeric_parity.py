"""Numeric parity vs torch (CPU): the importer's weight mapping must make
our flax layers compute the same function as the reference's torch layers —
not just match shapes. Covers the (2+1)D conv pair, BatchNorm eval
semantics, and the MLPv2 head stack."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

# full-tower torch CPU parity forwards — slow tier; the merge gate (plain pytest) still runs these
pytestmark = pytest.mark.slow


def test_spatial_temporal_conv_pair_matches_torch_conv3d():
    rng = np.random.default_rng(0)
    b, t, h, w, ci, mid, co = 2, 4, 10, 10, 3, 5, 6
    x = rng.standard_normal((b, ci, t, h, w)).astype(np.float32)
    w_spatial = rng.standard_normal((mid, ci, 1, 3, 3)).astype(np.float32)
    w_temporal = rng.standard_normal((co, mid, 3, 1, 1)).astype(np.float32)

    with torch.no_grad():
        y1 = torch.nn.functional.conv3d(
            torch.from_numpy(x), torch.from_numpy(w_spatial),
            stride=(1, 1, 1), padding=(0, 1, 1),
        )
        y2 = torch.nn.functional.conv3d(
            y1, torch.from_numpy(w_temporal),
            stride=(1, 1, 1), padding=(1, 0, 0),
        ).numpy()  # [B, co, T, H, W]

    # ours: channels-last input, importer kernel transpose [O,I,*k]->[*k,I,O]
    x_j = jnp.asarray(np.transpose(x, (0, 2, 3, 4, 1)))
    k_s = jnp.asarray(np.transpose(w_spatial, (2, 3, 4, 1, 0)))
    k_t = jnp.asarray(np.transpose(w_temporal, (2, 3, 4, 1, 0)))
    y = jax.lax.conv_general_dilated(
        x_j, k_s, (1, 1, 1), [(0, 0), (1, 1), (1, 1)],
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
    )
    y = jax.lax.conv_general_dilated(
        y, k_t, (1, 1, 1), [(1, 1), (0, 0), (0, 0)],
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
    )
    ours = np.transpose(np.asarray(y), (0, 4, 1, 2, 3))
    np.testing.assert_allclose(ours, y2, rtol=1e-4, atol=1e-4)


def test_batchnorm_eval_matches_torch():
    rng = np.random.default_rng(1)
    c = 7
    x = rng.standard_normal((3, c, 5, 5)).astype(np.float32)
    weight = rng.standard_normal(c).astype(np.float32)
    bias = rng.standard_normal(c).astype(np.float32)
    mean = rng.standard_normal(c).astype(np.float32)
    var = rng.random(c).astype(np.float32) + 0.5

    bn = torch.nn.BatchNorm2d(c, eps=1e-5)
    with torch.no_grad():
        bn.weight.copy_(torch.from_numpy(weight))
        bn.bias.copy_(torch.from_numpy(bias))
        bn.running_mean.copy_(torch.from_numpy(mean))
        bn.running_var.copy_(torch.from_numpy(var))
        bn.eval()
        ref = bn(torch.from_numpy(x)).numpy()

    import flax.linen as nn

    model = nn.BatchNorm(use_running_average=True, momentum=0.9,
                         epsilon=1e-5)
    x_j = jnp.asarray(np.transpose(x, (0, 2, 3, 1)))  # NHWC
    out = model.apply(
        {
            "params": {"scale": jnp.asarray(weight),
                       "bias": jnp.asarray(bias)},
            "batch_stats": {"mean": jnp.asarray(mean),
                            "var": jnp.asarray(var)},
        },
        x_j,
    )
    ours = np.transpose(np.asarray(out), (0, 3, 1, 2))
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-4)


def test_mlpv2_head_matches_torch_sequential():
    """Reference MLPv2 (model.py:76-87) in eval mode vs our imported head."""
    rng = np.random.default_rng(2)
    d, hdim, k = 8, 6, 4
    x = rng.standard_normal((5, d)).astype(np.float32)

    lin1_w = rng.standard_normal((hdim, d)).astype(np.float32)
    bn_w = rng.random(hdim).astype(np.float32) + 0.5
    bn_b = rng.standard_normal(hdim).astype(np.float32)
    bn_mean = rng.standard_normal(hdim).astype(np.float32)
    bn_var = rng.random(hdim).astype(np.float32) + 0.5
    lin2_w = rng.standard_normal((k, hdim)).astype(np.float32)
    lin2_b = rng.standard_normal(k).astype(np.float32)

    with torch.no_grad():
        t1 = torch.nn.Linear(d, hdim, bias=False)
        t1.weight.copy_(torch.from_numpy(lin1_w))
        tbn = torch.nn.BatchNorm1d(hdim)
        tbn.weight.copy_(torch.from_numpy(bn_w))
        tbn.bias.copy_(torch.from_numpy(bn_b))
        tbn.running_mean.copy_(torch.from_numpy(bn_mean))
        tbn.running_var.copy_(torch.from_numpy(bn_var))
        tbn.eval()
        t2 = torch.nn.Linear(hdim, k)
        t2.weight.copy_(torch.from_numpy(lin2_w))
        t2.bias.copy_(torch.from_numpy(lin2_b))
        xt = torch.from_numpy(x)
        ref = t2(torch.relu(tbn(t1(xt)))).numpy()

    from selavi_tpu.models.heads import MLPHead

    head = MLPHead(num_classes=k, n_hidden=hdim)
    variables = {
        "params": {
            "hidden": {"kernel": jnp.asarray(lin1_w.T)},
            "bn": {"scale": jnp.asarray(bn_w), "bias": jnp.asarray(bn_b)},
            "proj": {"kernel": jnp.asarray(lin2_w.T),
                     "bias": jnp.asarray(lin2_b)},
        },
        "batch_stats": {
            "bn": {"mean": jnp.asarray(bn_mean),
                   "var": jnp.asarray(bn_var)},
        },
    }
    ours = np.asarray(head.apply(variables, jnp.asarray(x), train=False))
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-4)


def _flax_logits(model, params, batch_stats, video_btHWc, audio_bftc):
    out_v, out_a = model.apply(
        {"params": params, "batch_stats": batch_stats},
        jnp.asarray(video_btHWc), jnp.asarray(audio_bftc), train=False,
    )
    return np.asarray(out_v, np.float32), np.asarray(out_a, np.float32)


def _torch_logits(tmodel, video_btHWc, audio_bftc):
    tmodel.eval()
    with torch.no_grad():
        tv = torch.from_numpy(
            np.transpose(video_btHWc, (0, 4, 1, 2, 3)).copy()
        )
        ta = torch.from_numpy(
            np.transpose(audio_bftc, (0, 3, 1, 2)).copy()
        )
        outs_v, outs_a = tmodel(tv, ta)
    return (
        np.stack([o.numpy() for o in outs_v]),
        np.stack([o.numpy() for o in outs_a]),
    )


def test_full_model_logits_parity_export_then_torch():
    """Ours -> export_reference_state_dict -> torch rebuild of the
    reference AVModel (strict load = full schema check) -> [H,B,K] logits
    must agree (reference model.py:222-252)."""
    from tests._torch_ref import TorchAVModel
    from selavi_tpu.models import load_model
    from selavi_tpu.train.torch_export import export_reference_state_dict

    headcount, k = 3, 13
    model = load_model(headcount=headcount, num_classes=k)
    rng = jax.random.PRNGKey(0)
    video0 = jnp.zeros((2, 8, 32, 32, 3), jnp.float32)
    audio0 = jnp.zeros((2, 40, 51, 1), jnp.float32)
    variables = model.init({"params": rng, "dropout": rng}, video0, audio0,
                           train=False)
    nprng = np.random.default_rng(1)
    params = jax.tree.map(
        lambda a: np.asarray(a) + nprng.normal(0, 0.02, a.shape)
        .astype(a.dtype),
        variables["params"],
    )
    # non-trivial BN stats so eval-mode normalization is actually tested
    batch_stats = jax.tree.map(
        lambda a: np.abs(np.asarray(a))
        + nprng.uniform(0.1, 0.5, a.shape).astype(a.dtype),
        variables["batch_stats"],
    )

    sd = export_reference_state_dict(params, batch_stats, headcount,
                                     ddp_prefix="")
    tmodel = TorchAVModel(headcount=headcount, num_classes=k)
    # strict=True: every exported key must exist with the right shape AND
    # every torch parameter must be covered by the export
    tmodel.load_state_dict(
        {key: torch.from_numpy(np.ascontiguousarray(v)) for key, v in
         sd.items()},
        strict=True,
    )

    video = nprng.normal(0, 1, (2, 8, 32, 32, 3)).astype(np.float32)
    audio = nprng.normal(0, 1, (2, 40, 51, 1)).astype(np.float32)
    ours_v, ours_a = _flax_logits(model, params, batch_stats, video, audio)
    ref_v, ref_a = _torch_logits(tmodel, video, audio)
    assert ours_v.shape == ref_v.shape == (headcount, 2, k)
    np.testing.assert_allclose(ours_v, ref_v, atol=2e-3, rtol=1e-3)
    np.testing.assert_allclose(ours_a, ref_a, atol=2e-3, rtol=1e-3)


def test_full_model_logits_parity_torch_then_import(tmp_path):
    """The inverse: an independently-initialized torch reference model,
    saved as a reference-schema .pth, imported via torch_import — flax
    logits must reproduce the torch forward."""
    from tests._torch_ref import TorchAVModel
    from selavi_tpu.models import load_model
    from selavi_tpu.train.torch_import import import_reference_checkpoint

    headcount, k = 2, 7
    tmodel = TorchAVModel(headcount=headcount, num_classes=k)
    # make BN running stats non-trivial by actually running train steps
    tmodel.train()
    with torch.no_grad():
        for _ in range(2):
            tmodel(torch.randn(4, 3, 8, 32, 32), torch.randn(4, 1, 40, 51))

    path = str(tmp_path / "ref.pth")
    torch.save(
        {"model": {"module." + key: v for key, v in
                   tmodel.state_dict().items()}},
        path,
    )
    params, batch_stats = import_reference_checkpoint(
        path, headcount=headcount
    )

    model = load_model(headcount=headcount, num_classes=k)
    nprng = np.random.default_rng(3)
    video = nprng.normal(0, 1, (2, 8, 32, 32, 3)).astype(np.float32)
    audio = nprng.normal(0, 1, (2, 40, 51, 1)).astype(np.float32)
    ours_v, ours_a = _flax_logits(
        model,
        jax.tree.map(jnp.asarray, params),
        jax.tree.map(jnp.asarray, batch_stats),
        video, audio,
    )
    ref_v, ref_a = _torch_logits(tmodel, video, audio)
    np.testing.assert_allclose(ours_v, ref_v, atol=2e-3, rtol=1e-3)
    np.testing.assert_allclose(ours_a, ref_a, atol=2e-3, rtol=1e-3)
