"""dual_data training end-to-end: two clips per sample, audio as
channel-stacked specs (host frontend) or [2,S] PCM (device frontend).

Regression for a Trainer-init bug where the model's audio stem was
initialized with 1 spectrogram channel while the dual batches carried 2
(reference contract: AVideoDataset.py:431-454 channel-stacks dual specs).
"""

import numpy as np
import pytest

from selavi_tpu.data.factory import build_dataset, example_shapes
from selavi_tpu.train.loop import Trainer

from test_train_smoke import make_args

# dual-clip end-to-end training runs — slow tier; the merge gate (plain pytest) still runs these
pytestmark = pytest.mark.slow


def _dual_args(tmp_path, **over):
    over.setdefault("num_data_samples", 16)
    over.setdefault("epochs", 1)
    over.setdefault("nopts", 1)
    args = make_args(tmp_path, dual_data="true", **over)
    return args


def test_example_shapes_dual_host_spec(tmp_path):
    args = _dual_args(tmp_path)
    ds = build_dataset(args)
    ex = ds.get_example(0, np.random.default_rng(0))
    f, t = ds.spec_shape()
    assert ex["audio"].shape == (f, t, 2)
    assert ex["video"].shape[0] == 2 * args.num_frames
    vshape, ashape = example_shapes(args, ds)
    assert ashape == (2, f, t, 2)


def test_example_shapes_dual_pcm(tmp_path):
    args = _dual_args(tmp_path, device_spectrogram="true")
    ds = build_dataset(args)
    ex = ds.get_example(0, np.random.default_rng(0))
    assert ex["audio_pcm"].shape == (
        2, args.num_sec_aud * args.aud_sample_rate
    )
    f, t = ds.spec_shape()
    vshape, ashape = example_shapes(args, ds)
    assert ashape == (2, f, t, 2)


@pytest.mark.parametrize("device_spec", [False, True])
def test_dual_data_trains(tmp_path, device_spec):
    args = _dual_args(
        tmp_path,
        **({"device_spectrogram": "true"} if device_spec else {}),
    )
    ds = build_dataset(args)
    trainer = Trainer(args, ds)
    history = trainer.fit()
    losses = [h["loss"] for h in history if "loss" in h]
    assert losses and np.isfinite(losses).all()

    if device_spec:
        return
    # dual-trained checkpoints stay evaluable: the eval dataset yields
    # single specs, which get_clusters tiles onto the 2-channel stem
    import pickle

    import get_clusters

    out = str(tmp_path / "ps.pkl")
    get_clusters.main([
        "--ds_name", "synthetic",
        "--num_data_samples", str(args.num_data_samples),
        "--weights_path", str(tmp_path / "checkpoint.msgpack"),
        "--output_path", out,
        "--headcount", "2", "--mlp_dim", "8",
        "--num_frames", str(args.num_frames),
        "--train_crop_size", str(args.train_crop_size),
        "--aud_sample_rate", str(args.aud_sample_rate),
        "--aud_spec_type", str(args.aud_spec_type),
        "--batch_size", "8", "--workers", "0",
        "--dual_data", "true",
    ])
    with open(out, "rb") as f:
        ps = pickle.load(f)
    assert len(ps[0]) == 2 and ps[0][0].shape == (16, 8)
