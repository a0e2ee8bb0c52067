"""Packed shard cache: write/read round trip, crops, audio slicing,
end-to-end training from a packed shard."""

import time

import numpy as np

from selavi_tpu.data.loader import DataLoader
from selavi_tpu.data.packed import PackedAVDataset, write_packed_shard
from selavi_tpu.data.synthetic import SyntheticAVDataset


def _make_shard(tmp_path, n=12, crop=32, frames=2, sr=16000):
    src = SyntheticAVDataset(
        num_samples=n, num_classes=3, num_frames=frames, crop_size=crop,
        aud_sample_rate=sr, return_pcm=True,
    )
    path = str(tmp_path / "shard.bin")
    meta = write_packed_shard(src, path, seed=0)
    return src, path, meta


def test_roundtrip_bitexact(tmp_path):
    src, path, meta = _make_shard(tmp_path)
    ds = PackedAVDataset(path)
    assert len(ds) == len(src)
    for i in (0, 5, 11):
        stored = ds.get_example(i)
        orig = src.get_example(i, np.random.default_rng((0, i)))
        np.testing.assert_array_equal(stored["video"], orig["video"])
        np.testing.assert_array_equal(
            stored["audio_pcm"], orig["audio_pcm"].astype(np.float32)
        )
        assert stored["label"] == orig["label"]
    np.testing.assert_array_equal(ds.labels, src.labels[: len(ds)])
    ds.close()


def test_crop_and_audio_window(tmp_path):
    src, path, _ = _make_shard(tmp_path, crop=48, sr=16000)
    ds = PackedAVDataset(path, crop_size=32, mode="train",
                         num_sec=None, sample_rate=None)
    ex = ds.get_example(0, np.random.default_rng(1))
    assert ex["video"].shape == (2, 32, 32, 3)
    # deterministic center crop in test mode
    ds_test = PackedAVDataset(path, crop_size=32, mode="test")
    a = ds_test.get_example(0, np.random.default_rng(1))
    b = ds_test.get_example(0, np.random.default_rng(2))
    np.testing.assert_array_equal(a["video"], b["video"])
    ds.close()
    ds_test.close()


def test_loader_over_packed_shard(tmp_path):
    src, path, _ = _make_shard(tmp_path)
    ds = PackedAVDataset(path)
    loader = DataLoader(ds, batch_size=4, shuffle=True, seed=1)
    batches = list(loader)
    assert len(batches) == 3
    assert batches[0]["audio_pcm"].shape == (4, ds.pcm_len)
    # packed reads are much faster than re-generating samples
    t0 = time.time()
    for _ in range(3):
        for _ in loader:
            pass
    packed_t = time.time() - t0
    src_loader = DataLoader(src, batch_size=4, shuffle=True, seed=1)
    t0 = time.time()
    for _ in range(3):
        for _ in src_loader:
            pass
    src_t = time.time() - t0
    assert packed_t < src_t, (packed_t, src_t)
    ds.close()


def test_rgb_yuv420_roundtrip_smooth():
    """BT.601 conversion + 4:2:0 subsample reconstructs smooth content
    closely (chroma is the only lossy part; real video is natively 4:2:0)."""
    import jax.numpy as jnp

    from selavi_tpu.data.packed import rgb_to_yuv420
    from selavi_tpu.ops.preprocess import yuv420_to_rgb_batch

    t, h, w = 2, 32, 32
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    rgb = np.stack(
        [yy / h * 255, xx / w * 255, (yy + xx) / (h + w) * 255], axis=-1
    )
    video = np.broadcast_to(rgb, (t, h, w, 3)).astype(np.uint8)
    y, uv = rgb_to_yuv420(video)
    assert y.shape == (t, h, w) and uv.shape == (t, h // 2, w // 2, 2)
    back = np.asarray(
        yuv420_to_rgb_batch(jnp.asarray(y[None]), jnp.asarray(uv[None]))
    )[0]
    err = np.abs(back.astype(np.int32) - video.astype(np.int32))
    assert err.mean() < 2.0 and err.max() <= 12, (err.mean(), err.max())


def test_packed_yuv420_int16_shard_roundtrip(tmp_path):
    from selavi_tpu.data.loader import (
        DataLoader,
        decode_wire_batches,
        device_prefetch,
    )
    from selavi_tpu.data.packed import PackedAVDataset, write_packed_shard
    from selavi_tpu.data.synthetic import SyntheticAVDataset

    src = SyntheticAVDataset(
        num_samples=6, num_frames=2, crop_size=32, aud_sample_rate=16000,
        return_pcm=True,
    )
    p_rgb = str(tmp_path / "a.pack")
    p_yuv = str(tmp_path / "b.pack")
    m_rgb = write_packed_shard(src, p_rgb)
    m_yuv = write_packed_shard(
        src, p_yuv, video_format="yuv420", pcm_dtype="int16"
    )
    # video bytes halve, pcm bytes quarter
    vid = int(np.prod(m_rgb["video_shape"]))
    assert m_rgb["rec_bytes"] == vid + m_rgb["pcm_len"] * 4 + 4
    assert m_yuv["rec_bytes"] == vid // 2 + m_yuv["pcm_len"] * 2 + 4

    ds = PackedAVDataset(p_yuv, num_sec=1, sample_rate=16000)
    ex = ds.get_example(0, np.random.default_rng(0))
    assert ex["video_y"].shape == (2, 32, 32)
    assert ex["video_uv"].shape == (2, 16, 16, 2)
    assert ex["audio_pcm"].dtype == np.int16

    # wire batches decode on device into the standard batch contract
    loader = DataLoader(ds, batch_size=2, shuffle=False)
    batch = next(
        iter(decode_wire_batches(device_prefetch(iter(loader))))
    )
    assert batch["video"].dtype == np.uint8 or str(
        batch["video"].dtype
    ) == "uint8"
    assert batch["video"].shape == (2, 2, 32, 32, 3)
    assert str(batch["audio_pcm"].dtype) == "float32"

    # decoded RGB matches the source within chroma-subsampling tolerance
    src_rgb = PackedAVDataset(p_rgb, num_sec=1, sample_rate=16000)
    ref = src_rgb.get_example(0, np.random.default_rng(0))["video"]
    got = np.asarray(batch["video"][0])
    err = np.abs(got.astype(np.int32) - ref.astype(np.int32)).mean()
    assert err < 16.0, err  # synthetic noise background is chroma-hostile

    # int16 pcm round-trips the (already int16-scale) waveform
    ref_pcm = src_rgb.get_example(0, np.random.default_rng(0))["audio_pcm"]
    got_pcm = np.asarray(batch["audio_pcm"][0])
    np.testing.assert_allclose(got_pcm, np.round(ref_pcm), atol=1.0)


def test_packed_yuv420_even_aligned_crop(tmp_path):
    from selavi_tpu.data.packed import PackedAVDataset, write_packed_shard
    from selavi_tpu.data.synthetic import SyntheticAVDataset

    src = SyntheticAVDataset(
        num_samples=2, num_frames=2, crop_size=40, aud_sample_rate=16000,
        return_pcm=True,
    )
    p = str(tmp_path / "c.pack")
    write_packed_shard(src, p, video_format="yuv420")
    ds = PackedAVDataset(p, crop_size=32, num_sec=1, sample_rate=16000)
    for i in range(4):
        ex = ds.get_example(0, np.random.default_rng(i))
        assert ex["video_y"].shape == (2, 32, 32)
        assert ex["video_uv"].shape == (2, 16, 16, 2)
    ds_test = PackedAVDataset(p, crop_size=32, mode="test",
                              num_sec=1, sample_rate=16000)
    e1 = ds_test.get_example(0, np.random.default_rng(0))
    e2 = ds_test.get_example(0, np.random.default_rng(9))
    np.testing.assert_array_equal(e1["video_y"], e2["video_y"])


def test_trainer_runs_on_yuv420_int16_shard(tmp_path):
    """Full training loop over the wire-efficient shard format."""
    from selavi_tpu.config import parse_arguments
    from selavi_tpu.data.packed import PackedAVDataset, write_packed_shard
    from selavi_tpu.data.synthetic import SyntheticAVDataset
    from selavi_tpu.train.loop import Trainer

    src = SyntheticAVDataset(
        num_samples=16, num_classes=2, num_frames=2, crop_size=32,
        aud_sample_rate=16000, return_pcm=True,
    )
    p = str(tmp_path / "w.pack")
    write_packed_shard(src, p, video_format="yuv420", pcm_dtype="int16")
    argv = [
        "--ds_name", "packed", "--root_dir", p,
        "--num_frames", "2", "--train_crop_size", "32",
        "--aud_sample_rate", "16000", "--aud_spec_type", "2",
        "--epochs", "1", "--batch_size", "1", "--nopts", "1",
        "--headcount", "1", "--mlp_dim", "4", "--match", "false",
        "--workers", "0", "--compute_dtype", "float32",
        "--bn_warmup_batches", "1", "--dump_path", str(tmp_path),
    ]
    args = parse_arguments().parse_args(argv)
    ds = PackedAVDataset(p, crop_size=32, num_sec=1, sample_rate=16000)
    trainer = Trainer(args, ds)
    history = trainer.fit()
    losses = [h["loss"] for h in history if "loss" in h]
    assert losses and np.isfinite(losses).all()


def test_coalesced_batches_match_plain_prefetch(tmp_path):
    """One-transfer-per-batch coalescing is bit-exact vs per-field puts."""
    from selavi_tpu.data.loader import (
        DataLoader,
        coalesced_device_batches,
        decode_wire_batches,
        device_prefetch,
    )
    from selavi_tpu.data.packed import PackedAVDataset, write_packed_shard
    from selavi_tpu.data.synthetic import SyntheticAVDataset

    src = SyntheticAVDataset(
        num_samples=6, num_frames=2, crop_size=32, aud_sample_rate=16000,
        return_pcm=True,
    )
    p = str(tmp_path / "co.pack")
    write_packed_shard(src, p, video_format="yuv420", pcm_dtype="int16")
    ds = PackedAVDataset(p, num_sec=1, sample_rate=16000)

    loader = DataLoader(ds, batch_size=2, shuffle=False, drop_last=False)
    plain = list(decode_wire_batches(device_prefetch(iter(loader))))
    loader2 = DataLoader(ds, batch_size=2, shuffle=False, drop_last=False)
    co = list(
        decode_wire_batches(coalesced_device_batches(iter(loader2)))
    )
    assert len(plain) == len(co)
    for a, b in zip(plain, co):
        assert set(a) == set(b)
        for k in a:
            np.testing.assert_array_equal(np.asarray(a[k]), np.asarray(b[k]))
