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
