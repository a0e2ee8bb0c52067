"""Device-side preprocessing and the loader/prefetcher."""

import jax
import jax.numpy as jnp
import numpy as np

from selavi_tpu.data.loader import DataLoader, device_prefetch
from selavi_tpu.data.synthetic import SyntheticAVDataset
from selavi_tpu.data.transforms import (
    center_crop,
    random_crop,
    spatial_sampling,
    train_scale_range,
    uniform_crop,
)
from selavi_tpu.ops.preprocess import augment_video_batch, normalize_video


def test_normalize_video_matches_reference_formula():
    x = np.random.randint(0, 255, (2, 3, 8, 8, 3), np.uint8)
    out = np.asarray(normalize_video(jnp.asarray(x)))
    expected = (x.astype(np.float32) / 255.0 - 0.45) / 0.225
    np.testing.assert_allclose(out, expected, rtol=1e-6)


def test_augment_flip_only_is_normalize_or_mirror():
    x = np.random.randint(0, 255, (4, 2, 6, 6, 3), np.uint8)
    out = np.asarray(
        augment_video_batch(jnp.asarray(x), jax.random.PRNGKey(0))
    )
    norm = (x.astype(np.float32) / 255.0 - 0.45) / 0.225
    flipped = norm[:, :, :, ::-1, :]
    for b in range(4):
        ok = np.allclose(out[b], norm[b], atol=1e-5) or np.allclose(
            out[b], flipped[b], atol=1e-5
        )
        assert ok, b


def test_augment_dual_clips_flip_independently():
    """clips=2 (dual_data): each time-concatenated clip draws its own
    flip, matching the reference's per-clip clip_augmentation calls —
    across enough samples/keys the two halves must sometimes disagree."""
    x = np.random.randint(0, 255, (16, 4, 6, 6, 3), np.uint8)
    norm = (x.astype(np.float32) / 255.0 - 0.45) / 0.225
    flipped = norm[:, :, :, ::-1, :]
    disagree = 0
    for k in range(4):
        out = np.asarray(
            augment_video_batch(
                jnp.asarray(x), jax.random.PRNGKey(k), clips=2
            )
        )
        for b in range(x.shape[0]):
            halves = []
            for h in range(2):
                sl = slice(2 * h, 2 * h + 2)
                if np.allclose(out[b, sl], norm[b, sl], atol=1e-5):
                    halves.append(False)
                elif np.allclose(out[b, sl], flipped[b, sl], atol=1e-5):
                    halves.append(True)
                else:
                    raise AssertionError((k, b, h))
            disagree += halves[0] != halves[1]
    assert disagree > 0


def test_augment_colorjitter_grayscale_shapes_and_range():
    x = np.random.randint(0, 255, (8, 2, 6, 6, 3), np.uint8)
    out = np.asarray(
        augment_video_batch(
            jnp.asarray(x),
            jax.random.PRNGKey(1),
            colorjitter=True,
            grayscale=True,
        )
    )
    assert out.shape == x.shape
    assert np.isfinite(out).all()
    # Post-normalization jitter with factors in [0.6, 1.4] and NO clamp
    # (reference semantics): |out| <= 2.45 * 1.4^3 + blend slack.
    assert np.abs(out).max() <= 8.0


# ---- exact reference color-jitter parity (video_transforms.py:235-363) ----
# From-spec numpy oracle of the reference's jitter on TCHW frames. The
# reference grayscale puts 0.299 on channel index 2 (:262-266, documented
# as BGR) while the decoder feeds RGB (decoder.py:268) — the oracle
# replicates the code as written, quirk included.

def _ref_grayscale(images):  # [T, C, H, W]
    gray = (
        0.299 * images[:, 2] + 0.587 * images[:, 1] + 0.114 * images[:, 0]
    )
    out = np.zeros_like(images)
    out[:, 0] = gray
    out[:, 1] = gray
    out[:, 2] = gray
    return out


def _ref_blend(a, b, alpha):
    return a * alpha + b * (1.0 - alpha)


def _ref_jitter_op(op, alpha, images):
    if op == 0:  # brightness: blend with zeros (:308-324)
        return _ref_blend(images, np.zeros_like(images), alpha)
    if op == 1:  # contrast: blend with per-FRAME mean of gray (:327-345)
        g = _ref_grayscale(images)
        g[:] = g.mean(axis=(1, 2, 3), keepdims=True)
        return _ref_blend(images, g, alpha)
    # saturation: blend with gray (:348-363)
    return _ref_blend(images, _ref_grayscale(images), alpha)


def test_color_jitter_matches_reference_all_orders():
    """color_jitter_normalized == the reference transform for every one of
    the 6 application orders and random per-clip factors, on normalized
    frames (the space the reference jitters in, :473-495)."""
    from selavi_tpu.ops.preprocess import (
        _JITTER_PERMS,
        color_jitter_normalized,
    )

    rng = np.random.default_rng(0)
    b, t, h, w = 6, 3, 5, 4
    x = rng.normal(0.0, 1.0, (b, t, h, w, 3)).astype(np.float32)
    for perm_idx, perm in enumerate(_JITTER_PERMS):
        bf = rng.uniform(0.6, 1.4, b).astype(np.float32)
        cf = rng.uniform(0.6, 1.4, b).astype(np.float32)
        sf = rng.uniform(0.6, 1.4, b).astype(np.float32)
        got = np.asarray(
            color_jitter_normalized(
                jnp.asarray(x), jnp.asarray(bf), jnp.asarray(cf),
                jnp.asarray(sf), jnp.full((b,), perm_idx, np.int32),
            )
        )
        for i in range(b):
            ref = np.transpose(x[i], (0, 3, 1, 2))  # THWC -> TCHW
            alphas = {0: bf[i], 1: cf[i], 2: sf[i]}
            for op in perm:
                ref = _ref_jitter_op(op, alphas[op], ref)
            ref = np.transpose(ref, (0, 2, 3, 1))
            np.testing.assert_allclose(
                got[i], ref, rtol=1e-4, atol=1e-5,
                err_msg=f"perm {perm} clip {i}",
            )


def test_augment_grayscale_uses_reference_weights():
    """The standalone grayscale path (p=0.2) uses the reference's
    effective-RGB weights (0.114, 0.587, 0.299) on normalized frames."""
    x = np.random.randint(0, 255, (64, 1, 4, 4, 3), np.uint8)
    out = np.asarray(
        augment_video_batch(
            jnp.asarray(x), jax.random.PRNGKey(3),
            colorjitter=False, grayscale=True, flip=False,
        )
    )
    norm = (x.astype(np.float32) / 255.0 - 0.45) / 0.225
    expect_gray = (
        0.114 * norm[..., 0] + 0.587 * norm[..., 1] + 0.299 * norm[..., 2]
    )
    grayed = 0
    for i in range(64):
        if np.allclose(out[i], norm[i], atol=1e-5):
            continue  # not grayed
        assert np.allclose(
            out[i], np.repeat(expect_gray[i][..., None], 3, -1), atol=1e-4
        )
        grayed += 1
    assert 1 <= grayed < 64  # p=0.2: some but not all


def test_augment_colorjitter_gate_probability():
    """Jitter applies per clip with p=0.8; unjittered clips are exactly
    the normalized input (no clamp side effects)."""
    x = np.random.randint(0, 255, (128, 1, 4, 4, 3), np.uint8)
    out = np.asarray(
        augment_video_batch(
            jnp.asarray(x), jax.random.PRNGKey(5),
            colorjitter=True, grayscale=False, flip=False,
        )
    )
    norm = (x.astype(np.float32) / 255.0 - 0.45) / 0.225
    untouched = sum(
        np.allclose(out[i], norm[i], atol=1e-5) for i in range(128)
    )
    # P(untouched)=0.2: binomial(128, .2) far from 0 and far from 128/2
    assert 8 <= untouched <= 50


def test_crops_and_scale_ranges():
    frames = np.random.randint(0, 255, (3, 20, 30, 3), np.uint8)
    assert center_crop(frames, 16).shape == (3, 16, 16, 3)
    for idx in (0, 1, 2):
        assert uniform_crop(frames, 16, idx).shape == (3, 16, 16, 3)
    rng = np.random.default_rng(0)
    assert random_crop(frames, 16, rng).shape == (3, 16, 16, 3)
    assert train_scale_range(112) == (128, 160)
    # reference treats 128 crops like 112 (AVideoDataset.py:213-215)
    assert train_scale_range(128) == (128, 160)
    assert train_scale_range(224) == (256, 320)


def test_spatial_sampling_test_mode_deterministic():
    frames = np.random.randint(0, 255, (3, 40, 60, 3), np.uint8)
    a = spatial_sampling(frames, spatial_idx=1, min_scale=32, crop_size=32)
    b = spatial_sampling(frames, spatial_idx=1, min_scale=32, crop_size=32)
    np.testing.assert_array_equal(a, b)
    assert a.shape == (3, 32, 32, 3)


def test_loader_epoch_shuffle_and_determinism():
    ds = SyntheticAVDataset(num_samples=16, num_frames=2, crop_size=16,
                            aud_sample_rate=16000)
    loader = DataLoader(ds, batch_size=4, shuffle=True, seed=3)
    loader.set_epoch(0)
    b0 = [b["index"].tolist() for b in loader]
    loader.set_epoch(0)
    b0_again = [b["index"].tolist() for b in loader]
    assert b0 == b0_again  # deterministic per epoch
    loader.set_epoch(1)
    b1 = [b["index"].tolist() for b in loader]
    assert b0 != b1  # reshuffled across epochs
    # all samples covered, drop_last respected
    flat = [i for batch in b0 for i in batch]
    assert sorted(flat) == list(range(16))


def test_loader_workers_match_serial():
    ds = SyntheticAVDataset(num_samples=8, num_frames=2, crop_size=16,
                            aud_sample_rate=16000)
    serial = DataLoader(ds, batch_size=4, shuffle=False, num_workers=0)
    threaded = DataLoader(ds, batch_size=4, shuffle=False, num_workers=4)
    for bs, bt in zip(serial, threaded):
        np.testing.assert_array_equal(bs["video"], bt["video"])
        np.testing.assert_allclose(bs["audio"], bt["audio"], rtol=1e-6)


def test_device_prefetch_preserves_order_and_content():
    ds = SyntheticAVDataset(num_samples=8, num_frames=2, crop_size=16,
                            aud_sample_rate=16000)
    loader = DataLoader(ds, batch_size=2, shuffle=False)
    host = [b["index"].tolist() for b in loader]
    dev = [
        np.asarray(b["index"]).tolist()
        for b in device_prefetch(iter(loader), depth=3)
    ]
    assert host == dev


def test_loader_multiprocess_striding_covers_all():
    ds = SyntheticAVDataset(num_samples=10, num_frames=2, crop_size=16,
                            aud_sample_rate=16000)
    seen = []
    lengths = []
    for rank in range(4):
        loader = DataLoader(ds, batch_size=1, shuffle=True, seed=5,
                            drop_last=False, rank=rank, world_size=4)
        idxs = [int(b["index"][0]) for b in loader]
        lengths.append(len(idxs))
        seen.extend(idxs)
    # equal per-process batch counts (padding by wrap)
    assert len(set(lengths)) == 1
    # every sample covered at least once
    assert set(seen) == set(range(10))


def test_spatial_sampling_flipped_test_crops():
    frames = np.random.randint(0, 255, (2, 40, 60, 3), np.uint8)
    for idx in range(3):
        plain = spatial_sampling(frames, spatial_idx=idx, min_scale=32,
                                 crop_size=32)
        flipped = spatial_sampling(frames, spatial_idx=idx + 3,
                                   min_scale=32, crop_size=32)
        np.testing.assert_array_equal(plain[:, :, ::-1, :], flipped)


def test_loader_process_workers_match_serial():
    ds = SyntheticAVDataset(num_samples=8, num_frames=2, crop_size=16,
                            aud_sample_rate=16000)
    serial = DataLoader(ds, batch_size=4, shuffle=False, num_workers=0)
    proc = DataLoader(ds, batch_size=4, shuffle=False, num_workers=2,
                      worker_mode="process")
    try:
        for bs, bp in zip(serial, proc):
            np.testing.assert_array_equal(bs["video"], bp["video"])
            np.testing.assert_allclose(bs["audio"], bp["audio"], rtol=1e-6)
            np.testing.assert_array_equal(bs["index"], bp["index"])
    finally:
        proc.close()


class _StubDataset:
    """Minimal map-style dataset for loader index-math tests (no decode)."""

    def __init__(self, n):
        self.n = n

    def __len__(self):
        return self.n

    def get_example(self, idx, rng):
        return {
            "video": np.zeros((1, 2, 2, 3), np.uint8),
            "audio": np.zeros((4, 4), np.float32),
            "label": 0,
            "index": idx,
            "vid_idx": idx,
        }


def test_loader_equal_batch_counts_all_remainders():
    """Every rank must yield exactly the same number of batches for any
    (N, world_size, batch_size, drop_last) — a mismatch deadlocks the SPMD
    program at the extra make_array_from_process_local_data (reference
    DistributedSampler contract, /root/reference/main.py:93)."""
    world_size = 4
    for extra in range(world_size):  # sweep N mod world_size
        for batch_size in (1, 3):
            for drop_last in (True, False):
                n = 12 + extra
                ds = _StubDataset(n)
                counts = []
                covered = set()
                for rank in range(world_size):
                    loader = DataLoader(
                        ds, batch_size=batch_size, shuffle=True, seed=7,
                        drop_last=drop_last, rank=rank,
                        world_size=world_size,
                    )
                    loader.set_epoch(1)
                    batches = list(loader)
                    counts.append(len(batches))
                    assert len(batches) == len(loader), (
                        n, batch_size, drop_last, rank,
                    )
                    for b in batches:
                        covered.update(int(i) for i in b["index"])
                assert len(set(counts)) == 1, (n, batch_size, drop_last)
                if not drop_last and batch_size == 1:
                    assert covered == set(range(n))


def test_loader_equal_counts_dataset_smaller_than_world():
    """N < world_size (even < world_size/2): wrap padding must TILE the
    permutation — a single wrap left some ranks with zero indices."""
    world_size = 8
    for n in (1, 2, 3, 5):
        ds = _StubDataset(n)
        counts = []
        for rank in range(world_size):
            loader = DataLoader(
                ds, batch_size=1, shuffle=True, seed=3,
                drop_last=False, rank=rank, world_size=world_size,
            )
            loader.set_epoch(0)
            batches = list(loader)
            assert len(batches) == len(loader), (n, rank)
            counts.append(len(batches))
        assert set(counts) == {1}, (n, counts)


def test_device_prefetch_replicates_ragged_tail():
    """A drop_last=False eval loader's final batch can be smaller than
    the data axis; device_put rejects uneven shards, so the tail batch
    must fall back to replication instead of crashing the eval run
    (observed: UCF retrieval, 9537 videos @ bs 32 -> tail of 1 on 8
    chips)."""
    from selavi_tpu.data.loader import coalesced_device_batches
    from selavi_tpu.parallel.mesh import data_sharding, make_mesh

    mesh = make_mesh()
    dsh = data_sharding(mesh)
    n_dev = mesh.devices.size

    def batches():
        yield {"video": np.zeros((n_dev, 3), np.float32),
               "index": np.arange(n_dev, dtype=np.int32)}
        yield {"video": np.zeros((1, 3), np.float32),
               "index": np.zeros(1, np.int32)}

    out = list(device_prefetch(batches(), sharding=dsh))
    assert len(out) == 2
    assert len(out[0]["video"].sharding.device_set) == n_dev
    assert out[1]["video"].shape == (1, 3)  # replicated tail, no error

    out2 = list(coalesced_device_batches(batches(), sharding=dsh))
    assert len(out2) == 2 and out2[1]["video"].shape == (1, 3)


def test_loader_index_math_fuzz():
    """Randomized sweep of (N, world_size, batch_size, drop_last):
    equal per-rank batch counts, exact __len__, full coverage without
    drop_last, and only valid indices — the SPMD contract under any
    configuration."""
    rng = np.random.default_rng(123)
    for _ in range(40):
        n = int(rng.integers(1, 40))
        world = int(rng.integers(1, 9))
        bs = int(rng.integers(1, 6))
        drop_last = bool(rng.integers(0, 2))
        ds = _StubDataset(n)
        seed = int(rng.integers(0, 100))  # shared across ranks
        counts, covered = [], set()
        for rank in range(world):
            loader = DataLoader(
                ds, batch_size=bs, shuffle=True, seed=seed,
                drop_last=drop_last, rank=rank, world_size=world,
            )
            loader.set_epoch(int(n + world))
            batches = list(loader)
            assert len(batches) == len(loader), (n, world, bs, drop_last)
            counts.append(len(batches))
            for b in batches:
                idx = [int(i) for i in b["index"]]
                assert all(0 <= i < n for i in idx)
                covered.update(idx)
        assert len(set(counts)) == 1, (n, world, bs, drop_last, counts)
        if not drop_last and bs == 1:
            assert covered == set(range(n)), (n, world)


def test_lighting_jitter_reference_semantics():
    """PCA lighting jitter parity (reference video_transforms.py:366-393):
    per-channel shift sum_j eigvec[c,j]*alpha[j]*eigval[j], applied to
    channel c from the table row 2-c; alphastd=0 is the identity."""
    from selavi_tpu.data.transforms import lighting_jitter

    frames = np.random.default_rng(3).random((2, 4, 4, 3)).astype(np.float32)
    assert lighting_jitter(frames, 0.0, [1, 1, 1], np.eye(3),
                           np.random.default_rng(0)) is frames

    eigval = [0.2175, 0.0188, 0.0045]
    eigvec = [[-0.5675, 0.7192, 0.4009],
              [-0.5808, -0.0045, -0.8140],
              [-0.5836, -0.6948, 0.4203]]
    out = lighting_jitter(frames, 0.1, eigval, eigvec,
                          np.random.default_rng(7))
    alpha = np.random.default_rng(7).normal(0.0, 0.1, size=(1, 3))
    rgb = (np.asarray(eigvec) * alpha * np.asarray(eigval)[None, :]).sum(1)
    for c in range(3):
        np.testing.assert_allclose(
            out[..., c], frames[..., c] + rgb[2 - c], rtol=1e-6)
    assert out.dtype == np.float32
