"""C++ data runtime: build, logfbank parity vs numpy, resize sanity."""

import numpy as np
import pytest

from selavi_tpu import native
from selavi_tpu.data.audio import logfbank


@pytest.fixture(scope="module")
def lib_available():
    ok = native.available()
    if not ok:
        pytest.skip("native build unavailable (no g++?)")
    return ok


def test_native_logfbank_matches_numpy(lib_available):
    rng = np.random.default_rng(0)
    pcm = (rng.standard_normal((4, 24000)) * 8000).astype(np.float32)
    out = native.logfbank_batch_native(pcm, 24000, nfilt=40)
    assert out.shape == (4, 40, 99)
    for i in range(4):
        ref = logfbank(pcm[i].astype(np.float64), 24000, nfilt=40).T
        # float32 FFT in the native path: ~1e-3 relative in log-energy
        # (immaterial to the bf16 network), 2x the double-FFT speed
        np.testing.assert_allclose(out[i], ref, rtol=2e-3, atol=2e-3)


def test_native_logfbank_257_filters(lib_available):
    rng = np.random.default_rng(1)
    pcm = (rng.standard_normal((2, 48000)) * 5000).astype(np.float32)
    out = native.logfbank_batch_native(pcm, 48000, nfilt=257)
    ref = logfbank(pcm[0].astype(np.float64), 48000, nfilt=257).T
    # atol 0.05 covers eps-floored silence bins (log ~ -36) where float32
    # underflow noise lands on either side of the floor
    np.testing.assert_allclose(out[0], ref, rtol=2e-3, atol=5e-2)


def test_native_resize_matches_numpy_twin(lib_available):
    """Both paths implement torch F.interpolate semantics (the
    reference's resize: 2-tap, half-pixel centers, no antialias) with
    the same double-precision math — bit-equal, upscale AND downscale."""
    from selavi_tpu.data.transforms import _resize_frames

    rng = np.random.default_rng(2)
    frames = rng.integers(0, 255, (3, 240, 320, 3), np.uint8)
    for new_h, new_w in ((48, 72), (480, 640), (128, 170), (17, 23)):
        out = native.resize_bilinear_u8(frames, new_h, new_w)
        assert out.shape == (3, new_h, new_w, 3)
        ref = _resize_frames(frames, new_h, new_w)
        diff = np.abs(out.astype(np.int16) - ref.astype(np.int16))
        # identical up to FP association order: a half-ULP difference can
        # cross the +0.5 rounding boundary on ~0.1% of pixels
        assert diff.max() <= 1, (new_h, new_w, diff.max())
        assert (diff > 0).mean() < 0.005, (new_h, new_w, (diff > 0).mean())


def test_native_resize_identity():
    # identity resize returns the same pixels (any backend)
    rng = np.random.default_rng(3)
    frames = rng.integers(0, 255, (2, 16, 16, 3), np.uint8)
    out = native.resize_bilinear_u8(frames, 16, 16)
    np.testing.assert_array_equal(out, frames)


def test_native_swap_match_recovers_planted_permutation(lib_available):
    rng = np.random.default_rng(5)
    k, n = 15, 400
    v = rng.random((n, k))
    true_perm = rng.permutation(k)
    a = v[:, true_perm] + rng.normal(0, 0.005, (n, k))
    cost = np.abs(v[:, :, None] - a[:, None, :]).sum(0)
    perm = native.greedy_swap_match_native(cost, steps=30000, seed=7)
    assert perm is not None
    total = sum(cost[i, perm[i]] for i in range(k))
    ideal = sum(cost[i, np.argsort(true_perm)[i]] for i in range(k))
    assert total <= ideal * 1.05
    # result quality matches the Python search
    from selavi_tpu.selflabel.matching import greedy_swap_match

    perm_py = greedy_swap_match(cost, steps=30000,
                                rng=np.random.default_rng(0))
    total_py = sum(cost[i, perm_py[i]] for i in range(k))
    assert total <= total_py * 1.05
