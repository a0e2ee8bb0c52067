"""Audio frontend: logfbank semantics and host<->device parity."""

import jax.numpy as jnp
import numpy as np

from selavi_tpu.data.audio import (
    frame_count,
    get_spec,
    logfbank,
    mel_filterbank,
    spec_num_frames,
)
from selavi_tpu.ops.logmel import logfbank_batch


def test_frame_count_99_per_second():
    # reference spectrograms are 99 frames per 1 second at any rate
    # (winlen 0.02, winstep 0.01)
    for sr in (48000, 24000, 16000):
        assert spec_num_frames(1, sr) == 99, sr


def test_mel_filterbank_shape_and_coverage():
    fb = mel_filterbank(40, 1024, 48000)
    assert fb.shape == (40, 513)
    assert (fb >= 0).all()
    assert fb.sum(axis=1).min() > 0  # every filter is non-empty


def test_logfbank_shape_and_finiteness():
    rng = np.random.default_rng(0)
    wav = (rng.standard_normal(24000) * 5000).astype(np.float64)
    feat = logfbank(wav, 24000, nfilt=40)
    assert feat.shape == (99, 40)
    assert np.isfinite(feat).all()


def test_get_spec_contract():
    rng = np.random.default_rng(0)
    wav = (rng.standard_normal(2 * 24000) * 5000).astype(np.float64)
    spec = get_spec(wav, 0.3, num_sec=1, sample_rate=24000,
                    aud_spec_type=2, rng=rng)
    assert spec.shape == (1, 257, 99)
    assert spec.dtype == np.float32
    # clip clamping: fr_sec beyond the end gets pulled back
    spec2 = get_spec(wav, 5.0, num_sec=1, sample_rate=24000,
                     aud_spec_type=1, rng=rng)
    assert spec2.shape == (1, 40, 99)


def test_short_waveform_clamps_to_start_and_pads():
    """A decode shorter than num_sec must still yield the full static
    clip shape (start clamped at 0, tail zero-padded) — the reference's
    ``len(wav) - S`` start goes negative and slices a wrong-length
    window, crashing collation with ragged shapes."""
    from selavi_tpu.data.audio import slice_clip_pcm

    rng = np.random.default_rng(1)
    wav = (rng.standard_normal(23000) * 5000).astype(np.float64)  # < 1 s
    spec = get_spec(wav, 0.7, num_sec=1, sample_rate=24000,
                    aud_spec_type=1, rng=rng)
    assert spec.shape == (1, 40, 99)
    clip = slice_clip_pcm(wav, 0.7, num_sec=1, sample_rate=24000)
    assert clip.shape == (24000,)
    np.testing.assert_array_equal(clip[:23000], wav.astype(np.float32))
    assert (clip[23000:] == 0).all()


def test_negative_start_clamps_to_zero():
    """Temporal jittering can push fr_sec negative near t=0; a negative
    python slice start would wrap to an EMPTY clip that zero-padding
    then silently turns into all-silence audio."""
    from selavi_tpu.data.audio import slice_clip_pcm

    rng = np.random.default_rng(2)
    wav = (rng.standard_normal(5 * 24000) * 5000).astype(np.float64)
    clip = slice_clip_pcm(wav, -0.2, num_sec=1, sample_rate=24000)
    assert clip.shape == (24000,)
    np.testing.assert_array_equal(
        clip, wav[:24000].astype(np.float32)
    )


def test_device_logfbank_matches_host():
    rng = np.random.default_rng(1)
    pcm = (rng.standard_normal((3, 24000)) * 8000).astype(np.float32)
    dev = np.asarray(
        logfbank_batch(jnp.asarray(pcm), samplerate=24000, nfilt=40)
    )
    for i in range(3):
        host = logfbank(pcm[i].astype(np.float64), 24000, nfilt=40).T
        np.testing.assert_allclose(dev[i], host, rtol=2e-3, atol=2e-3)


def test_z_normalize_constants():
    rng = np.random.default_rng(2)
    pcm = (rng.standard_normal((1, 24000)) * 8000).astype(np.float32)
    raw = np.asarray(logfbank_batch(jnp.asarray(pcm), samplerate=24000,
                                    nfilt=40))
    z = np.asarray(logfbank_batch(jnp.asarray(pcm), samplerate=24000,
                                  nfilt=40, z_normalize=True))
    np.testing.assert_allclose(z, (raw - 1.93) / 17.89, rtol=1e-5)
