"""Audio frontend: waveform -> log filterbank spectrogram.

Capability parity with /root/reference/datasets/audio_utils.py:14-112:
clip slicing at the video clip's start second (clamped to file end),
temporal jitter (+-0.5 s), volume jitter (x U(0.9, 1.1)), log filterbank
with ``winlen=0.02, winstep=0.01, nfft=1024`` and ``nfilt`` 40 (spec type 1)
or 257 (spec type 2), transposed to ``[nfilt, T]`` (T = 99 frames per second
at any sample rate), optional z-normalization ``(x - 1.93) / 17.89``.

The filterbank itself reimplements the published python_speech_features
algorithm (preemphasis 0.97, zero-padded rectangular-window framing,
``|rfft|^2 / nfft`` power spectrum, triangular mel filters, eps-floored log)
— that library is a dependency of the reference, not available here, and its
semantics must match for the reference z-norm constants to stay valid.

A batched JAX version for on-device spectrograms lives in
``selavi_tpu.ops.logmel`` (framing is a gather, mel projection is an MXU
matmul); this module is the host/NumPy reference used by the data loader
and by parity tests.
"""

from __future__ import annotations

import math
from typing import Optional

import numpy as np


def hz2mel(hz):
    return 2595.0 * np.log10(1.0 + np.asarray(hz, np.float64) / 700.0)


def mel2hz(mel):
    return 700.0 * (10.0 ** (np.asarray(mel, np.float64) / 2595.0) - 1.0)


import functools


@functools.lru_cache(maxsize=16)
def _mel_filterbank_cached(nfilt, nfft, samplerate, lowfreq, highfreq):
    return _mel_filterbank_impl(nfilt, nfft, samplerate, lowfreq, highfreq)


def mel_filterbank(
    nfilt: int,
    nfft: int,
    samplerate: int,
    lowfreq: float = 0.0,
    highfreq: Optional[float] = None,
) -> np.ndarray:
    """Triangular mel filterbank, shape [nfilt, nfft//2 + 1]. Cached per
    configuration (recomputing it dominated per-sample spectrogram cost)."""
    return _mel_filterbank_cached(nfilt, nfft, samplerate, lowfreq, highfreq)


def _mel_filterbank_impl(
    nfilt: int,
    nfft: int,
    samplerate: int,
    lowfreq: float = 0.0,
    highfreq: Optional[float] = None,
) -> np.ndarray:
    highfreq = highfreq or samplerate / 2.0
    lowmel, highmel = hz2mel(lowfreq), hz2mel(highfreq)
    melpoints = np.linspace(lowmel, highmel, nfilt + 2)
    bins = np.floor((nfft + 1) * mel2hz(melpoints) / samplerate).astype(int)

    fbank = np.zeros((nfilt, nfft // 2 + 1))
    for j in range(nfilt):
        for i in range(bins[j], bins[j + 1]):
            fbank[j, i] = (i - bins[j]) / max(bins[j + 1] - bins[j], 1)
        for i in range(bins[j + 1], bins[j + 2]):
            fbank[j, i] = (bins[j + 2] - i) / max(
                bins[j + 2] - bins[j + 1], 1
            )
    return fbank


def frame_count(slen: int, frame_len: int, frame_step: int) -> int:
    if slen <= frame_len:
        return 1
    return 1 + int(math.ceil((1.0 * slen - frame_len) / frame_step))


def _round_half_up(x: float) -> int:
    return int(math.floor(x + 0.5))


def frame_signal(
    signal: np.ndarray, frame_len: int, frame_step: int
) -> np.ndarray:
    """Zero-padded overlapping frames [num_frames, frame_len]."""
    slen = len(signal)
    numframes = frame_count(slen, frame_len, frame_step)
    padlen = (numframes - 1) * frame_step + frame_len
    padded = np.concatenate(
        [signal, np.zeros(padlen - slen, dtype=signal.dtype)]
    )
    idx = (
        np.arange(frame_len)[None, :]
        + np.arange(numframes)[:, None] * frame_step
    )
    return padded[idx]


def preemphasis(signal: np.ndarray, coeff: float = 0.97) -> np.ndarray:
    return np.concatenate([signal[:1], signal[1:] - coeff * signal[:-1]])


def logfbank(
    signal: np.ndarray,
    samplerate: int = 16000,
    winlen: float = 0.02,
    winstep: float = 0.01,
    nfilt: int = 40,
    nfft: int = 1024,
    lowfreq: float = 0.0,
    highfreq: Optional[float] = None,
    preemph: float = 0.97,
) -> np.ndarray:
    """Log mel filterbank energies, shape [num_frames, nfilt]."""
    signal = np.asarray(signal, np.float64)
    signal = preemphasis(signal, preemph)
    frame_len = _round_half_up(winlen * samplerate)
    frame_step = _round_half_up(winstep * samplerate)
    frames = frame_signal(signal, frame_len, frame_step)
    spec = np.fft.rfft(frames, nfft)
    pspec = (1.0 / nfft) * np.abs(spec) ** 2
    fb = mel_filterbank(nfilt, nfft, samplerate, lowfreq, highfreq)
    feat = pspec @ fb.T
    feat = np.where(feat == 0, np.finfo(np.float64).eps, feat)
    return np.log(feat)


def _logfbank_fast(wav: np.ndarray, sample_rate: int, nfilt: int):
    """logfbank via the C++ data runtime when built (single-sample call,
    ~2-3x faster than the numpy path), numpy otherwise. Parity between the
    two is covered by tests/test_native.py."""
    try:
        from selavi_tpu import native

        if native.available():
            out = native.logfbank_batch_native(
                wav[None].astype(np.float32), sample_rate, nfilt=nfilt,
                nthreads=1,
            )
            return out[0].T  # [T, nfilt] like logfbank()
    except Exception:
        pass
    return logfbank(
        wav, sample_rate, winlen=0.02, winstep=0.01, nfilt=nfilt, nfft=1024
    )


def get_spec(
    wav: np.ndarray,
    fr_sec: float,
    num_sec: int = 1,
    sample_rate: int = 48000,
    aud_spec_type: int = 1,
    use_volume_jittering: bool = False,
    use_temporal_jittering: bool = False,
    z_normalize: bool = False,
    rng: Optional[np.random.Generator] = None,
) -> np.ndarray:
    """Slice + augment + spectrogram. Returns [1, nfilt, T] float32.

    Mirrors /root/reference/datasets/audio_utils.py:14-74 exactly, with
    explicit RNG instead of the numpy global.
    """
    if rng is None:
        rng = np.random.default_rng()
    if use_temporal_jittering:
        fr_sec = fr_sec + rng.uniform(-0.5, 0.5)

    wav = _clip_window(wav, fr_sec, num_sec, sample_rate)

    if use_volume_jittering:
        wav = wav * rng.uniform(0.9, 1.1)

    nfilt = 40 if aud_spec_type == 1 else 257
    spec = _logfbank_fast(np.asarray(wav, np.float64), sample_rate, nfilt)
    spec = spec.astype(np.float32).T[None, :, :]  # [1, nfilt, T]
    if z_normalize:
        spec = (spec - 1.93) / 17.89
    return spec


def _clip_window(
    wav: np.ndarray, fr_sec: float, num_sec: int, sample_rate: int
) -> np.ndarray:
    """Exactly ``num_sec * sample_rate`` samples starting near ``fr_sec``.

    Clamps the window into the waveform (reference audio_utils.py:31-34 —
    but with the start clamped at 0: the reference's ``len(wav) - S``
    goes NEGATIVE on a too-short decode and silently slices the wrong
    window from the end) and zero-pads short waveforms at the tail so
    downstream shapes stay static."""
    target = int(sample_rate * num_sec)
    # clamp at 0 FIRST: temporal jittering makes fr_sec negative near
    # t=0, and a negative python slice start wraps around to an empty
    # clip (which the zero-pad would then silently turn into all-silence)
    fr_aud = max(int(np.round(fr_sec * sample_rate)), 0)
    if fr_aud + target > len(wav):
        fr_aud = max(len(wav) - target, 0)
    clip = wav[fr_aud : fr_aud + target]
    if len(clip) < target:
        clip = np.concatenate(
            [clip, np.zeros(target - len(clip), clip.dtype)]
        )
    return clip


def slice_clip_pcm(
    wav: np.ndarray,
    fr_sec: float,
    num_sec: int = 1,
    sample_rate: int = 48000,
    use_volume_jittering: bool = False,
    use_temporal_jittering: bool = False,
    rng: Optional[np.random.Generator] = None,
) -> np.ndarray:
    """Host half of the device-spectrogram path: the clip slicing and
    waveform jitters of ``get_spec`` (same clamping semantics), returning
    the raw [num_sec * sample_rate] float32 waveform for the fused
    on-device log-filterbank kernel."""
    if rng is None:
        rng = np.random.default_rng()
    if use_temporal_jittering:
        fr_sec = fr_sec + rng.uniform(-0.5, 0.5)
    clip = np.asarray(
        _clip_window(wav, fr_sec, num_sec, sample_rate), np.float32
    )
    if use_volume_jittering:
        clip = clip * np.float32(rng.uniform(0.9, 1.1))
    return clip


def spec_num_frames(num_sec: int, sample_rate: int) -> int:
    """Spectrogram time dimension for a clip of ``num_sec`` seconds."""
    frame_len = _round_half_up(0.02 * sample_rate)
    frame_step = _round_half_up(0.01 * sample_rate)
    return frame_count(num_sec * sample_rate, frame_len, frame_step)
