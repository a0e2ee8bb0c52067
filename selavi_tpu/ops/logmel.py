"""On-device batched log filterbank spectrograms.

The reference computes spectrograms per-sample on the host CPU inside
DataLoader workers (python_speech_features ``logfbank``,
/root/reference/datasets/audio_utils.py:46-63) — a known input-pipeline
bottleneck. TPU-native version: ship raw PCM clips ``[B, S]`` to the device
and compute all spectrograms in one fused XLA program:

* framing = one gather into ``[B, F, frame_len]``;
* power spectrum = batched real FFT (XLA TPU FFT);
* mel projection = one ``[B*F, nfft/2+1] x [nfft/2+1, nfilt]`` matmul on the
  MXU;
* eps-floored log on the VPU.

Numerically matched to the host implementation in
``selavi_tpu.data.audio.logfbank`` (tested to ~1e-3 relative in fp32).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from selavi_tpu.data.audio import (
    _round_half_up,
    frame_count,
    mel_filterbank,
)


@functools.partial(
    jax.jit,
    static_argnames=(
        "samplerate",
        "nfilt",
        "nfft",
        "winlen",
        "winstep",
        "preemph",
        "z_normalize",
    ),
)
def logfbank_batch(
    pcm: jnp.ndarray,
    samplerate: int = 48000,
    nfilt: int = 257,
    nfft: int = 1024,
    winlen: float = 0.02,
    winstep: float = 0.01,
    preemph: float = 0.97,
    z_normalize: bool = False,
) -> jnp.ndarray:
    """PCM ``[B, S]`` (int16-scale floats) -> spectrograms ``[B, nfilt, F]``.

    Output matches ``get_spec``'s ``[1, nfilt, T]`` layout per sample
    (reference audio_utils.py:66-72), batched.
    """
    pcm = pcm.astype(jnp.float32)
    b, slen = pcm.shape
    frame_len = _round_half_up(winlen * samplerate)
    frame_step = _round_half_up(winstep * samplerate)
    nframes = frame_count(slen, frame_len, frame_step)

    # preemphasis
    pcm = jnp.concatenate(
        [pcm[:, :1], pcm[:, 1:] - preemph * pcm[:, :-1]], axis=1
    )

    # zero-pad then frame via gather
    padlen = (nframes - 1) * frame_step + frame_len
    pcm = jnp.pad(pcm, ((0, 0), (0, max(padlen - slen, 0))))
    idx = (
        np.arange(frame_len)[None, :]
        + np.arange(nframes)[:, None] * frame_step
    )
    frames = pcm[:, idx]  # [B, F, frame_len]

    spec = jnp.fft.rfft(frames, n=nfft, axis=-1)
    pspec = (jnp.real(spec) ** 2 + jnp.imag(spec) ** 2) / nfft

    fb = jnp.asarray(
        mel_filterbank(nfilt, nfft, samplerate).T, jnp.float32
    )  # [nfft//2+1, nfilt]
    feat = jnp.einsum(
        "bfk,kn->bfn", pspec, fb, preferred_element_type=jnp.float32
    )
    # floor at float64 eps to match the host/native frontends (they
    # replace zero-energy bins with np.finfo(float64).eps before the log,
    # audio.py:133 / data_runtime.cpp:87): log(eps64) = -36.04. Flooring
    # at float32 tiny instead gives -87.3 — a ~51-unit skew on silent or
    # zero-padded frames that shifts the z-normed feature distribution.
    feat = jnp.log(jnp.maximum(feat, jnp.float32(2.220446049250313e-16)))
    out = jnp.transpose(feat, (0, 2, 1))  # [B, nfilt, F]
    if z_normalize:
        out = (out - 1.93) / 17.89
    return out
