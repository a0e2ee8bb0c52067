"""ctypes bindings for the C++ host data runtime (data_runtime.cpp).

Auto-builds the shared library with g++ on first use (cached next to the
source); every entry point has a pure-numpy fallback so the framework works
without a compiler. Use ``available()`` to check which path is active.
"""

from __future__ import annotations

import ctypes
import logging
import os
import subprocess
import threading
from typing import Optional

import numpy as np

logger = logging.getLogger(__name__)

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "data_runtime.cpp")
_LIB = os.path.join(_HERE, "libselavi_data_runtime.so")
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_build_failed = False


def _build() -> Optional[str]:
    # compile to a per-pid temp name, then atomically rename: concurrent
    # processes (loader workers, a train + eval job) may race to build —
    # writing _LIB directly would let one process CDLL a half-written
    # binary another is still emitting
    tmp = f"{_LIB}.{os.getpid()}.tmp"
    cmd = [
        "g++", "-O3", "-march=native", "-std=c++17", "-shared", "-fPIC",
        "-o", tmp, _SRC, "-lpthread",
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True)
        os.replace(tmp, _LIB)
        return _LIB
    except (subprocess.CalledProcessError, FileNotFoundError) as e:
        logger.warning("native build failed (%s); using numpy fallbacks", e)
        try:
            os.remove(tmp)
        except OSError:
            pass
        return None


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _build_failed
    if _lib is not None or _build_failed:
        return _lib
    with _lock:
        if _lib is not None or _build_failed:
            return _lib
        # rebuild when the source is newer than the binary: the .so is a
        # local build artifact (git-ignored; -march=native makes it
        # host-specific), never a shippable file
        fresh = os.path.exists(_LIB) and (
            not os.path.exists(_SRC)  # .so-only deployment: trust it
            or os.path.getmtime(_LIB) >= os.path.getmtime(_SRC)
        )
        path = _LIB if fresh else _build()
        if path is None:
            _build_failed = True
            return None
        try:
            lib = ctypes.CDLL(path)
        except OSError:
            # stale/foreign binary (wrong ISA, truncated): rebuild once;
            # any further failure falls back to numpy (the module
            # contract), never propagates out of available()
            try:
                os.remove(path)
            except OSError:
                pass  # a sibling process may have removed it already
            path = _build()
            if path is None:
                _build_failed = True
                return None
            try:
                lib = ctypes.CDLL(path)
            except OSError as e:
                logger.warning(
                    "native library unloadable after rebuild (%s); "
                    "using numpy fallbacks", e,
                )
                _build_failed = True
                return None
        lib.selavi_logfbank_batch.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.POINTER(ctypes.c_double), ctypes.c_int,
            ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_double, ctypes.POINTER(ctypes.c_float), ctypes.c_int,
        ]
        lib.selavi_resize_bilinear_u8.argtypes = [
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.c_int, ctypes.POINTER(ctypes.c_uint8),
            ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ]
        lib.selavi_greedy_swap_match.argtypes = [
            ctypes.POINTER(ctypes.c_double), ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.c_int, ctypes.c_uint64,
            ctypes.POINTER(ctypes.c_int32),
        ]
        _lib = lib
        return _lib


def available() -> bool:
    return _load() is not None


def logfbank_batch_native(
    pcm: np.ndarray,
    samplerate: int,
    nfilt: int = 40,
    nfft: int = 1024,
    winlen: float = 0.02,
    winstep: float = 0.01,
    preemph: float = 0.97,
    nthreads: int = 0,
) -> np.ndarray:
    """pcm [B, S] float -> [B, nfilt, T] float32. Falls back to numpy."""
    from selavi_tpu.data.audio import (
        _round_half_up,
        frame_count,
        logfbank,
        mel_filterbank,
    )

    pcm = np.ascontiguousarray(pcm, np.float32)
    b, slen = pcm.shape
    frame_len = _round_half_up(winlen * samplerate)
    frame_step = _round_half_up(winstep * samplerate)
    nframes = frame_count(slen, frame_len, frame_step)

    lib = _load()
    if lib is None:
        out = np.stack(
            [
                logfbank(
                    pcm[i].astype(np.float64), samplerate,
                    winlen=winlen, winstep=winstep, nfilt=nfilt, nfft=nfft,
                    preemph=preemph,
                ).T
                for i in range(b)
            ]
        )
        return out.astype(np.float32)

    fb = np.ascontiguousarray(
        mel_filterbank(nfilt, nfft, samplerate), np.float64
    )
    out = np.empty((b, nfilt, nframes), np.float32)
    if nthreads <= 0:
        nthreads = min(b, os.cpu_count() or 1)
    lib.selavi_logfbank_batch(
        pcm.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        b, slen, samplerate,
        fb.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        nfilt, nfft, frame_len, frame_step, nframes,
        ctypes.c_double(preemph),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        nthreads,
    )
    return out


def resize_bilinear_u8(
    frames: np.ndarray, new_h: int, new_w: int, nthreads: int = 0
) -> np.ndarray:
    """frames [T, H, W, C] uint8 -> [T, newH, newW, C] uint8."""
    frames = np.ascontiguousarray(frames, np.uint8)
    t, h, w, c = frames.shape
    lib = _load()
    if lib is None:
        from selavi_tpu.data.transforms import _resize_frames

        return _resize_frames(frames, new_h, new_w)
    out = np.empty((t, new_h, new_w, c), np.uint8)
    if nthreads <= 0:
        nthreads = min(t, os.cpu_count() or 1)
    lib.selavi_resize_bilinear_u8(
        frames.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        t, h, w, c,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        new_h, new_w, nthreads,
    )
    return out


def greedy_swap_match_native(
    cost: np.ndarray,
    steps: int = 50000,
    restarts: int = 2,
    patience: int = 1000,
    seed: int = 1,
) -> Optional[np.ndarray]:
    """C++ greedy swap search over the K x K cost matrix; returns None when
    the native library is unavailable (callers fall back to numpy)."""
    lib = _load()
    if lib is None:
        return None
    cost = np.ascontiguousarray(cost, np.float64)
    k = cost.shape[0]
    out = np.empty(k, np.int32)
    lib.selavi_greedy_swap_match(
        cost.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        k, steps, restarts, patience, ctypes.c_uint64(seed),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
    )
    return out
