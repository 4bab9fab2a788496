"""Native (C++) host runtime: fast wav IO / PCM conversion / resampling.

Compiled lazily with g++ into a shared library next to the source and bound
via ctypes (no pybind11). ``available()`` gates every use; the numpy paths
in ``rstnet_tpu/utils/audio.py`` remain the fallback, so the framework works
without a toolchain.
"""

from __future__ import annotations

import ctypes
import logging
import os
import subprocess
import threading
from pathlib import Path
from typing import Optional

import numpy as np

_HERE = Path(__file__).parent
_SRC = _HERE / "rstnet_native.cpp"
_SO = _HERE / "_rstnet_native.so"
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _build() -> bool:
    cmd = ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", "-pthread",
           str(_SRC), "-o", str(_SO)]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return True
    except Exception as e:  # noqa: BLE001
        logging.debug(f"native build failed: {e}")
        return False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if not _SO.exists() or _SO.stat().st_mtime < _SRC.stat().st_mtime:
            if not _build():
                return None
        try:
            lib = ctypes.CDLL(str(_SO))
        except OSError:
            return None
        lib.wav_read.restype = ctypes.c_long
        lib.wav_read.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_float), ctypes.c_long,
            ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
        ]
        lib.resample_linear.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_long,
            ctypes.POINTER(ctypes.c_float), ctypes.c_long,
        ]
        lib.float_to_pcm16.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_long,
            ctypes.POINTER(ctypes.c_int16),
        ]
        lib.pcm16_to_float.argtypes = [
            ctypes.POINTER(ctypes.c_int16), ctypes.c_long,
            ctypes.POINTER(ctypes.c_float),
        ]
        lib.wav_info.restype = ctypes.c_long
        lib.wav_info.argtypes = [
            ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
        ]
        lib.load_codec_batch.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.c_long,
            ctypes.POINTER(ctypes.c_long), ctypes.c_long, ctypes.c_long,
            ctypes.c_long, ctypes.c_long,
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_long), ctypes.c_int,
        ]
        _lib = lib
        return _lib


def available() -> bool:
    return _load() is not None


def read_wav(path: str) -> Optional[tuple[np.ndarray, int]]:
    """-> (float32 [channels, T], sr) or None on failure / unavailable."""
    lib = _load()
    if lib is None:
        return None
    try:
        # sample count is bounded by the file size (8-bit PCM worst case)
        max_samples = max(os.path.getsize(path), 64)
    except OSError:
        return None
    buf = np.empty(max_samples, np.float32)
    sr = ctypes.c_int(0)
    ch = ctypes.c_int(0)
    n = lib.wav_read(
        path.encode(), buf.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        max_samples, ctypes.byref(sr), ctypes.byref(ch),
    )
    if n < 0:
        return None
    data = buf[:n].reshape(-1, max(ch.value, 1)).T.copy()
    return data, sr.value


def resample_linear(wav: np.ndarray, sr_in: int, sr_out: int) -> Optional[np.ndarray]:
    lib = _load()
    if lib is None:
        return None
    if sr_in == sr_out:
        return wav.astype(np.float32)
    n_out = int(round(wav.shape[-1] * sr_out / sr_in))
    out = np.empty(wav.shape[:-1] + (n_out,), np.float32)
    for idx in np.ndindex(wav.shape[:-1]):
        src = np.ascontiguousarray(wav[idx], np.float32)
        lib.resample_linear(
            src.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), src.shape[0],
            out[idx].ctypes.data_as(ctypes.POINTER(ctypes.c_float)), n_out,
        )
    return out


def float_to_pcm16(audio: np.ndarray) -> Optional[bytes]:
    lib = _load()
    if lib is None:
        return None
    src = np.ascontiguousarray(audio.reshape(-1), np.float32)
    out = np.empty(src.shape[0], np.int16)
    lib.float_to_pcm16(
        src.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), src.shape[0],
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int16)),
    )
    return out.tobytes()


def pcm16_to_float(data: bytes) -> Optional[np.ndarray]:
    lib = _load()
    if lib is None:
        return None
    src = np.frombuffer(data, np.int16)
    out = np.empty(src.shape[0], np.float32)
    lib.pcm16_to_float(
        src.ctypes.data_as(ctypes.POINTER(ctypes.c_int16)), src.shape[0],
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
    )
    return out


def wav_info(path: str) -> Optional[tuple[int, int, int]]:
    """-> (n_frames, sample_rate, channels) from the header only, or None."""
    lib = _load()
    if lib is None:
        return None
    sr = ctypes.c_int(0)
    ch = ctypes.c_int(0)
    n = lib.wav_info(path.encode(), ctypes.byref(sr), ctypes.byref(ch))
    if n < 0:
        return None
    return int(n), sr.value, ch.value


def load_codec_batch(
    paths: list[str],
    starts: list[int],
    seg24: int,
    seg16: int,
    sr_main: int = 24000,
    sr_side: int = 16000,
    n_threads: int = 8,
) -> Optional[tuple[np.ndarray, np.ndarray, np.ndarray]]:
    """Parallel codec segment loader (windowed read + 24k/16k resample in
    C++ worker threads; the GIL is released for the whole batch).

    -> (batch24 [N, seg24], batch16 [N, seg16], status [N]; status[i]=0 ok)
    or None when the native library is unavailable.
    """
    lib = _load()
    if lib is None:
        return None
    n = len(paths)
    c_paths = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
    c_starts = np.asarray(starts, np.int64)
    out24 = np.empty((n, seg24), np.float32)
    out16 = np.empty((n, seg16), np.float32)
    status = np.empty(n, np.int64)
    lib.load_codec_batch(
        c_paths, n,
        c_starts.ctypes.data_as(ctypes.POINTER(ctypes.c_long)),
        seg24, seg16, sr_main, sr_side,
        out24.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        out16.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        status.ctypes.data_as(ctypes.POINTER(ctypes.c_long)),
        n_threads,
    )
    return out24, out16, status
