"""Native (C++) host kernels for the data loader.

The reference ships no native code (SURVEY.md §2.4); this package provides
a beyond-parity C++ path for the loader's hot loop — mel featurization of
the BEAT/DnD audio corpus at dataset construction (reference
dataset.py:183,284,506-520).  Built on demand with the baked-in ``g++``
(no pybind11 required — plain C ABI via ctypes), cached next to the
source, and always optional: ``data/audio.py`` falls back to the numpy
implementation when a compiler is unavailable or
``CONVOFUSION_TPU_NATIVE=0`` is set.
"""
from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import threading

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "melspec.cc")
_lock = threading.Lock()
_lib = None
_tried = False


def _build() -> str | None:
    with open(_SRC, "rb") as f:
        tag = hashlib.sha1(f.read()).hexdigest()[:12]
    cache_dir = os.environ.get(
        "CONVOFUSION_TPU_NATIVE_CACHE",
        os.path.join(os.path.expanduser("~"), ".cache", "convofusion_tpu"))
    os.makedirs(cache_dir, exist_ok=True)
    so = os.path.join(cache_dir, f"libmelspec-{tag}.so")
    if os.path.exists(so):
        return so
    # per-process temp name so concurrent builders can't interleave
    # output; os.replace is atomic, last writer wins with a valid file
    tmp = f"{so}.{os.getpid()}.tmp"
    cmd = ["g++", "-O3", "-shared", "-fPIC", "-fopenmp", _SRC, "-o", tmp]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
    except Exception:
        try:  # retry without OpenMP (minimal toolchains)
            cmd.remove("-fopenmp")
            subprocess.run(cmd, check=True, capture_output=True,
                           timeout=120)
        except Exception:
            return None
    os.replace(tmp, so)
    return so


def load():
    """ctypes handle to the melspec library, or None if unavailable."""
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if os.environ.get("CONVOFUSION_TPU_NATIVE", "1") == "0":
            return None
        so = _build()
        if so is None:
            return None
        try:
            lib = ctypes.CDLL(so)
            lib.melspec_power.restype = ctypes.c_int
            lib.melspec_power.argtypes = [
                ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
                ctypes.c_int, ctypes.c_int, ctypes.c_int,
                ctypes.POINTER(ctypes.c_float),
                ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
            ]
        except (OSError, AttributeError):
            # unloadable cached artifact (missing libgomp, corruption,
            # missing symbol): drop it and fall back to numpy rather than
            # crash the loader
            try:
                os.unlink(so)
            except OSError:
                pass
            return None
        _lib = lib
    return _lib


def available() -> bool:
    return load() is not None


def melspec_power(y: np.ndarray, fb: np.ndarray, n_fft: int,
                  hop_length: int) -> np.ndarray | None:
    """(n,) float32 signal -> (n_frames, n_mels) float32 power mel.

    Exact native equivalent of ``stft_power(y) @ fb.T``
    (data/audio.py:91-112).  Returns None if the native lib is absent.
    """
    lib = load()
    if lib is None:
        return None
    y = np.ascontiguousarray(y, np.float32)
    fb = np.ascontiguousarray(fb, np.float32)
    n_mels, n_bins = fb.shape
    assert n_bins == n_fft // 2 + 1, (fb.shape, n_fft)
    pad = n_fft // 2
    n_frames = 1 + (len(y) + 2 * pad - n_fft) // hop_length
    if n_frames <= 0:
        return np.zeros((0, n_mels), np.float32)
    out = np.empty((n_frames, n_mels), np.float32)
    rc = lib.melspec_power(
        y.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), len(y),
        n_fft, hop_length, n_mels,
        fb.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), n_frames)
    if rc != 0:
        return None
    return out
