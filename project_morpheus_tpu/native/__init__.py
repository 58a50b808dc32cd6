"""Native (C++) host runtime: build + ctypes bindings with Python fallback.

The shared library is compiled on first use with g++ (cached next to the
source); if no toolchain is available the package degrades to the pure-
Python implementations in ``orchestrator/`` — which double as the oracle
for the equivalence tests in tests/test_native.py.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
from pathlib import Path
from typing import Optional

import numpy as np

_SRC = Path(__file__).parent / "pcm_ops.cpp"
_LIB = Path(__file__).parent / "libpcm_ops.so"

_lib: Optional[ctypes.CDLL] = None
_tried = False


def _build() -> bool:
    try:
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", "-o", str(_LIB), str(_SRC)],
            check=True,
            capture_output=True,
            timeout=120,
        )
        return True
    except Exception:
        return False


def load() -> Optional[ctypes.CDLL]:
    """Return the bound library, building it if needed; None if unavailable."""
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not _LIB.exists() or _LIB.stat().st_mtime < _SRC.stat().st_mtime:
        if not _build():
            return None
    try:
        lib = ctypes.CDLL(str(_LIB))
    except OSError:
        return None

    lib.pcm_ring_create.restype = ctypes.c_void_p
    lib.pcm_ring_create.argtypes = [ctypes.c_size_t]
    lib.pcm_ring_destroy.argtypes = [ctypes.c_void_p]
    lib.pcm_ring_size.restype = ctypes.c_size_t
    lib.pcm_ring_size.argtypes = [ctypes.c_void_p]
    lib.pcm_ring_free.restype = ctypes.c_size_t
    lib.pcm_ring_free.argtypes = [ctypes.c_void_p]
    lib.pcm_ring_write.restype = ctypes.c_size_t
    lib.pcm_ring_write.argtypes = [ctypes.c_void_p, ctypes.c_char_p, ctypes.c_size_t]
    lib.pcm_ring_read.restype = ctypes.c_size_t
    lib.pcm_ring_read.argtypes = [
        ctypes.c_void_p,
        ctypes.POINTER(ctypes.c_uint8),
        ctypes.c_size_t,
    ]
    lib.pcm_ring_reset.argtypes = [ctypes.c_void_p]
    lib.pcm_crossfade_join.restype = ctypes.c_size_t
    lib.pcm_crossfade_join.argtypes = [
        ctypes.POINTER(ctypes.c_int16), ctypes.c_size_t,
        ctypes.POINTER(ctypes.c_int16), ctypes.c_size_t,
        ctypes.c_size_t, ctypes.POINTER(ctypes.c_int16),
    ]
    lib.pcm_f32_to_i16.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.c_size_t,
        ctypes.POINTER(ctypes.c_int16),
    ]
    lib.pcm_i16_to_f32.argtypes = [
        ctypes.POINTER(ctypes.c_int16), ctypes.c_size_t,
        ctypes.POINTER(ctypes.c_float),
    ]
    lib.pcm_meter.restype = ctypes.c_double
    lib.pcm_meter.argtypes = [
        ctypes.POINTER(ctypes.c_int16), ctypes.c_size_t,
        ctypes.POINTER(ctypes.c_double),
    ]
    _lib = lib
    return _lib


def available() -> bool:
    return load() is not None


def enabled() -> bool:
    """Native host-path delegation is FLAG-GATED (ORPHEUS_NATIVE_PCM=1):
    the pure-Python twins in orchestrator/ are the default and the
    equivalence oracle (tests/test_native.py); flipping the flag swaps
    the stitcher crossfade and the PCM ring onto the C++ implementations
    — the reference's native host delegation pattern (SURVEY §2.3,
    llama.cpp/SNAC doing the byte work under a Python orchestrator)."""
    return (
        os.environ.get("ORPHEUS_NATIVE_PCM", "").lower() in ("1", "true", "on")
        and available()
    )


class NativeRing:
    """ctypes wrapper over the C++ PCM ring (API-compatible core ops)."""

    def __init__(self, capacity: int):
        lib = load()
        if lib is None:
            raise RuntimeError("native pcm_ops unavailable")
        self._lib = lib
        self._h = lib.pcm_ring_create(capacity)
        self.capacity = capacity

    def __del__(self):
        if getattr(self, "_h", None):
            self._lib.pcm_ring_destroy(self._h)
            self._h = None

    def __len__(self) -> int:
        return self._lib.pcm_ring_size(self._h)

    @property
    def free(self) -> int:
        return self._lib.pcm_ring_free(self._h)

    def write(self, data: bytes) -> int:
        return self._lib.pcm_ring_write(self._h, data, len(data))

    def read(self, size: int) -> bytes:
        buf = (ctypes.c_uint8 * size)()
        n = self._lib.pcm_ring_read(self._h, buf, size)
        return bytes(buf[:n])

    def reset(self) -> None:
        self._lib.pcm_ring_reset(self._h)


def crossfade_join(tail: np.ndarray, head: np.ndarray, overlap: int) -> np.ndarray:
    lib = load()
    if lib is None:
        raise RuntimeError("native pcm_ops unavailable")
    tail = np.ascontiguousarray(tail, np.int16)
    head = np.ascontiguousarray(head, np.int16)
    out = np.empty(tail.size + head.size, np.int16)
    n = lib.pcm_crossfade_join(
        tail.ctypes.data_as(ctypes.POINTER(ctypes.c_int16)), tail.size,
        head.ctypes.data_as(ctypes.POINTER(ctypes.c_int16)), head.size,
        overlap, out.ctypes.data_as(ctypes.POINTER(ctypes.c_int16)),
    )
    return out[:n]


def f32_to_i16(x: np.ndarray) -> np.ndarray:
    lib = load()
    if lib is None:
        raise RuntimeError("native pcm_ops unavailable")
    x = np.ascontiguousarray(x, np.float32)
    out = np.empty(x.size, np.int16)
    lib.pcm_f32_to_i16(
        x.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), x.size,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int16)),
    )
    return out


def meter(pcm: np.ndarray) -> tuple[float, float]:
    """Returns (rms, peak) in [0, 1]."""
    lib = load()
    if lib is None:
        raise RuntimeError("native pcm_ops unavailable")
    pcm = np.ascontiguousarray(pcm, np.int16)
    peak = ctypes.c_double()
    rms = lib.pcm_meter(
        pcm.ctypes.data_as(ctypes.POINTER(ctypes.c_int16)), pcm.size,
        ctypes.byref(peak),
    )
    return float(rms), float(peak.value)
