"""ctypes wrapper for the native PNG decoder (libtnerf_native.so).

Falls back cleanly: `decode` returns None when the shared library isn't
built or the file uses an unsupported PNG feature, and callers (e.g.
tnerf.data.png_io.read_png) drop back to PIL.
"""

from __future__ import annotations

import ctypes
import os
from typing import List, Optional

import numpy as np

_LIB = None
_TRIED = False
_HAS_ENCODE = False

# Reject absurd header dimensions before allocating (a corrupt/malicious
# IHDR could otherwise trigger a multi-GB np.empty before any validation).
MAX_DIM = 32768


def _stale(so: str) -> bool:
    """The .so predates a source file — rebuild BEFORE the first dlopen.

    A post-load rebuild cannot help: g++ rewrites the same inode, so a
    second dlopen of the path returns the already-mapped stale image
    (confirmed empirically).  Staleness must be decided from mtimes up
    front."""
    try:
        so_m = os.path.getmtime(so)
        src = os.path.join(os.path.dirname(so), "src")
        return any(
            os.path.getmtime(os.path.join(src, f)) > so_m
            for f in os.listdir(src)
        )
    except OSError:
        return False


def _lib():
    global _LIB, _TRIED, _HAS_ENCODE
    if _TRIED:
        return _LIB
    _TRIED = True
    so = os.path.join(os.path.dirname(__file__), "libtnerf_native.so")

    def _rebuild() -> bool:
        # Build on first use (the .so is deliberately not checked in);
        # failure is fine — callers fall back to PIL.
        try:
            from tnerf.native.build import build

            build(verbose=False)
        except Exception:
            return False
        return os.path.exists(so)

    if not os.path.exists(so):
        if not _rebuild():
            return None
    elif _stale(so):
        _rebuild()  # best-effort: a stale lib still serves its old symbols
    try:
        lib = ctypes.CDLL(so)
        lib.tnerf_png_info.argtypes = [
            ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_uint32),
            ctypes.POINTER(ctypes.c_uint32),
        ]
        lib.tnerf_png_info.restype = ctypes.c_int
        lib.tnerf_png_decode.argtypes = [
            ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_uint8),
            ctypes.c_uint32,
            ctypes.c_uint32,
        ]
        lib.tnerf_png_decode.restype = ctypes.c_int
        lib.tnerf_png_decode_batch.argtypes = [
            ctypes.POINTER(ctypes.c_char_p),
            ctypes.c_int,
            ctypes.POINTER(ctypes.c_uint8),
            ctypes.c_uint32,
            ctypes.c_uint32,
            ctypes.c_int,
            ctypes.POINTER(ctypes.c_int),
        ]
        lib.tnerf_png_decode_batch.restype = ctypes.c_int
        try:
            # Encoder symbols may be absent from a stale pre-encoder .so
            # (ctypes raises on first access): degrade to decode-only
            # rather than losing the whole native path.
            lib.tnerf_png_encode.argtypes = [
                ctypes.c_char_p,
                ctypes.POINTER(ctypes.c_uint8),
                ctypes.c_uint32,
                ctypes.c_uint32,
                ctypes.c_int,
                ctypes.c_int,
            ]
            lib.tnerf_png_encode.restype = ctypes.c_int
            lib.tnerf_png_encode_batch.argtypes = [
                ctypes.POINTER(ctypes.c_char_p),
                ctypes.c_int,
                ctypes.POINTER(ctypes.c_uint8),
                ctypes.c_uint32,
                ctypes.c_uint32,
                ctypes.c_int,
                ctypes.c_int,
                ctypes.c_int,
                ctypes.POINTER(ctypes.c_int),
            ]
            lib.tnerf_png_encode_batch.restype = ctypes.c_int
            _HAS_ENCODE = True
        except AttributeError:
            _HAS_ENCODE = False
        _LIB = lib
    except (OSError, AttributeError):
        _LIB = None
    return _LIB


def available() -> bool:
    return _lib() is not None


def decode(path: str) -> Optional[np.ndarray]:
    """Decode one PNG -> [H, W, 4] uint8, or None (fall back to PIL)."""
    lib = _lib()
    if lib is None:
        return None
    w = ctypes.c_uint32()
    h = ctypes.c_uint32()
    if lib.tnerf_png_info(path.encode(), ctypes.byref(w), ctypes.byref(h)) != 0:
        return None
    if not (0 < w.value <= MAX_DIM and 0 < h.value <= MAX_DIM):
        return None
    out = np.empty((h.value, w.value, 4), np.uint8)
    rc = lib.tnerf_png_decode(
        path.encode(),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        w.value,
        h.value,
    )
    return out if rc == 0 else None


def encode(path: str, image: np.ndarray, level: int = -1) -> bool:
    """Write [H, W, 3|4] uint8 as PNG. False -> caller falls back to PIL.

    False also when the loaded .so predates the encoder (decode-only
    degradation; _lib() rebuilds stale libraries by mtime up front, but
    a build failure leaves the old symbols serving)."""
    lib = _lib()
    if lib is None or not _HAS_ENCODE:
        return False
    arr = np.ascontiguousarray(image)
    if arr.dtype != np.uint8 or arr.ndim != 3 or arr.shape[2] not in (3, 4):
        return False
    h, w, c = arr.shape
    rc = lib.tnerf_png_encode(
        path.encode(),
        arr.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        w, h, c, level,
    )
    return rc == 0


def encode_batch(
    paths: List[str], images: np.ndarray, num_threads: int = 0,
    level: int = -1,
) -> bool:
    """Write [N, H, W, 3|4] uint8 frames in parallel. False -> fall back."""
    lib = _lib()
    if lib is None or not _HAS_ENCODE or not paths:
        return False
    arr = np.ascontiguousarray(images)
    if (
        arr.dtype != np.uint8 or arr.ndim != 4
        or arr.shape[0] != len(paths) or arr.shape[3] not in (3, 4)
    ):
        return False
    n, h, w, c = arr.shape
    cpaths = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
    statuses = (ctypes.c_int * n)()
    rc = lib.tnerf_png_encode_batch(
        cpaths, n,
        arr.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        w, h, c, num_threads, level, statuses,
    )
    return rc == 0


def decode_batch(
    paths: List[str], num_threads: int = 0
) -> Optional[np.ndarray]:
    """Decode same-sized PNGs in parallel -> [N, H, W, 4] uint8, or None."""
    lib = _lib()
    if lib is None or not paths:
        return None
    w = ctypes.c_uint32()
    h = ctypes.c_uint32()
    if lib.tnerf_png_info(paths[0].encode(), ctypes.byref(w), ctypes.byref(h)) != 0:
        return None
    if not (0 < w.value <= MAX_DIM and 0 < h.value <= MAX_DIM):
        return None
    n = len(paths)
    out = np.empty((n, h.value, w.value, 4), np.uint8)
    arr = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
    statuses = (ctypes.c_int * n)()
    rc = lib.tnerf_png_decode_batch(
        arr, n,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        w.value, h.value, num_threads, statuses,
    )
    return out if rc == 0 else None
