"""ctypes bindings for the native host-side data-path ops (batch_ops.cpp).

Auto-builds ``libbatch_ops.so`` with the in-image g++ on first import when
missing; every entry point has a numpy fallback so the package works without a
toolchain."""

from __future__ import annotations

import ctypes
import os
import subprocess
from pathlib import Path
from typing import Optional

import numpy as np

_DIR = Path(__file__).parent
_LIB_PATH = _DIR / 'libbatch_ops.so'
_lib = None
_build_attempted = False


def _stale() -> bool:
    """True when the library is missing or older than batch_ops.cpp (an edited
    source must not be shadowed by a stale binary)."""
    if not _LIB_PATH.exists():
        return True
    src = _DIR / 'batch_ops.cpp'
    return src.exists() and src.stat().st_mtime > _LIB_PATH.stat().st_mtime


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _build_attempted
    if _lib is not None:
        return _lib
    if _stale() and not _build_attempted:
        _build_attempted = True
        try:
            subprocess.run(['make', '-C', str(_DIR), '--always-make'],
                           check=True, capture_output=True, timeout=120)
        except Exception:
            pass
    if _stale():
        # never load a binary older than its source — numpy fallback instead
        return None
    try:
        lib = ctypes.CDLL(str(_LIB_PATH))
    except OSError:
        return None

    lib.normalize_u8_to_f32.argtypes = [
        ctypes.POINTER(ctypes.c_uint8), ctypes.POINTER(ctypes.c_float),
        ctypes.c_int64, ctypes.c_int, ctypes.c_int]
    lib.center_crop_normalize.argtypes = [
        ctypes.POINTER(ctypes.c_uint8), ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.c_float), ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.c_int]
    lib.assemble_batch.argtypes = [
        ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8)),
        ctypes.POINTER(ctypes.c_float), ctypes.c_int, ctypes.c_int64,
        ctypes.c_int64, ctypes.c_int64, ctypes.c_int, ctypes.c_int,
        ctypes.c_int]
    lib.assemble_batch.restype = ctypes.c_int
    lib.cast_num_frames_f32.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
        ctypes.POINTER(ctypes.c_float), ctypes.c_int64, ctypes.c_int64]
    _lib = lib
    return _lib


def native_available() -> bool:
    return _load() is not None


def normalize_u8(frame: np.ndarray, bgr_to_rgb: bool = False) -> np.ndarray:
    """uint8 (..., c) -> float32 [0,1], optional BGR->RGB."""
    assert frame.dtype == np.uint8
    lib = _load()
    c = frame.shape[-1]
    if lib is None:
        out = frame.astype(np.float32) / 255.0
        if bgr_to_rgb and c == 3:
            out = out[..., ::-1].copy()
        return out
    frame = np.ascontiguousarray(frame)
    out = np.empty(frame.shape, np.float32)
    lib.normalize_u8_to_f32(
        frame.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        frame.size // c, c, int(bgr_to_rgb))
    return out


def assemble_batch(videos, bgr_to_rgb: bool = False,
                   num_threads: int = 4) -> np.ndarray:
    """List of identically-shaped uint8 (t, h, w, c) videos -> float32
    (b, t, h, w, c) normalized batch, multi-threaded in native code."""
    assert len(videos) > 0
    shape = videos[0].shape
    assert all(v.shape == shape and v.dtype == np.uint8 for v in videos)
    lib = _load()
    if lib is None:
        return np.stack([normalize_u8(v, bgr_to_rgb) for v in videos])

    videos = [np.ascontiguousarray(v) for v in videos]
    b = len(videos)
    t, h, w, c = shape
    out = np.empty((b, t, h, w, c), np.float32)
    ptrs = (ctypes.POINTER(ctypes.c_uint8) * b)(*[
        v.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)) for v in videos])
    rc = lib.assemble_batch(
        ptrs, out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        b, t, h, w, c, int(bgr_to_rgb), num_threads)
    assert rc == 0
    return out
