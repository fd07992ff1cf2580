"""Native (C++) host-runtime components, loaded via ctypes.

Currently: the fused batch converter (float16/float32 CHW shard rows ->
float32 NHWC device batches, multi-threaded) used by the input pipeline —
the rebuild's equivalent of the host-side work inside the reference's C++
DataLoader feed queue (train.py:46).

The shared library is compiled on demand with g++ (cached next to the
source); every entry point has a NumPy fallback, so the framework works
without a toolchain.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "feeder.cpp")
_LIB = os.path.join(_HERE, "libfeeder.so")

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _build() -> bool:
    cmd = [
        "g++", "-O3", "-shared", "-fPIC", "-std=c++17", "-pthread",
        _SRC, "-o", _LIB,
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return True
    except Exception:
        return False


def get_lib() -> Optional[ctypes.CDLL]:
    """Load (building if needed) the native library; None if unavailable."""
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if not os.path.exists(_LIB) or os.path.getmtime(_LIB) < os.path.getmtime(_SRC):
            if not _build():
                return None
        try:
            lib = ctypes.CDLL(_LIB)
            lib.convert_f16chw_to_f32nhwc.argtypes = [
                ctypes.c_void_p, ctypes.c_void_p,
                ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ]
            lib.convert_f32chw_to_f32nhwc.argtypes = lib.convert_f16chw_to_f32nhwc.argtypes
            lib.convert_u8chw_to_f32nhwc.argtypes = [
                ctypes.c_void_p, ctypes.c_void_p,
                ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
                ctypes.c_int, ctypes.c_void_p, ctypes.c_void_p,
            ]
            _lib = lib
        except Exception:
            _lib = None
        return _lib


def convert_chw_to_nhwc_f32(batch: np.ndarray, nthreads: int = 0) -> np.ndarray:
    """[N,C,H,W] float16/float32 -> [N,H,W,C] float32, native when available.

    Falls back to NumPy (two passes) when the shared library can't be built.
    """
    assert batch.ndim == 4, batch.shape
    n, c, h, w = batch.shape
    lib = get_lib()
    if lib is None:
        return np.ascontiguousarray(
            batch.astype(np.float32).transpose(0, 2, 3, 1)
        )
    if nthreads <= 0:
        nthreads = min(os.cpu_count() or 1, 8)
    src = np.ascontiguousarray(batch)
    dst = np.empty((n, h, w, c), np.float32)
    if src.dtype == np.float16:
        fn = lib.convert_f16chw_to_f32nhwc
    elif src.dtype == np.float32:
        fn = lib.convert_f32chw_to_f32nhwc
    else:
        return np.ascontiguousarray(
            batch.astype(np.float32).transpose(0, 2, 3, 1)
        )
    fn(
        src.ctypes.data_as(ctypes.c_void_p),
        dst.ctypes.data_as(ctypes.c_void_p),
        n, c, h, w, nthreads,
    )
    return dst


def convert_u8chw_to_f32nhwc(
    batch: np.ndarray,
    mean,
    std,
    nthreads: int = 0,
) -> np.ndarray:
    """Raw uint8 [N,C,H,W] shard rows -> normalized float32 [N,H,W,C].

    Fuses the /255 + per-channel mean/std normalization (matching
    ``data.image.process_image``) into the transpose pass via per-channel
    LUTs. NumPy fallback when the shared library can't be built.
    """
    assert batch.ndim == 4 and batch.dtype == np.uint8, (batch.shape, batch.dtype)
    n, c, h, w = batch.shape
    mean = np.asarray(mean, np.float32)
    std = np.asarray(std, np.float32)
    lib = get_lib()
    if lib is None:
        from myimagecaptioningmodel_tpu.data import image as image_mod

        return np.ascontiguousarray(
            image_mod.normalize_uint8_chw(batch, mean, std).transpose(0, 2, 3, 1)
        )
    scale = np.ascontiguousarray(1.0 / (255.0 * std), np.float32)
    bias = np.ascontiguousarray(-mean / std, np.float32)
    if nthreads <= 0:
        nthreads = min(os.cpu_count() or 1, 8)
    src = np.ascontiguousarray(batch)
    dst = np.empty((n, h, w, c), np.float32)
    lib.convert_u8chw_to_f32nhwc(
        src.ctypes.data_as(ctypes.c_void_p),
        dst.ctypes.data_as(ctypes.c_void_p),
        n, c, h, w, nthreads,
        scale.ctypes.data_as(ctypes.c_void_p),
        bias.ctypes.data_as(ctypes.c_void_p),
    )
    return dst
