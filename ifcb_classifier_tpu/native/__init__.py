"""Native (C++) host-runtime components, loaded via ctypes.

Builds libroipack.so from roipack.cpp on first import (g++, ~1s) and caches
it next to the source. Falls back to numpy implementations when no compiler
is available, so the package never hard-requires the native path.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SO = os.path.join(_HERE, "libroipack.so")
_SRC = os.path.join(_HERE, "roipack.cpp")

_lib = None
_build_error = None


def _load():
    global _lib, _build_error
    if _lib is not None or _build_error is not None:
        return _lib
    try:
        if (not os.path.isfile(_SO)) or (
                os.path.getmtime(_SO) < os.path.getmtime(_SRC)):
            subprocess.run(
                ["g++", "-O3", "-march=native", "-shared", "-fPIC",
                 "-o", _SO, _SRC, "-lpthread"],
                check=True, capture_output=True, text=True)
        lib = ctypes.CDLL(_SO)
        lib.roipack_pack.restype = ctypes.c_int
        lib.roipack_pack.argtypes = [
            ctypes.c_void_p, ctypes.c_int64,
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_int32, ctypes.c_int32, ctypes.c_int32,
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int32]
        _lib = lib
    except Exception as e:  # no compiler / bad toolchain -> numpy fallback
        _build_error = e
    return _lib


def available() -> bool:
    return _load() is not None


def pack_rois_native(roi_bytes: np.ndarray, starts, heights, widths,
                     batch_size: int, canvas_size: int, nthreads: int = 8):
    """Pack ROIs straight from the .roi buffer into a canvas batch.

    roi_bytes: uint8 1-D array (the whole .roi file)
    starts/heights/widths: int64 arrays, one entry per ROI to pack
    Returns (canvas uint8 [B,S,S], sizes int32 [B,2]).
    """
    lib = _load()
    n = len(starts)
    assert n <= batch_size, (
        "pack_rois_native: {} ROIs exceed batch_size {} — the canvas is "
        "caller-allocated at batch_size rows; more would be out-of-bounds "
        "writes in the native path".format(n, batch_size))
    starts = np.ascontiguousarray(starts, np.int64)
    heights = np.ascontiguousarray(heights, np.int64)
    widths = np.ascontiguousarray(widths, np.int64)
    B, S = batch_size, canvas_size
    canvas = np.empty((B, S, S), np.uint8)
    sizes = np.empty((B, 2), np.int32)

    if lib is not None:
        roi_bytes = np.ascontiguousarray(roi_bytes, np.uint8)
        lib.roipack_pack(
            roi_bytes.ctypes.data, np.int64(roi_bytes.size),
            starts.ctypes.data, heights.ctypes.data, widths.ctypes.data,
            np.int32(n), np.int32(B), np.int32(S),
            canvas.ctypes.data, sizes.ctypes.data, np.int32(nthreads))
        return canvas, sizes

    # numpy fallback — same semantics
    canvas[:] = 0
    sizes[:] = 1
    total = roi_bytes.size
    for i in range(n):
        h, w, s0 = int(heights[i]), int(widths[i]), int(starts[i])
        if h <= 0 or w <= 0 or s0 < 0 or s0 + h * w > total:
            sizes[i] = (0, 0)
            continue
        ch, cw = min(h, S), min(w, S)
        img = roi_bytes[s0:s0 + h * w].reshape(h, w)
        canvas[i, :ch, :cw] = img[:ch, :cw]
        sizes[i] = (ch, cw)
    return canvas, sizes
