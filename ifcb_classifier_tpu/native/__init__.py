"""Native (C++) host-runtime components, loaded via ctypes.

Builds each .so from its .cpp on first use (g++, ~1s) and caches it next to
the source. Falls back to pure-Python implementations (numpy / PIL) when no
compiler or system library is available, so the package never hard-requires
the native path.

  roipack.cpp    .roi bytes -> canvas batch (deployment-inference hot loop)
  imgdecode.cpp  PNG/JPEG -> uint8 arrays, GIL-free (training-input hot loop)
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


def _build_and_load(so, src, extra_libs=()):
    # the cache key must be honest about BUILD FLAGS, not just source
    # mtime: IFCBNN_NATIVE_MARCH=native with a cached portable .so used to
    # be silently ignored (benchmarks under a false configuration). A
    # march-tagged artifact name gives each flag set its own cache slot.
    march = os.environ.get("IFCBNN_NATIVE_MARCH", "")
    if march:
        import re
        base, ext = os.path.splitext(so)
        so = base + "-" + re.sub(r"[^A-Za-z0-9_.+-]", "_", march) + ext
    # '<=' not '<': preserved-timestamp copies (rsync -a / tar of a
    # working tree) can land a STALE gitignored .so whose mtime equals
    # the newer source — an equal mtime is ambiguous, and a ~1 s rebuild
    # beats resurrecting pre-fix native code
    if (not os.path.isfile(so)) or (
            os.path.getmtime(so) <= os.path.getmtime(src)):
        # atomic build: concurrent first use (HostLoader decode threads,
        # several sharded processes on a shared filesystem) must never
        # CDLL a half-linked library — compile to a unique temp and
        # os.replace into place (last writer wins, artifacts equivalent).
        # Portable codegen by default: -march=native would bake the BUILD
        # host's ISA into a file cached on shared storage, and a job
        # landing on an older-microarch node SIGILLs (uncatchable).
        # Homogeneous clusters can opt into IFCBNN_NATIVE_MARCH=native.
        import threading
        tmp = "{}.{}-{}.tmp".format(so, os.getpid(),
                                    threading.get_ident())
        march = os.environ.get("IFCBNN_NATIVE_MARCH", "")
        flags = ["-O3"] + (["-march=" + march] if march else [])
        try:
            subprocess.run(
                ["g++", *flags, "-shared", "-fPIC", "-o", tmp, src,
                 "-lpthread", *extra_libs],
                check=True, capture_output=True, text=True)
            os.replace(tmp, so)
        finally:
            if os.path.exists(tmp):
                os.unlink(tmp)
    return ctypes.CDLL(so)


def _load():
    global _lib, _build_error
    if _lib is not None or _build_error is not None:
        return _lib
    try:
        lib = _build_and_load(_SO, _SRC)
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


# ------------------------------------------------------------------ decode --

_IMG_SO = os.path.join(_HERE, "libimgdecode.so")
_IMG_SRC = os.path.join(_HERE, "imgdecode.cpp")

_img_lib = None
_img_error = None


def _load_img():
    global _img_lib, _img_error
    if _img_lib is not None or _img_error is not None:
        return _img_lib
    try:
        lib = _build_and_load(_IMG_SO, _IMG_SRC, ("-lpng", "-ljpeg"))
        lib.imgdec_probe.restype = ctypes.c_int
        lib.imgdec_probe.argtypes = [
            ctypes.c_void_p, ctypes.c_int64,
            ctypes.c_void_p, ctypes.c_void_p]
        lib.imgdec_decode.restype = ctypes.c_int
        lib.imgdec_decode.argtypes = [
            ctypes.c_void_p, ctypes.c_int64, ctypes.c_void_p,
            ctypes.c_int32, ctypes.c_int32, ctypes.c_int32]
        _img_lib = lib
    except Exception as e:  # no compiler / no libpng-dev -> PIL fallback
        _img_error = e
    return _img_lib


def decode_available() -> bool:
    return _load_img() is not None


def decode_bytes_native(data, rgb: bool = True, max_dim: int = 0):
    """Decode PNG/JPEG bytes to uint8 (H,W,3) [rgb] or (H,W) [gray] with
    PIL-convert semantics, releasing the GIL for the C call (the reason this
    exists: PIL decode serializes HostLoader's decode threads; this doesn't).

    Returns None when the native path can't handle the input (not built,
    unrecognized container, 16-bit PNG, CMYK JPEG, corrupt file) — callers
    must fall back to PIL, which also turns real corruption into PIL's
    standard exceptions rather than a second error vocabulary.

    max_dim > 0 also declines images with a side beyond it BEFORE
    allocating — the probe is header-only, so a caller that will
    PIL-thumbnail oversized images anyway (data/pipeline.py decode_image)
    skips a guaranteed-discarded full native decode. Independent of
    max_dim, a hard total-size bound declines forged/corrupt headers
    (e.g. an IHDR claiming 2^24 x 2^24): np.empty on those raised
    MemoryError — an error vocabulary this function promises not to emit
    — and bypassed PIL's decompression-bomb guard."""
    lib = _load_img()
    if lib is None:
        return None
    buf = np.frombuffer(data, np.uint8)
    h = ctypes.c_int32()
    w = ctypes.c_int32()
    if lib.imgdec_probe(buf.ctypes.data, np.int64(buf.size),
                        ctypes.byref(h), ctypes.byref(w)) != 0:
        return None
    hh, ww = int(h.value), int(w.value)
    if hh <= 0 or ww <= 0 or hh * ww * 3 > (1 << 31):  # ~0.7 gigapixel
        return None  # forged/corrupt header: PIL's guards take over
    if max_dim and max(hh, ww) > max_dim:
        return None  # caller would discard it — let PIL decode+thumbnail
    shape = (hh, ww, 3) if rgb else (hh, ww)
    out = np.empty(shape, np.uint8)
    rc = lib.imgdec_decode(buf.ctypes.data, np.int64(buf.size),
                           out.ctypes.data, np.int32(bool(rgb)),
                           np.int32(hh), np.int32(ww))
    return out if rc == 0 else None
