"""ctypes bindings for the native data-plane (threaded JPEG decode + ADM crop).

The C++ library (``native/dataplane.cpp``, built by
``scripts/build_native.sh`` into ``native/libdataplane.so``) is the
TPU-host equivalent of the reference input path's native parts (torch C++
DataLoader workers + PIL C decoders feeding ``src/data/dataset/imagenet.py``
of hhhhzp/DeCo). Everything degrades gracefully: if the .so is missing or
``DECO_NATIVE_DECODE=0``, callers fall back to the PIL pipeline in
:mod:`deco_tpu.data.imagenet`, which is pixel-equivalent (within +-1 LSB of
resampling rounding — tests/test_native_dataplane.py).
"""

from __future__ import annotations

import ctypes
import os
from typing import List, Optional, Sequence, Tuple

import numpy as np

# built OUTSIDE the package dir (a bare .so inside it would look like a
# broken CPython extension module to pkgutil walkers)
_LIB_PATH = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), "native", "libdataplane.so")
_lib = None
_checked = False


def load() -> Optional[ctypes.CDLL]:
    """The data-plane library, or None (not built / disabled)."""
    global _lib, _checked
    if _checked:
        return _lib
    _checked = True
    if os.environ.get("DECO_NATIVE_DECODE", "1") == "0":
        return None
    if not os.path.exists(_LIB_PATH):
        return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
        lib.dp_version.restype = ctypes.c_int
        if lib.dp_version() != 1:
            return None
        lib.dp_decode_jpeg_adm.restype = ctypes.c_int
        lib.dp_decode_jpeg_adm.argtypes = [
            ctypes.c_char_p, ctypes.c_size_t, ctypes.c_int, ctypes.c_void_p]
        lib.dp_decode_jpeg_adm_batch.restype = ctypes.c_int
        lib.dp_decode_jpeg_adm_batch.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_size_t),
            ctypes.POINTER(ctypes.c_size_t), ctypes.c_int, ctypes.c_int,
            ctypes.c_void_p, ctypes.POINTER(ctypes.c_int), ctypes.c_int]
        lib.dp_resize.restype = ctypes.c_int
        lib.dp_resize.argtypes = [
            ctypes.c_void_p, ctypes.c_int, ctypes.c_int, ctypes.c_void_p,
            ctypes.c_int, ctypes.c_int, ctypes.c_int]
        _lib = lib
    except OSError:
        _lib = None
    return _lib


def available() -> bool:
    return load() is not None


def decode_jpeg_adm(jpeg_bytes: bytes, resolution: int) -> Optional[np.ndarray]:
    """One JPEG -> (resolution, resolution, 3) uint8 via the ADM center crop.
    None on decode failure (caller falls back to PIL)."""
    lib = load()
    if lib is None:
        return None
    out = np.empty((resolution, resolution, 3), np.uint8)
    rc = lib.dp_decode_jpeg_adm(jpeg_bytes, len(jpeg_bytes), resolution,
                                out.ctypes.data_as(ctypes.c_void_p))
    return out if rc == 0 else None


def decode_jpeg_adm_batch(
    jpegs: Sequence[bytes], resolution: int, num_threads: int = 0,
) -> Tuple[np.ndarray, List[bool]]:
    """Threaded batch decode. Returns (N, R, R, 3) uint8 and a per-image ok
    list (failed slots are zeroed). num_threads<=0 = one per CPU."""
    lib = load()
    if lib is None:
        raise RuntimeError("native data-plane not built "
                           "(run scripts/build_native.sh)")
    n = len(jpegs)
    blob = b"".join(jpegs)
    offsets = (ctypes.c_size_t * n)()
    lens = (ctypes.c_size_t * n)()
    pos = 0
    for i, b in enumerate(jpegs):
        offsets[i] = pos
        lens[i] = len(b)
        pos += len(b)
    out = np.empty((n, resolution, resolution, 3), np.uint8)
    status = (ctypes.c_int * n)()
    if num_threads <= 0:
        num_threads = os.cpu_count() or 1
    lib.dp_decode_jpeg_adm_batch(
        blob, offsets, lens, n, resolution,
        out.ctypes.data_as(ctypes.c_void_p), status, num_threads)
    return out, [status[i] == 0 for i in range(n)]


def resize(img: np.ndarray, out_w: int, out_h: int,
           filter: str = "bicubic") -> np.ndarray:
    """PIL-compatible BOX/BICUBIC resize of an (H, W, 3) uint8 image."""
    lib = load()
    if lib is None:
        raise RuntimeError("native data-plane not built")
    img = np.ascontiguousarray(img, np.uint8)
    h, w = img.shape[:2]
    out = np.empty((out_h, out_w, 3), np.uint8)
    rc = lib.dp_resize(img.ctypes.data_as(ctypes.c_void_p), w, h,
                       out.ctypes.data_as(ctypes.c_void_p), out_w, out_h,
                       0 if filter == "box" else 1)
    if rc != 0:
        raise ValueError("dp_resize failed")
    return out
