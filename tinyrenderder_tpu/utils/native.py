"""ctypes bindings to the native C++ runtime helpers (native/*.cpp).

The reference's host runtime is entirely C++ (codec, loader); the
TPU-native framework keeps the compute path in XLA/Pallas and implements
the host-side hot loops (TGA RLE codec, OBJ tokenizer) in C++ too, built
as ``native/libtinyrenderder_native.so`` via ``make -C native``.

Everything degrades gracefully to the pure-Python implementations when the
shared library hasn't been built.
"""

from __future__ import annotations

import ctypes
import os

import numpy as np

_LIB_NAME = "libtinyrenderder_native.so"
_lib: ctypes.CDLL | None = None
_checked = False


def _load() -> ctypes.CDLL | None:
    global _lib, _checked
    if _checked:
        return _lib
    _checked = True
    here = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    for cand in (os.path.join(here, "native", _LIB_NAME),
                 os.path.join(here, _LIB_NAME)):
        if os.path.exists(cand):
            try:
                lib = ctypes.CDLL(cand)
            except OSError:
                continue
            lib.trd_rle_decode.restype = ctypes.c_longlong
            lib.trd_rle_decode.argtypes = [
                ctypes.c_char_p, ctypes.c_longlong,
                ctypes.POINTER(ctypes.c_uint8),
                ctypes.c_longlong, ctypes.c_int]
            lib.trd_rle_encode.restype = ctypes.c_longlong
            lib.trd_rle_encode.argtypes = [
                ctypes.POINTER(ctypes.c_uint8), ctypes.c_longlong, ctypes.c_int,
                ctypes.POINTER(ctypes.c_uint8), ctypes.c_longlong]
            _lib = lib
            break
    return _lib


def available() -> bool:
    return _load() is not None


def rle_decode(raw: bytes, w: int, h: int, bpp: int) -> np.ndarray:
    lib = _load()
    out = np.empty((h * w, bpp), dtype=np.uint8)
    n = lib.trd_rle_decode(
        raw, len(raw),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        h * w, bpp)
    if n != h * w:
        raise ValueError(f"RLE decode produced {n} of {h * w} pixels")
    return out


def rle_encode(flat: np.ndarray, bpp: int) -> bytes:
    lib = _load()
    flat = np.ascontiguousarray(flat, dtype=np.uint8)
    npix = flat.shape[0]
    # worst case: every pixel is its own raw chunk (1 header + bpp bytes)
    cap = npix * (bpp + 1) + 64
    out = np.empty(cap, dtype=np.uint8)
    n = lib.trd_rle_encode(
        flat.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), npix, bpp,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), cap)
    if n < 0:
        raise ValueError("RLE encode overflow")
    return out[:n].tobytes()
