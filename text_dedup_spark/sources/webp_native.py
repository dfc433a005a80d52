"""Optional ctypes binding to the system libwebp — reference decoder.

Two roles, both environment-gated (``available()`` is False when no
libwebp.so is present, and every caller degrades to the established
flag-skip policy):

1. **Lossy VP8 decode.** The pure-Python side (sources/vp8l.py) decodes
   WebP-lossless for real; lossy VP8 needs a bool-coder/DCT codec whose
   large constant tables make a from-scratch port impractical to verify
   here. When the system ships libwebp, `decode_webp_native` decodes
   lossy (and any other) WebP rows, so `fmt='webp'` stops flag-skipping
   them; without it they remain flagged, never task failures.

2. **Reference-decoder oracle.** libwebp is the conformance decoder for
   the VP8L bitstream, which makes it the strongest possible oracle for
   this repo's pure-Python codec: tests assert that streams produced by
   ``encode_vp8l`` decode BIT-EXACTLY the same through libwebp and
   through ``decode_webp`` (encoder conformance + decoder agreement),
   and that the pure-Python ALPH alpha decode matches libwebp's alpha
   channel on a real lossy file.

No pip package is involved — plain ctypes over the platform library,
same gating style as the soundfile/av seams in functions/media_udf.py.
"""

from __future__ import annotations

import ctypes
import ctypes.util

import numpy as np

_lib = None
_checked = False


def _load():
    global _lib, _checked
    if _checked:
        return _lib
    _checked = True
    for name in ("libwebp.so.7", "libwebp.so", ctypes.util.find_library("webp")):
        if not name:
            continue
        try:
            lib = ctypes.CDLL(name)
            lib.WebPDecodeRGBA.restype = ctypes.POINTER(ctypes.c_uint8)
            lib.WebPDecodeRGBA.argtypes = [
                ctypes.c_char_p,
                ctypes.c_size_t,
                ctypes.POINTER(ctypes.c_int),
                ctypes.POINTER(ctypes.c_int),
            ]
            lib.WebPFree.argtypes = [ctypes.c_void_p]
            _lib = lib
            return _lib
        except OSError:
            continue
    return None


def available() -> bool:
    return _load() is not None


def decode_webp_native(data: bytes) -> np.ndarray:
    """WebP bytes -> (h, w, 4) uint8 RGBA via the system libwebp.

    Raises NotImplementedError when the library is absent (the flag
    policy treats that exactly like an unsupported codec feature) and
    ValueError for bytes libwebp rejects."""
    lib = _load()
    if lib is None:
        raise NotImplementedError("system libwebp not available")
    w = ctypes.c_int()
    h = ctypes.c_int()
    buf = lib.WebPDecodeRGBA(data, len(data), ctypes.byref(w), ctypes.byref(h))
    if not buf:
        raise ValueError("libwebp rejected the stream")
    try:
        n = w.value * h.value * 4
        out = np.ctypeslib.as_array(buf, shape=(n,)).reshape(h.value, w.value, 4)
        return out.copy()
    finally:
        lib.WebPFree(buf)
