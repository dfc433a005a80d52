"""Optional ctypes binding to the system libwebp — reference decoder.

Two roles, both environment-gated (``available()`` is False when no
libwebp.so is present, and every caller degrades to the established
flag-skip policy):

1. **Cross-check decode.** The pure-Python side decodes WebP-lossless
   (sources/vp8l.py) AND lossy VP8 (sources/vp8.py) for real; when the
   system ships libwebp, `decode_webp_native` offers an independent
   native decode of any WebP row for auditing.

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


def decode_webp_yuv_native(data: bytes):
    """WebP bytes -> (y, u, v) uint8 planes via the system libwebp.

    YUV-plane output bypasses libwebp's fancy upsampler, making it the
    exact oracle for the pure-Python VP8 reconstruction (sources/vp8.py):
    two conforming decoders must agree bit-for-bit at this level."""
    lib = _load()
    if lib is None:
        raise NotImplementedError("system libwebp not available")
    lib.WebPDecodeYUV.restype = ctypes.POINTER(ctypes.c_uint8)
    lib.WebPDecodeYUV.argtypes = [
        ctypes.c_char_p, ctypes.c_size_t,
        ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
        ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8)),
        ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8)),
        ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
    ]
    w = ctypes.c_int(); h = ctypes.c_int()
    up = ctypes.POINTER(ctypes.c_uint8)(); vp = ctypes.POINTER(ctypes.c_uint8)()
    stride = ctypes.c_int(); uv_stride = ctypes.c_int()
    buf = lib.WebPDecodeYUV(
        data, len(data), ctypes.byref(w), ctypes.byref(h),
        ctypes.byref(up), ctypes.byref(vp),
        ctypes.byref(stride), ctypes.byref(uv_stride),
    )
    if not buf:
        raise ValueError("libwebp rejected the stream")
    try:
        W, H, S, US = w.value, h.value, stride.value, uv_stride.value
        cw, ch = (W + 1) // 2, (H + 1) // 2
        y = np.ctypeslib.as_array(buf, shape=(H * S,)).reshape(H, S)[:, :W].copy()
        u = np.ctypeslib.as_array(up, shape=(ch * US,)).reshape(ch, US)[:, :cw].copy()
        v = np.ctypeslib.as_array(vp, shape=(ch * US,)).reshape(ch, US)[:, :cw].copy()
        return y, u, v
    finally:
        lib.WebPFree(buf)


def encode_webp_lossy_native(rgb: np.ndarray, quality: float = 75.0) -> bytes:
    """RGB (h, w, 3) uint8 -> lossy WebP bytes via the system libwebp's
    simple encode API.  Test-fixture generator for the VP8 decoder."""
    lib = _load()
    if lib is None:
        raise NotImplementedError("system libwebp not available")
    lib.WebPEncodeRGB.restype = ctypes.c_size_t
    lib.WebPEncodeRGB.argtypes = [
        ctypes.c_char_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_float, ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8)),
    ]
    h, w, _ = rgb.shape
    out = ctypes.POINTER(ctypes.c_uint8)()
    n = lib.WebPEncodeRGB(
        np.ascontiguousarray(rgb).tobytes(), w, h, w * 3,
        ctypes.c_float(quality), ctypes.byref(out),
    )
    if n == 0:
        raise ValueError("libwebp encode failed")
    try:
        return bytes(np.ctypeslib.as_array(out, shape=(n,)))
    finally:
        lib.WebPFree(out)


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
