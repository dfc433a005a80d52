"""Pure-Python BMP (Windows DIB) codec.

BMP shares its pixel layout with the AVI '00db' frames already decoded
by sources/avi.py (BITMAPINFOHEADER + bottom-up 4-byte-aligned BGR
rows); this module is the still-image entry point for that layout so the
`fmt='bmp'` rows of an image+caption table decode through the same
typed seam as PNG/JPEG/GIF. Scope: BI_RGB at 24/32 bpp, 8 bpp with a
BGRX palette, bottom-up and top-down (negative height) row order, and
any BITMAPINFOHEADER-compatible header size (40/52/56/108/124 — V2-V5
headers begin with the same fixed fields). BI_BITFIELDS and RLE are
rejected as corrupt-for-this-pipeline (ValueError) rather than
NotImplementedError: the operator-level flag policy treats both the same
and no lossless fidelity contract can hold for RLE-recompressed fixtures.

No reference analog — the reference engine (weiyx16/text-dedup) is
text-only; image formats extend the dedup surface per BASELINE.json.
"""

from __future__ import annotations

import struct

import numpy as np


def is_bmp(data: bytes) -> bool:
    return len(data) >= 2 and data[:2] == b"BM"


def encode_bmp(arr: np.ndarray) -> bytes:
    """HxWx3 uint8 RGB -> 24bpp BI_RGB bottom-up BMP bytes (lossless)."""
    if arr.ndim != 3 or arr.shape[2] != 3 or arr.dtype != np.uint8:
        raise ValueError("expected HxWx3 uint8 array")
    h, w, _ = arr.shape
    stride = (w * 3 + 3) // 4 * 4
    rows = np.zeros((h, stride), dtype=np.uint8)
    rows[:, : w * 3] = arr[::-1, :, ::-1].reshape(h, w * 3)  # bottom-up BGR
    pixel_data = rows.tobytes()
    offset = 14 + 40
    header = b"BM" + struct.pack(
        "<IHHI", offset + len(pixel_data), 0, 0, offset
    )
    info = struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(pixel_data), 2835, 2835, 0, 0
    )
    return header + info + pixel_data


def decode_bmp(data: bytes) -> np.ndarray:
    """BMP bytes -> HxWx3 uint8 RGB."""
    if not is_bmp(data):
        raise ValueError("not a BMP stream")
    if len(data) < 14 + 40:
        raise ValueError("BMP header truncated")
    (offset,) = struct.unpack("<I", data[10:14])
    info_size, w, h_signed, _planes, bpp, compression = struct.unpack(
        "<IiiHHI", data[14:34]
    )
    if info_size < 40:
        raise ValueError(f"BMP core/OS2 header (size {info_size}) not supported")
    top_down = h_signed < 0
    h = abs(h_signed)
    if w <= 0 or h == 0:
        raise ValueError("BMP has non-positive dimensions")
    if compression != 0:
        raise ValueError(f"BMP compression {compression} not supported (BI_RGB only)")
    if bpp not in (8, 24, 32):
        raise ValueError(f"BMP bit depth {bpp} not supported")
    palette = None
    if bpp == 8:
        (n_colors,) = struct.unpack("<I", data[46:50])
        n_colors = n_colors or 256
        pal_at = 14 + info_size
        if pal_at + 4 * n_colors > len(data):
            raise ValueError("BMP palette truncated")
        palette = (
            np.frombuffer(data[pal_at : pal_at + 4 * n_colors], dtype=np.uint8)
            .reshape(n_colors, 4)[:, 2::-1]  # BGRX -> RGB
            .copy()
        )
    stride = (w * (bpp // 8) + 3) // 4 * 4
    if offset + stride * h > len(data):
        raise ValueError("BMP pixel data shorter than geometry requires")
    rows = np.frombuffer(
        data[offset : offset + stride * h], dtype=np.uint8
    ).reshape(h, stride)
    if not top_down:
        rows = rows[::-1]
    if bpp == 8:
        idx = rows[:, :w]
        if int(idx.max()) >= len(palette):
            raise ValueError("BMP pixel index outside palette")
        return palette[idx]
    px = rows[:, : w * (bpp // 8)].reshape(h, w, bpp // 8)
    return px[:, :, 2::-1].copy()  # BGR(A) -> RGB, alpha dropped
