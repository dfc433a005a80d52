"""Minimal pure-Python PNG codec (zlib + the public PNG spec, RFC 2083).

The container has no image libraries (no PIL), so the fidelity path
(BASELINE.json: "decoded-pixel allclose / PSNR>=40dB") uses this codec:
8-bit RGB, filter type 0, one IDAT chunk — enough to round-trip the
synthetic corpus bit-exactly. Real baseline JPEG decodes via the sibling
pure-numpy codec (sources/jpeg.py, round 2); 'jpeg_sim' keeps the legacy
synthetic-lossy PNG container for fixture compatibility.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_SIG = b"\x89PNG\r\n\x1a\n"


def _chunk(tag: bytes, payload: bytes) -> bytes:
    return (
        struct.pack(">I", len(payload))
        + tag
        + payload
        + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF)
    )


def encode_png(arr: np.ndarray) -> bytes:
    """HxWx3 uint8 -> PNG bytes (color type 2, bit depth 8, filter 0)."""
    if arr.ndim != 3 or arr.shape[2] != 3 or arr.dtype != np.uint8:
        raise ValueError("expected HxWx3 uint8 array")
    h, w, _ = arr.shape
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    raw = b"".join(b"\x00" + arr[y].tobytes() for y in range(h))
    idat = zlib.compress(raw, 1)  # level 1: synthetic fixtures favor
    # generation speed; decode is level-agnostic
    return _SIG + _chunk(b"IHDR", ihdr) + _chunk(b"IDAT", idat) + _chunk(b"IEND", b"")


def decode_png(data: bytes) -> np.ndarray:
    """PNG bytes -> HxWx3 uint8. Supports what encode_png emits plus
    multi-IDAT streams; filters 0 (None), 1 (Sub) and 2 (Up) for safety."""
    if data[:8] != _SIG:
        raise ValueError("not a PNG")
    pos = 8
    w = h = None
    idat = b""
    while pos < len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        tag = data[pos + 4 : pos + 8]
        payload = data[pos + 8 : pos + 8 + length]
        pos += 12 + length
        if tag == b"IHDR":
            w, h, depth, color, _, _, interlace = struct.unpack(">IIBBBBB", payload)
            if depth != 8 or color != 2 or interlace != 0:
                raise NotImplementedError("only 8-bit RGB non-interlaced supported")
        elif tag == b"IDAT":
            idat += payload
        elif tag == b"IEND":
            break
    if w is None:
        raise ValueError("missing IHDR")
    raw = zlib.decompress(idat)
    stride = w * 3
    out = np.empty((h, w, 3), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    for y in range(h):
        f = raw[y * (stride + 1)]
        row = np.frombuffer(
            raw[y * (stride + 1) + 1 : (y + 1) * (stride + 1)], dtype=np.uint8
        ).copy()
        if f == 0:
            pass
        elif f == 2:  # Up
            row = (row.astype(np.int16) + prev).astype(np.uint8)
        elif f == 1:  # Sub
            row = row.astype(np.int16)
            for x in range(3, stride):
                row[x] = (row[x] + row[x - 3]) & 0xFF
            row = row.astype(np.uint8)
        else:
            raise NotImplementedError(f"PNG filter {f} not supported")
        out[y] = row.reshape(w, 3)
        prev = row
    return out


def decode_image(data: bytes, fmt: str) -> np.ndarray:
    """Typed decode entry point for the multimodal column.

    PNG, JPEG (baseline sequential AND progressive SOF2), GIF (87a/89a
    incl. animation — first composited frame here; the video path gets
    every frame) and BMP are real pure-Python codecs ('jpeg_sim' is the
    legacy synthetic-lossy PNG container, kept for fixture compat).

    Error contract: ValueError for any corrupt/truncated stream,
    NotImplementedError for valid-but-unsupported codec features
    (arithmetic-coded / lossless / hierarchical JPEG). Low-level parse
    crashes (IndexError /
    struct.error / zlib.error from decoders walking truncated buffers) are
    normalized to ValueError here so the operator-level flag policy
    (try_decode_image -> decode_ok=false) can rely on a closed exception
    set — a corrupt row must never become a task-killing stray exception
    on a 100-TB job."""
    try:
        if fmt in ("png", "jpeg_sim"):
            return decode_png(data)
        if fmt == "jpeg":
            from .jpeg import decode_jpeg_baseline

            return decode_jpeg_baseline(data)
        if fmt == "gif":
            from .gif import decode_gif

            return decode_gif(data)[0]
        if fmt == "bmp":
            from .bmp import decode_bmp

            return decode_bmp(data)
    except (ValueError, NotImplementedError):
        raise
    except (IndexError, KeyError, struct.error, zlib.error) as e:
        raise ValueError(f"corrupt {fmt} stream: {type(e).__name__}: {e}") from e
    raise ValueError(f"unknown image format {fmt!r}")


def try_decode_image(data: bytes, fmt: str):
    """``decode_image`` that returns None instead of raising for payloads
    this container cannot decode — arithmetic-coded/lossless JPEG
    (NotImplementedError) and corrupt streams (ValueError). The
    operator-level skip+flag policy: a bad row becomes ``decode_ok=false``,
    never a task failure that kills a 100-TB job."""
    try:
        return decode_image(data, fmt)
    except (NotImplementedError, ValueError):
        return None


def psnr(a: np.ndarray, b: np.ndarray) -> float:
    """Peak signal-to-noise ratio in dB; inf for identical images."""
    diff = a.astype(np.float64) - b.astype(np.float64)
    mse = float(np.mean(diff * diff))
    if mse == 0.0:
        return float("inf")
    return 20.0 * np.log10(255.0) - 10.0 * np.log10(mse)


def phash64(arr: np.ndarray) -> int:
    """Deterministic 64-bit perceptual fingerprint: 8x8 block-mean
    average-hash over the grayscale image. MSB-first bit order (block (0,0)
    = bit 63) so it plugs straight into the SimHash Hamming machinery."""
    gray = arr.astype(np.float64).mean(axis=2)
    h, w = gray.shape
    bh, bw = h // 8, w // 8
    blocks = gray[: bh * 8, : bw * 8].reshape(8, bh, 8, bw).mean(axis=(1, 3))
    bits = (blocks > blocks.mean()).flatten()
    out = 0
    for i, bit in enumerate(bits):
        if bit:
            out |= 1 << (63 - i)
    return out
