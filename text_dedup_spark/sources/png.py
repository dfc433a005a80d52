"""Pure-Python PNG codec (zlib + the public PNG spec, RFC 2083).

The container has no image libraries (no PIL), so the fidelity path
(BASELINE.json: "decoded-pixel allclose / PSNR>=40dB") uses this codec.
Decode covers the full still-image spec surface a web corpus hits:

- all five scanline filters (None/Sub/Up/Average/Paeth — real encoders
  pick per-row adaptively, so Paeth support is what makes wild PNGs work);
- color types 0 (gray), 2 (RGB), 3 (palette), 4 (gray+alpha), 6 (RGBA);
- bit depths 1/2/4/8/16 in the spec-legal combinations;
- Adam7 interlace.

Output is normalized to the pipeline's HxWx3 uint8 contract: gray is
replicated across channels, palette indices resolve through PLTE, alpha is
dropped (the fidelity invariant is on RGB pixels), and 16-bit samples take
the high byte. ``encode_png`` keeps its original 8-bit-RGB/filter-0 fast
path (the synthetic corpus round-trips bit-exactly through it);
``encode_png_ext`` writes every decode-supported variant for fixtures and
for grayscale/palette/alpha output tables. Real baseline+progressive JPEG
decodes via the sibling pure-numpy codec (sources/jpeg.py); 'jpeg_sim'
keeps the legacy synthetic-lossy PNG container for fixture compatibility.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_SIG = b"\x89PNG\r\n\x1a\n"

#: samples per pixel for each PNG color type
_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}
#: spec-legal bit depths per color type (RFC 2083 §4.1.1)
_LEGAL_DEPTHS = {
    0: (1, 2, 4, 8, 16),
    2: (8, 16),
    3: (1, 2, 4, 8),
    4: (8, 16),
    6: (8, 16),
}
#: Adam7 pass offsets/steps: (x0, y0, dx, dy)
_ADAM7 = (
    (0, 0, 8, 8),
    (4, 0, 8, 8),
    (0, 4, 4, 8),
    (2, 0, 4, 4),
    (0, 2, 2, 4),
    (1, 0, 2, 2),
    (0, 1, 1, 2),
)


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


def _filter_row(f: int, cur: np.ndarray, prev: np.ndarray, bpp: int) -> np.ndarray:
    """Forward scanline filter (all predictors see reconstructed bytes, so
    this is fully vectorizable — only decode has the sequential recurrence)."""
    if f == 0:
        return cur
    c = cur.astype(np.int32)
    p = prev.astype(np.int32)
    left = np.concatenate([np.zeros(bpp, np.int32), c[:-bpp]])
    if f == 1:
        return ((c - left) & 0xFF).astype(np.uint8)
    if f == 2:
        return ((c - p) & 0xFF).astype(np.uint8)
    if f == 3:
        return ((c - ((left + p) >> 1)) & 0xFF).astype(np.uint8)
    upleft = np.concatenate([np.zeros(bpp, np.int32), p[:-bpp]])
    est = left + p - upleft
    pa, pb, pc = np.abs(est - left), np.abs(est - p), np.abs(est - upleft)
    pred = np.where((pa <= pb) & (pa <= pc), left, np.where(pb <= pc, p, upleft))
    return ((c - pred) & 0xFF).astype(np.uint8)


def _pack_rows(samples: np.ndarray, depth: int) -> np.ndarray:
    """(h, w, channels) uint8 sample codes -> (h, stride) scanline bytes."""
    h, w, channels = samples.shape
    if depth == 8:
        return samples.reshape(h, w * channels)
    if depth == 16:
        # widen v -> v*257 so decode's high-byte reduction returns v exactly
        wide = samples.astype(np.uint16) * 257
        return (
            wide.reshape(h, w * channels)
            .astype(">u2")
            .view(np.uint8)
            .reshape(h, w * channels * 2)
        )
    bits = (
        (samples.reshape(h, w)[:, :, None] >> np.arange(depth - 1, -1, -1)) & 1
    ).astype(np.uint8)
    flat = bits.reshape(h, w * depth)
    pad = (-flat.shape[1]) % 8
    if pad:
        flat = np.pad(flat, ((0, 0), (0, pad)))
    return np.packbits(flat, axis=1)


def encode_png_ext(
    arr: np.ndarray,
    *,
    color_type: int = 2,
    depth: int = 8,
    filters: int | list[int] = 0,
    interlace: int = 0,
    palette: np.ndarray | None = None,
) -> bytes:
    """Write any decode-supported PNG variant.

    ``arr`` by color type: 0 -> (H,W) gray codes (< 2**depth), 2 -> (H,W,3),
    3 -> (H,W) palette indices with ``palette`` (N,3) uint8, 4 -> (H,W,2)
    gray+alpha, 6 -> (H,W,4) RGBA — all uint8 sample codes (16-bit depth
    widens v to v*257 so decode round-trips exactly). ``filters`` is one
    filter type for every scanline or a per-row list cycled within each
    Adam7 pass. Used for fixture generation and for writing grayscale /
    palette / alpha output tables; the plain ``encode_png`` fast path is
    unchanged."""
    if color_type not in _CHANNELS or depth not in _LEGAL_DEPTHS[color_type]:
        raise ValueError(f"illegal PNG depth/color combo {depth}/{color_type}")
    channels = _CHANNELS[color_type]
    if channels == 1:
        if arr.ndim == 2:
            arr = arr[..., None]
    elif arr.ndim != 3 or arr.shape[2] != channels:
        raise ValueError(f"color type {color_type} wants HxWx{channels}")
    if arr.dtype != np.uint8:
        raise ValueError("expected uint8 sample codes")
    h, w, _ = arr.shape
    if depth < 8 and int(arr.max(initial=0)) >= (1 << depth):
        raise ValueError(f"sample code out of range for depth {depth}")
    flist = [filters] if isinstance(filters, int) else list(filters)
    bpp = max(1, channels * depth // 8)

    def _sub_image(sub: np.ndarray) -> bytes:
        rows = _pack_rows(sub, depth)
        prev = np.zeros(rows.shape[1], dtype=np.uint8)
        out = []
        for y in range(rows.shape[0]):
            f = flist[y % len(flist)]
            out.append(bytes([f]) + _filter_row(f, rows[y], prev, bpp).tobytes())
            prev = rows[y]
        return b"".join(out)

    if interlace == 0:
        raw = _sub_image(arr)
    else:
        raw = b"".join(
            _sub_image(arr[y0::dy, x0::dx])
            for x0, y0, dx, dy in _ADAM7
            if arr[y0::dy, x0::dx].size
        )
    ihdr = struct.pack(">IIBBBBB", w, h, depth, color_type, 0, 0, interlace)
    chunks = _SIG + _chunk(b"IHDR", ihdr)
    if color_type == 3:
        if palette is None:
            raise ValueError("palette color type needs a palette")
        chunks += _chunk(b"PLTE", np.asarray(palette, dtype=np.uint8).tobytes())
    return chunks + _chunk(b"IDAT", zlib.compress(raw, 6)) + _chunk(b"IEND", b"")


def _stride(w: int, channels: int, depth: int) -> int:
    """Bytes per scanline (excluding the leading filter byte)."""
    return (w * channels * depth + 7) // 8


def _unfilter(raw: bytes, off: int, h: int, stride: int, bpp: int) -> np.ndarray:
    """Undo per-scanline filtering for one (sub-)image starting at ``off``
    in the decompressed stream; returns the (h, stride) reconstructed bytes.

    None/Up are pure numpy; Sub is a lane-wise cumulative sum mod 256
    (stride is always a multiple of bpp, or bpp == 1 at sub-byte depths).
    Average/Paeth carry a left-neighbor recurrence, so those rows take a
    scalar loop — real encoders emit them, our encoders only on request,
    and decode happens executor-side where per-row cost is bounded by
    the row length, not the corpus."""
    need = h * (stride + 1)
    if len(raw) - off < need:
        raise ValueError("PNG stream truncated")
    block = np.frombuffer(raw, dtype=np.uint8, count=need, offset=off).reshape(
        h, stride + 1
    )
    fvec = block[:, 0]
    filt = block[:, 1:]
    out = np.zeros((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    for y in range(h):
        f = int(fvec[y])
        row = filt[y]
        if f == 0:
            rec = row.copy()
        elif f == 1:  # Sub: prefix sum within each bpp lane
            lanes = row.reshape(-1, bpp).astype(np.int64)
            rec = (np.cumsum(lanes, axis=0) & 0xFF).astype(np.uint8).reshape(stride)
        elif f == 2:  # Up: uint8 addition wraps mod 256 by itself
            rec = row + prev
        elif f == 3:  # Average
            rec = np.empty(stride, dtype=np.uint8)
            rowi = row.astype(np.int32)
            previ = prev.astype(np.int32)
            for x in range(stride):
                left = int(rec[x - bpp]) if x >= bpp else 0
                rec[x] = (rowi[x] + ((left + previ[x]) >> 1)) & 0xFF
        elif f == 4:  # Paeth
            rec = np.empty(stride, dtype=np.uint8)
            rowi = row.astype(np.int32)
            previ = prev.astype(np.int32)
            for x in range(stride):
                a = int(rec[x - bpp]) if x >= bpp else 0
                b = int(previ[x])
                c = int(previ[x - bpp]) if x >= bpp else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                rec[x] = (rowi[x] + pred) & 0xFF
        else:
            raise ValueError(f"bad PNG filter type {f}")
        out[y] = rec
        prev = rec
    return out


def _samples(rec: np.ndarray, w: int, channels: int, depth: int) -> np.ndarray:
    """(h, stride) reconstructed bytes -> (h, w, channels) uint8 samples.

    16-bit samples take the high byte (the spec's own 16->8 reduction);
    sub-byte depths unpack MSB-first and stay as raw code values (the
    caller scales gray codes / resolves palette indices)."""
    h = rec.shape[0]
    if depth == 8:
        return rec[:, : w * channels].reshape(h, w, channels)
    if depth == 16:
        return np.ascontiguousarray(
            rec[:, : w * channels * 2].reshape(h, w, channels, 2)[..., 0]
        )
    bits = np.unpackbits(rec, axis=1)
    groups = bits[:, : (rec.shape[1] * 8 // depth) * depth].reshape(h, -1, depth)
    weights = (1 << np.arange(depth - 1, -1, -1)).astype(np.uint8)
    vals = (groups * weights).sum(axis=2).astype(np.uint8)[:, :w]
    return vals.reshape(h, w, 1)


def _to_rgb(samples: np.ndarray, color: int, depth: int, plte: bytes | None):
    """Normalize decoded samples to the HxWx3 uint8 pipeline contract."""
    if color == 2:
        return np.ascontiguousarray(samples)
    if color == 6:
        return np.ascontiguousarray(samples[..., :3])
    if color == 3:
        if plte is None:
            raise ValueError("palette PNG missing PLTE chunk")
        pal = np.frombuffer(plte, dtype=np.uint8)
        if len(pal) % 3 or len(pal) == 0:
            raise ValueError("bad PLTE length")
        pal = pal.reshape(-1, 3)
        idx = samples[..., 0]
        if int(idx.max(initial=0)) >= pal.shape[0]:
            raise ValueError("palette index out of range")
        return pal[idx]
    g = samples[..., 0]  # color 0 or 4 (alpha dropped)
    if color == 0 and depth < 8:
        g = g * np.uint8(255 // ((1 << depth) - 1))
    return np.repeat(g[..., None], 3, axis=2)


def decode_png(data: bytes) -> np.ndarray:
    """PNG bytes -> HxWx3 uint8 (full spec surface — see module docstring)."""
    if data[:8] != _SIG:
        raise ValueError("not a PNG")
    pos = 8
    w = h = depth = color = interlace = None
    plte = None
    idat = b""
    while pos + 8 <= len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        tag = data[pos + 4 : pos + 8]
        payload = data[pos + 8 : pos + 8 + length]
        pos += 12 + length
        if tag == b"IHDR":
            w, h, depth, color, comp, fmethod, interlace = struct.unpack(
                ">IIBBBBB", payload
            )
            if color not in _CHANNELS or depth not in _LEGAL_DEPTHS[color]:
                raise ValueError(f"illegal PNG depth/color combo {depth}/{color}")
            if comp != 0 or fmethod != 0 or interlace not in (0, 1):
                raise ValueError("bad IHDR compression/filter/interlace method")
            if w == 0 or h == 0:
                raise ValueError("zero-dimension PNG")
        elif tag == b"PLTE":
            plte = payload
        elif tag == b"IDAT":
            idat += payload
        elif tag == b"IEND":
            break
    if w is None:
        raise ValueError("missing IHDR")
    raw = zlib.decompress(idat)
    channels = _CHANNELS[color]
    bpp = max(1, channels * depth // 8)
    if interlace == 0:
        rec = _unfilter(raw, 0, h, _stride(w, channels, depth), bpp)
        return _to_rgb(_samples(rec, w, channels, depth), color, depth, plte)
    out = np.zeros((h, w, 3), dtype=np.uint8)
    off = 0
    for x0, y0, dx, dy in _ADAM7:
        pw = (w - x0 + dx - 1) // dx
        ph = (h - y0 + dy - 1) // dy
        if pw == 0 or ph == 0:
            continue
        stride = _stride(pw, channels, depth)
        rec = _unfilter(raw, off, ph, stride, bpp)
        off += ph * (stride + 1)
        out[y0::dy, x0::dx] = _to_rgb(
            _samples(rec, pw, channels, depth), color, depth, plte
        )
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
        if fmt == "tiff":
            from .tiff import decode_tiff

            return decode_tiff(data)
        if fmt == "webp":
            # both halves pure-Python: lossless via the VP8L codec,
            # lossy via the RFC 6386 VP8 keyframe decoder (vp8.py)
            from .vp8l import decode_webp

            return decode_webp(data)
    except (ValueError, NotImplementedError):
        raise
    except (IndexError, KeyError, struct.error, zlib.error) as e:
        raise ValueError(f"corrupt {fmt} stream: {type(e).__name__}: {e}") from e
    raise ValueError(f"unknown image format {fmt!r}")


def sniff_format(data: bytes) -> str | None:
    """Magic-byte format detection for the multimodal binary column.

    Web corpora routinely mislabel payloads (a .png URL serving JPEG bytes,
    content-type lies); operators can sniff instead of trusting the fmt
    column. Returns the canonical fmt string ``decode_image`` routes on
    ('png', 'jpeg', 'gif', 'bmp', 'tiff', 'webp') or the media containers
    ('wav', 'avi', 'flac'), else None for unrecognized bytes."""
    if len(data) < 12:
        return None
    if data[:8] == _SIG:
        return "png"
    if data[:3] == b"\xff\xd8\xff":
        return "jpeg"
    if data[:6] in (b"GIF87a", b"GIF89a"):
        return "gif"
    if data[:2] == b"BM":
        return "bmp"
    if data[:4] in (b"II*\x00", b"MM\x00*"):
        return "tiff"
    if data[:4] == b"fLaC":
        return "flac"
    if data[:4] == b"RIFF":
        kind = data[8:12]
        if kind == b"WEBP":
            return "webp"
        if kind == b"WAVE":
            return "wav"
        if kind == b"AVI ":
            return "avi"
    return None


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
