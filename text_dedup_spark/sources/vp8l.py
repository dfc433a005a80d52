"""Pure-Python WebP-lossless (VP8L) codec — the public WebP lossless
bitstream specification (RFC 9649).

WebP is the second-most-common still format on the modern web; this
implements the LOSSLESS half for real:

decode — the full VP8L surface:
- canonical prefix codes: both the "simple" (1-2 symbol) and the
  code-length-coded normal form (repeat ops 16/17/18, max_symbol
  early-stop), DEFLATE-style canonical assignment, LSB-first bit reader;
- all four transforms, parsed in stream order and inverted in reverse:
  PREDICTOR (14 modes, tiled), COLOR (per-tile signed 3.5 fixed-point
  cross-channel deltas), SUBTRACT_GREEN, COLOR_INDEXING (delta-coded
  palette, sub-byte pixel bundling at palette sizes <= 16);
- meta prefix images (per-tile entropy-code groups), color cache
  (0x1e35a7bd multiplicative hash), LZ77 backward references with the
  120-entry 2D distance map;
- the headerless "alpha" variant (an ALPH chunk with compression
  method 1 carries a VP8L-coded image) — decoded with the same engine.

encode — a real encoder for fixtures and as an output path: per-channel
histogram Huffman codes (simple codes for <=2 symbols; length-limited
fallback), optional subtract-green / fixed-mode predictor / delta-coded
palette (with bundling) transforms, optional color cache, optional
dist=1 LZ77 run coding. Round-trips are bit-exact by construction
(lossless), and the decoder is additionally validated against a REAL
libwebp-produced VP8L stream (the alpha plane of CPython's
test python.webp).

Animated WebP (ANIM/ANMF) decodes to composited frames for the video
fingerprint path — VP8L frames and lossy VP8 frames (sources/vp8.py,
the pure-Python RFC 6386 keyframe decoder) both pure-Python, with ALPH
alpha planes (both compression methods, all four alpha filters).  The
env-gated system-libwebp binding in sources/webp_native.py now serves
purely as the reference-decoder oracle for both codecs' tests.
"""

from __future__ import annotations

import struct
import zlib  # noqa: F401  (parity with sibling codecs' error contract)

import numpy as np

# ---------------------------------------------------------------- bit I/O


class _BitReader:
    """LSB-first bit reader (DEFLATE convention, as VP8L specifies)."""

    __slots__ = ("data", "pos", "bit")

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.bit = 0

    def read(self, n: int) -> int:
        v = 0
        for i in range(n):
            if self.pos >= len(self.data):
                raise ValueError("VP8L stream truncated")
            v |= ((self.data[self.pos] >> self.bit) & 1) << i
            self.bit += 1
            if self.bit == 8:
                self.bit = 0
                self.pos += 1
        return v


class _BitWriter:
    __slots__ = ("out", "acc", "nbits")

    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, n: int) -> None:
        self.acc |= (value & ((1 << n) - 1)) << self.nbits
        self.nbits += n
        while self.nbits >= 8:
            self.out.append(self.acc & 0xFF)
            self.acc >>= 8
            self.nbits -= 8

    def bytes(self) -> bytes:
        if self.nbits:
            self.out.append(self.acc & 0xFF)
            self.acc = 0
            self.nbits = 0
        return bytes(self.out)


# ------------------------------------------------------- canonical Huffman

# kCodeLengthCodeOrder — note 16 sits between 5 and 6 (NOT at the end as a
# DEFLATE reflex would have it; the real-stream golden caught exactly this)
_CL_ORDER = (17, 18, 0, 1, 2, 3, 4, 5, 16, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15)


def _canonical_codes(lengths: list[int]) -> dict[int, tuple[int, int]]:
    """symbol -> (code, length), RFC1951 canonical assignment (codes read
    MSB-first from the LSB-first bit stream, as in DEFLATE)."""
    max_len = max(lengths, default=0)
    bl_count = [0] * (max_len + 1)
    for ln in lengths:
        if ln:
            bl_count[ln] += 1
    code = 0
    next_code = [0] * (max_len + 2)
    for ln in range(1, max_len + 1):
        code = (code + bl_count[ln - 1]) << 1
        next_code[ln] = code
    out = {}
    for sym, ln in enumerate(lengths):
        if ln:
            out[sym] = (next_code[ln], ln)
            next_code[ln] += 1
    return out


class _HuffDecoder:
    """Bit-by-bit canonical-prefix decoder; a 0-length code (single-symbol
    table) returns its symbol without consuming bits, per the spec."""

    __slots__ = ("table", "single")

    def __init__(self, lengths: list[int]):
        nz = [(s, l) for s, l in enumerate(lengths) if l]
        if not nz:
            raise ValueError("empty prefix code")
        if len(nz) == 1:
            self.single = nz[0][0]
            self.table = None
            return
        self.single = None
        self.table = {
            (ln, code): sym for sym, (code, ln) in _canonical_codes(lengths).items()
        }
        # completeness check (kraft == 1): an over/under-subscribed code is
        # a corrupt stream, not a decodable one
        if abs(sum(2.0 ** -l for _, l in nz) - 1.0) > 1e-9:
            raise ValueError("incomplete prefix code")

    def read(self, br: _BitReader) -> int:
        if self.single is not None:
            return self.single
        code = 0
        ln = 0
        while True:
            code = (code << 1) | br.read(1)
            ln += 1
            sym = self.table.get((ln, code))
            if sym is not None:
                return sym
            if ln > 15:
                raise ValueError("bad prefix code in VP8L stream")


def _read_prefix_code(br: _BitReader, alphabet_size: int) -> _HuffDecoder:
    if br.read(1):  # simple code
        n_syms = br.read(1) + 1
        first_8bit = br.read(1)
        sym0 = br.read(8 if first_8bit else 1)
        lengths = [0] * alphabet_size
        if sym0 >= alphabet_size:
            raise ValueError("simple-code symbol out of range")
        if n_syms == 2:
            sym1 = br.read(8)
            if sym1 >= alphabet_size:
                raise ValueError("simple-code symbol out of range")
            lengths[sym0] = 1
            lengths[sym1] = 1
        else:
            lengths[sym0] = 1  # single-symbol: decoder consumes 0 bits
        return _HuffDecoder(lengths)
    # normal: code-length-coded lengths
    num_codes = br.read(4) + 4
    cl_lengths = [0] * 19
    for i in range(num_codes):
        cl_lengths[_CL_ORDER[i]] = br.read(3)
    cl = _HuffDecoder(cl_lengths)
    if br.read(1):  # use max_symbol
        length_nbits = 2 + 2 * br.read(3)
        max_symbol = 2 + br.read(length_nbits)
    else:
        max_symbol = alphabet_size
    lengths = [0] * alphabet_size
    prev = 8
    symbol = 0
    while symbol < alphabet_size:
        if max_symbol == 0:
            break
        max_symbol -= 1
        code_len = cl.read(br)
        if code_len < 16:
            lengths[symbol] = code_len
            symbol += 1
            if code_len:
                prev = code_len
        elif code_len == 16:
            rep = 3 + br.read(2)
            for _ in range(rep):
                if symbol < alphabet_size:
                    lengths[symbol] = prev
                    symbol += 1
        elif code_len == 17:
            symbol += 3 + br.read(3)
        else:  # 18
            symbol += 11 + br.read(7)
    return _HuffDecoder(lengths)


# ------------------------------------------------------------ LZ77 pieces


def _lz77_value(br: _BitReader, code: int) -> int:
    """Length/distance prefix coding (code -> value, reading extra bits)."""
    if code < 4:
        return code + 1
    extra = (code - 2) >> 1
    offset = (2 + (code & 1)) << extra
    return offset + br.read(extra) + 1


def _lz77_code(value: int) -> tuple[int, int, int]:
    """value -> (code, extra_bits_value, extra_bits_count) — the exact
    inverse of ``_lz77_value``: with x = value - 1, the code packs x's MSB
    position and its second-most-significant bit; the remaining low bits
    ride as extra bits."""
    if value <= 4:
        return value - 1, 0, 0
    x = value - 1
    msb = x.bit_length() - 1
    b = (x >> (msb - 1)) & 1
    return 2 * msb + b, x - ((2 + b) << (msb - 1)), msb - 1


# libwebp's plane_to_code LUT: index = yoffset * 16 + (8 - xoffset),
# value = 2D distance code; inverted here for decode.
_PLANE_TO_CODE = [
    96, 73, 55, 39, 23, 13, 5, 1, 255, 255, 255, 255, 255, 255, 255, 255,
    101, 78, 58, 42, 26, 16, 8, 2, 0, 3, 9, 17, 27, 43, 59, 79,
    102, 86, 62, 46, 32, 20, 10, 6, 4, 7, 11, 21, 33, 47, 63, 87,
    105, 90, 70, 52, 37, 28, 18, 14, 12, 15, 19, 29, 38, 53, 71, 91,
    110, 99, 82, 66, 48, 35, 30, 24, 22, 25, 31, 36, 49, 67, 83, 100,
    115, 108, 94, 76, 64, 50, 44, 40, 34, 41, 45, 51, 65, 77, 95, 109,
    118, 113, 103, 92, 80, 68, 60, 56, 54, 57, 61, 69, 81, 93, 104, 114,
    119, 116, 111, 106, 97, 88, 84, 74, 72, 75, 85, 89, 98, 107, 112, 117,
]
_CODE_TO_PLANE = {}
for _i, _c in enumerate(_PLANE_TO_CODE):
    if _c != 255:
        _CODE_TO_PLANE[_c] = (_i >> 4, 8 - (_i & 15))  # (yoffset, xoffset)


def _plane_code_to_distance(xsize: int, code: int) -> int:
    if code > 120:
        return code - 120
    yoff, xoff = _CODE_TO_PLANE[code - 1]
    dist = xoff + yoff * xsize
    return dist if dist >= 1 else 1


# --------------------------------------------------------- image decoding


def _cache_index(argb: int, bits: int) -> int:
    return ((0x1E35A7BD * argb) & 0xFFFFFFFF) >> (32 - bits)


def _decode_entropy_image(
    br: _BitReader, w: int, h: int, allow_meta: bool
) -> np.ndarray:
    """One entropy-coded ARGB image (uint32, shape (h, w)) — the shared
    engine for the main image, transform tile images, and palettes."""
    cache_bits = 0
    if br.read(1):
        cache_bits = br.read(4)
        if not 1 <= cache_bits <= 11:
            raise ValueError("bad color-cache size")
    meta = None
    meta_bits = 0
    n_groups = 1
    if allow_meta and br.read(1):
        meta_bits = br.read(3) + 2
        mw = (w + (1 << meta_bits) - 1) >> meta_bits
        mh = (h + (1 << meta_bits) - 1) >> meta_bits
        meta_img = _decode_entropy_image(br, mw, mh, False)
        meta = ((meta_img >> 8) & 0xFFFF).astype(np.int64)  # (red<<8)|green
        n_groups = int(meta.max()) + 1
    cache_size = (1 << cache_bits) if cache_bits else 0
    groups = []
    for _ in range(n_groups):
        g = _read_prefix_code(br, 256 + 24 + cache_size)
        r = _read_prefix_code(br, 256)
        b = _read_prefix_code(br, 256)
        a = _read_prefix_code(br, 256)
        d = _read_prefix_code(br, 40)
        groups.append((g, r, b, a, d))
    cache = [0] * cache_size
    n = w * h
    out = np.zeros(n, dtype=np.uint32)
    pos = 0
    while pos < n:
        if meta is not None:
            y, x = divmod(pos, w)
            gi = int(meta[y >> meta_bits, x >> meta_bits])
            gcode, rcode, bcode, acode, dcode = groups[gi]
        else:
            gcode, rcode, bcode, acode, dcode = groups[0]
        s = gcode.read(br)
        if s < 256:  # literal
            red = rcode.read(br)
            blue = bcode.read(br)
            alpha = acode.read(br)
            px = (alpha << 24) | (red << 16) | (s << 8) | blue
            out[pos] = px
            if cache_size:
                cache[_cache_index(px, cache_bits)] = px
            pos += 1
        elif s < 256 + 24:  # LZ77 backref
            length = _lz77_value(br, s - 256)
            dist_code = _lz77_value(br, dcode.read(br))
            dist = _plane_code_to_distance(w, dist_code)
            if dist > pos or length > n - pos:
                raise ValueError("VP8L backref out of range")
            for _ in range(length):
                px = int(out[pos - dist])
                out[pos] = px
                if cache_size:
                    cache[_cache_index(px, cache_bits)] = px
                pos += 1
        else:  # color-cache hit
            idx = s - 256 - 24
            if idx >= cache_size:
                raise ValueError("cache index out of range")
            out[pos] = cache[idx]
            pos += 1
    return out.reshape(h, w)


# ------------------------------------------------------ inverse transforms


def _avg2(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    return (a.astype(np.int32) + b.astype(np.int32)) >> 1


def _channels(px: int) -> np.ndarray:
    return np.array(
        [(px >> 24) & 0xFF, (px >> 16) & 0xFF, (px >> 8) & 0xFF, px & 0xFF],
        dtype=np.int32,
    )


def _pack(ch: np.ndarray) -> int:
    c = np.clip(ch, 0, 255).astype(np.uint32)
    return int((c[0] << 24) | (c[1] << 16) | (c[2] << 8) | c[3])


def _predict(mode: int, left: int, top: int, top_left: int, top_right: int) -> int:
    if mode == 0:
        return 0xFF000000
    if mode == 1:
        return left
    if mode == 2:
        return top
    if mode == 3:
        return top_right
    if mode == 4:
        return top_left
    L, T, TL, TR = (
        _channels(left),
        _channels(top),
        _channels(top_left),
        _channels(top_right),
    )
    if mode == 5:
        return _pack(_avg2(_avg2(L, TR), T))
    if mode == 6:
        return _pack(_avg2(L, TL))
    if mode == 7:
        return _pack(_avg2(L, T))
    if mode == 8:
        return _pack(_avg2(TL, T))
    if mode == 9:
        return _pack(_avg2(T, TR))
    if mode == 10:
        return _pack(_avg2(_avg2(L, TL), _avg2(T, TR)))
    if mode == 11:  # Select
        pa_minus_pb = int(np.sum(np.abs(L - TL) - np.abs(T - TL)))
        return top if pa_minus_pb <= 0 else left
    if mode == 12:  # ClampedAddSubtractFull
        return _pack(L + T - TL)
    if mode == 13:  # ClampedAddSubtractHalf
        m = _avg2(L, T)
        d = m - TL
        half = np.where(d >= 0, d // 2, -((-d) // 2))  # C trunc division
        return _pack(m + half)
    raise ValueError(f"bad predictor mode {mode}")


def _inverse_predictor(img: np.ndarray, tiles: np.ndarray, bits: int) -> np.ndarray:
    h, w = img.shape
    modes = ((tiles >> 8) & 0xFF).astype(np.int64)
    out = img.astype(np.uint32).copy()
    for y in range(h):
        for x in range(w):
            if y == 0 and x == 0:
                pred = 0xFF000000
            elif y == 0:
                pred = int(out[0, x - 1])  # mode forced to L on first row
            elif x == 0:
                pred = int(out[y - 1, 0])  # mode forced to T on first column
            else:
                mode = int(modes[y >> bits, x >> bits])
                left = int(out[y, x - 1])
                top = int(out[y - 1, x])
                top_left = int(out[y - 1, x - 1])
                top_right = int(out[y - 1, x + 1]) if x + 1 < w else int(out[y, 0])
                pred = _predict(mode, left, top, top_left, top_right)
            # per-channel add mod 256
            v = int(out[y, x])
            s = (
                ((((v >> 24) & 0xFF) + ((pred >> 24) & 0xFF)) & 0xFF) << 24
                | ((((v >> 16) & 0xFF) + ((pred >> 16) & 0xFF)) & 0xFF) << 16
                | ((((v >> 8) & 0xFF) + ((pred >> 8) & 0xFF)) & 0xFF) << 8
                | (((v & 0xFF) + (pred & 0xFF)) & 0xFF)
            )
            out[y, x] = s
    return out


def _ct_delta(t: int, c: int) -> int:
    """ColorTransformDelta: signed 3.5 fixed-point (int8 args)."""
    ts = t - 256 if t >= 128 else t
    cs = c - 256 if c >= 128 else c
    return (ts * cs) >> 5


def _inverse_color_transform(
    img: np.ndarray, tiles: np.ndarray, bits: int
) -> np.ndarray:
    h, w = img.shape
    out = img.astype(np.uint32).copy()
    g2r = (tiles & 0xFF).astype(np.int64)
    g2b = ((tiles >> 8) & 0xFF).astype(np.int64)
    r2b = ((tiles >> 16) & 0xFF).astype(np.int64)
    for y in range(h):
        ty = y >> bits
        for x in range(w):
            tx = x >> bits
            v = int(out[y, x])
            green = (v >> 8) & 0xFF
            red = (v >> 16) & 0xFF
            blue = v & 0xFF
            red = (red + _ct_delta(int(g2r[ty, tx]), green)) & 0xFF
            blue = (blue + _ct_delta(int(g2b[ty, tx]), green)) & 0xFF
            blue = (blue + _ct_delta(int(r2b[ty, tx]), red)) & 0xFF
            out[y, x] = (v & 0xFF000000) | (red << 16) | (green << 8) | blue
    return out


def _inverse_subtract_green(img: np.ndarray) -> np.ndarray:
    g = (img >> 8) & 0xFF
    r = (((img >> 16) & 0xFF) + g) & 0xFF
    b = ((img & 0xFF) + g) & 0xFF
    return (img & 0xFF00FF00) | (r << 16) | b


def _inverse_color_indexing(
    img: np.ndarray, palette: np.ndarray, orig_w: int
) -> np.ndarray:
    h = img.shape[0]
    n_pal = palette.shape[0]
    if n_pal <= 2:
        width_bits = 3
    elif n_pal <= 4:
        width_bits = 2
    elif n_pal <= 16:
        width_bits = 1
    else:
        width_bits = 0
    idx = ((img >> 8) & 0xFF).astype(np.int64)
    if width_bits:
        ppb = 1 << width_bits  # pixels per packed byte
        bitw = 8 >> width_bits
        cols = []
        for k in range(ppb):
            cols.append((idx >> (k * bitw)) & ((1 << bitw) - 1))
        idx = np.stack(cols, axis=2).reshape(h, -1)[:, :orig_w]
    if int(idx.max(initial=0)) >= n_pal:
        raise ValueError("palette index out of range")
    return palette[idx]


# ------------------------------------------------------------- public API


def decode_vp8l_stream(data: bytes, w: int, h: int) -> np.ndarray:
    """Headerless VP8L image data (transforms + entropy image) -> (h, w)
    uint32 ARGB. Also the entry point for ALPH-chunk alpha planes."""
    return _decode_vp8l_body(_BitReader(data), w, h)


def _argb_to_rgb(img: np.ndarray) -> np.ndarray:
    h, w = img.shape
    out = np.empty((h, w, 3), dtype=np.uint8)
    out[..., 0] = (img >> 16) & 0xFF
    out[..., 1] = (img >> 8) & 0xFF
    out[..., 2] = img & 0xFF
    return out


def decode_webp(data: bytes) -> np.ndarray:
    """WebP container -> HxWx3 uint8. Lossless (VP8L) decodes through
    the pure-Python VP8L codec; lossy (VP8) through the pure-Python
    RFC 6386 keyframe decoder (sources/vp8.py, bit-exact with libwebp
    at the YUV level; RGB via the documented simple upsampler)."""
    if data[:4] != b"RIFF" or data[8:12] != b"WEBP":
        raise ValueError("not a WebP")
    pos = 12
    while pos + 8 <= len(data):
        tag = data[pos : pos + 4]
        ln = int.from_bytes(data[pos + 4 : pos + 8], "little")
        payload = data[pos + 8 : pos + 8 + ln]
        if len(payload) < ln:
            raise ValueError("truncated WebP chunk")
        pos += 8 + ln + (ln & 1)
        if tag == b"VP8L":
            return decode_vp8l(payload)
        if tag == b"VP8 ":
            from .vp8 import decode_vp8, yuv420_to_rgb

            return yuv420_to_rgb(*decode_vp8(payload))
        # VP8X / ALPH / metadata chunks: keep walking to the image chunk
    raise ValueError("WebP container has no image chunk")


def decode_vp8l(payload: bytes) -> np.ndarray:
    """A VP8L chunk payload (with the 5-byte header) -> HxWx3 uint8."""
    return _argb_to_rgb(_decode_vp8l_chunk(payload))


def decode_vp8l_rgba(payload: bytes) -> np.ndarray:
    """A VP8L chunk payload -> HxWx4 uint8 RGBA (alpha preserved — the
    animation compositor needs it)."""
    img = _decode_vp8l_chunk(payload)
    h, w = img.shape
    out = np.empty((h, w, 4), dtype=np.uint8)
    out[..., 0] = (img >> 16) & 0xFF
    out[..., 1] = (img >> 8) & 0xFF
    out[..., 2] = img & 0xFF
    out[..., 3] = (img >> 24) & 0xFF
    return out


def _decode_vp8l_chunk(payload: bytes) -> np.ndarray:
    if not payload or payload[0] != 0x2F:
        raise ValueError("bad VP8L signature")
    br = _BitReader(payload[1:])
    w = br.read(14) + 1
    h = br.read(14) + 1
    br.read(1)  # alpha-is-used hint
    if br.read(3) != 0:
        raise ValueError("bad VP8L version")
    return _decode_vp8l_body(br, w, h)


def _decode_vp8l_body(br: _BitReader, w: int, h: int) -> np.ndarray:
    transforms = []
    cur_w = w
    seen = set()
    while br.read(1):
        ttype = br.read(2)
        if ttype in seen:
            raise ValueError("duplicate VP8L transform")
        seen.add(ttype)
        if ttype in (0, 1):
            bits = br.read(3) + 2
            tw = (cur_w + (1 << bits) - 1) >> bits
            th = (h + (1 << bits) - 1) >> bits
            tiles = _decode_entropy_image(br, tw, th, False)
            transforms.append(("predictor" if ttype == 0 else "color", bits, tiles))
        elif ttype == 2:
            transforms.append(("subtract_green",))
        else:
            n_pal = br.read(8) + 1
            deltas = _decode_entropy_image(br, n_pal, 1, False)[0]
            pal = np.zeros(n_pal, dtype=np.uint32)
            prev = 0
            for i in range(n_pal):
                d = int(deltas[i])
                px = (
                    ((((prev >> 24) + (d >> 24)) & 0xFF) << 24)
                    | ((((prev >> 16) & 0xFF) + ((d >> 16) & 0xFF) & 0xFF) << 16)
                    | ((((prev >> 8) & 0xFF) + ((d >> 8) & 0xFF) & 0xFF) << 8)
                    | (((prev & 0xFF) + (d & 0xFF)) & 0xFF)
                )
                pal[i] = px
                prev = px
            if n_pal <= 2:
                cur_w = (cur_w + 7) >> 3
            elif n_pal <= 4:
                cur_w = (cur_w + 3) >> 2
            elif n_pal <= 16:
                cur_w = (cur_w + 1) >> 1
            transforms.append(("palette", pal, w))
    img = _decode_entropy_image(br, cur_w, h, True)
    for t in reversed(transforms):
        if t[0] == "predictor":
            img = _inverse_predictor(img, t[2], t[1])
        elif t[0] == "color":
            img = _inverse_color_transform(img, t[2], t[1])
        elif t[0] == "subtract_green":
            img = _inverse_subtract_green(img)
        else:
            img = _inverse_color_indexing(img, t[1], t[2])
    if img.shape != (h, w):
        raise ValueError("decoded VP8L dims mismatch")
    return img.astype(np.uint32)


def decode_alpha_vp8l(payload: bytes, w: int, h: int) -> np.ndarray:
    """ALPH chunk with compression method 1: the payload after the header
    byte is a headerless VP8L stream whose GREEN channel is the alpha
    plane. Returns (h, w) uint8 alpha."""
    img = _decode_vp8l_body(_BitReader(payload), w, h)
    return ((img >> 8) & 0xFF).astype(np.uint8)


def decode_alph_chunk(payload: bytes, w: int, h: int) -> np.ndarray:
    """Full ALPH chunk (WITH its flags byte) -> (h, w) uint8 alpha.

    Flags byte: bits 0-1 compression (0 raw, 1 VP8L green channel),
    bits 2-3 filtering (0 none, 1 horizontal, 2 vertical, 3 gradient),
    bits 4-5 pre-processing (level reduction — informative only)."""
    if not payload:
        raise ValueError("empty ALPH chunk")
    flags = payload[0]
    compression = flags & 3
    filt = (flags >> 2) & 3
    body = payload[1:]
    if compression == 0:
        if len(body) < w * h:
            raise ValueError("short raw ALPH payload")
        a = np.frombuffer(body[: w * h], np.uint8).reshape(h, w).astype(np.int32)
    elif compression == 1:
        a = decode_alpha_vp8l(body, w, h).astype(np.int32)
    else:
        raise ValueError(f"reserved ALPH compression {compression}")
    if filt:
        # predictions use DECODED neighbors; first row/col predict from
        # the top-left rules of the WebP spec (left=top for row 0 etc.).
        out = np.zeros((h, w), np.int32)
        for y in range(h):
            for x in range(w):
                if x == 0 and y == 0:
                    p = 0
                elif y == 0:
                    p = out[0, x - 1]
                elif x == 0:
                    p = out[y - 1, 0]
                elif filt == 1:
                    p = out[y, x - 1]
                elif filt == 2:
                    p = out[y - 1, x]
                else:
                    g = out[y, x - 1] + out[y - 1, x] - out[y - 1, x - 1]
                    p = 0 if g < 0 else (255 if g > 255 else g)
                out[y, x] = (a[y, x] + p) & 0xFF
        a = out
    return a.astype(np.uint8)


# ---------------------------------------------------------------- encoder


def _huffman_lengths(freqs: dict[int, int], alphabet_size: int) -> list[int]:
    """Plain Huffman lengths from a histogram, flat-code fallback if any
    length would exceed 15 (valid, just less tight)."""
    items = [(f, s) for s, f in freqs.items() if f]
    if not items:
        return [0] * alphabet_size
    if len(items) == 1:
        lengths = [0] * alphabet_size
        lengths[items[0][1]] = 1
        return lengths
    import heapq

    heap = [(f, [s]) for f, s in items]
    heapq.heapify(heap)
    depth = {s: 0 for _, s in items}
    while len(heap) > 1:
        f1, s1 = heapq.heappop(heap)
        f2, s2 = heapq.heappop(heap)
        for s in s1 + s2:
            depth[s] += 1
        heapq.heappush(heap, (f1 + f2, s1 + s2))
    if max(depth.values()) > 15:  # fallback: balanced complete code
        n = len(items)
        base = max(1, (n - 1).bit_length())
        short = (1 << base) - n  # symbols that get the shorter length
        lengths = [0] * alphabet_size
        for i, (_, s) in enumerate(sorted(items, key=lambda x: -x[0])):
            lengths[s] = base if i < short or base == 0 else base
        # a balanced code of ceil(log2 n): give 2^base - n symbols length
        # base-? — simplest valid complete code: all at ceil(log2(n)) only
        # when n is a power of two; otherwise split
        lengths = [0] * alphabet_size
        syms = [s for _, s in items]
        b = (n - 1).bit_length()
        n_long = 2 * (n - (1 << (b - 1))) if b else 0
        for i, s in enumerate(syms):
            lengths[s] = b + 1 if i < n_long else b
        return lengths
    lengths = [0] * alphabet_size
    for s, d in depth.items():
        lengths[s] = max(1, d)
    return lengths


def _write_code(bw: _BitWriter, code: int, n: int) -> None:
    """Write a canonical prefix code MSB-first into the LSB-first stream."""
    for i in range(n - 1, -1, -1):
        bw.write((code >> i) & 1, 1)


def encode_vp8l(
    arr: np.ndarray,
    *,
    subtract_green: bool = False,
    predictor_mode: int | None = None,
    use_palette: bool = False,
    cache_bits: int = 0,
    lz77_runs: bool = False,
) -> bytes:
    """HxWx3 (or HxWx4) uint8 -> a complete WebP container with one VP8L
    chunk. Options exercise each decode path; all combinations are
    lossless by construction."""
    if arr.dtype != np.uint8 or arr.ndim != 3 or arr.shape[2] not in (3, 4):
        raise ValueError("expected HxWx3/4 uint8")
    h, w, ch = arr.shape
    a = (
        arr[..., 3].astype(np.uint32)
        if ch == 4
        else np.full((h, w), 255, dtype=np.uint32)
    )
    argb = (
        (a << 24)
        | (arr[..., 0].astype(np.uint32) << 16)
        | (arr[..., 1].astype(np.uint32) << 8)
        | arr[..., 2].astype(np.uint32)
    )
    bw = _BitWriter()
    bw.write(w - 1, 14)
    bw.write(h - 1, 14)
    bw.write(1 if ch == 4 else 0, 1)
    bw.write(0, 3)  # version
    cur = argb
    if use_palette:
        colors, inv = np.unique(cur.reshape(-1), return_inverse=True)
        if len(colors) > 256:
            raise ValueError("palette encode wants <=256 distinct colors")
        bw.write(1, 1)
        bw.write(3, 2)  # COLOR_INDEXING
        bw.write(len(colors) - 1, 8)
        # palette entries delta-coded per channel, cumulative from 0
        deltas = np.zeros(len(colors), dtype=np.uint32)
        prev = 0
        for i, c in enumerate(colors):
            c = int(c)
            deltas[i] = (
                ((((c >> 24) - (prev >> 24)) & 0xFF) << 24)
                | (((((c >> 16) & 0xFF) - ((prev >> 16) & 0xFF)) & 0xFF) << 16)
                | (((((c >> 8) & 0xFF) - ((prev >> 8) & 0xFF)) & 0xFF) << 8)
                | ((((c & 0xFF) - (prev & 0xFF)) & 0xFF))
            )
            prev = c
        _encode_entropy_image(bw, deltas.reshape(1, -1), 0, False, level0=False)
        idx = inv.reshape(h, w).astype(np.uint32)
        n_pal = len(colors)
        if n_pal <= 2:
            bitw, ppb = 1, 8
        elif n_pal <= 4:
            bitw, ppb = 2, 4
        elif n_pal <= 16:
            bitw, ppb = 4, 2
        else:
            bitw, ppb = 8, 1
        if ppb > 1:
            packed_w = (w + ppb - 1) // ppb
            packed = np.zeros((h, packed_w), dtype=np.uint32)
            for k in range(ppb):
                col = idx[:, k::ppb]
                packed[:, : col.shape[1]] |= col << (k * bitw)
            cur = (packed << 8) | 0xFF000000
        else:
            cur = (idx << 8) | 0xFF000000
    if subtract_green and not use_palette:
        bw.write(1, 1)
        bw.write(2, 2)  # SUBTRACT_GREEN
        g = (cur >> 8) & 0xFF
        r = (((cur >> 16) & 0xFF) - g) & 0xFF
        b = ((cur & 0xFF) - g) & 0xFF
        cur = (cur & 0xFF00FF00) | (r << 16) | b
    if predictor_mode is not None and not use_palette:
        bits = 4
        bw.write(1, 1)
        bw.write(0, 2)  # PREDICTOR
        bw.write(bits - 2, 3)
        cw = cur.shape[1]
        tw = (cw + (1 << bits) - 1) >> bits
        th = (h + (1 << bits) - 1) >> bits
        tiles = np.full(
            (th, tw), 0xFF000000 | (predictor_mode << 8), dtype=np.uint32
        )
        _encode_entropy_image(bw, tiles, 0, False, level0=False)
        # forward predictor: residual = pixel - predicted (channel mod 256)
        res = cur.copy()
        for y in range(h):
            for x in range(cw):
                if y == 0 and x == 0:
                    pred = 0xFF000000
                elif y == 0:
                    pred = int(cur[0, x - 1])
                elif x == 0:
                    pred = int(cur[y - 1, 0])
                else:
                    left = int(cur[y, x - 1])
                    top = int(cur[y - 1, x])
                    tl = int(cur[y - 1, x - 1])
                    tr = int(cur[y - 1, x + 1]) if x + 1 < cw else int(cur[y, 0])
                    pred = _predict(predictor_mode, left, top, tl, tr)
                v = int(cur[y, x])
                res[y, x] = (
                    ((((v >> 24) - (pred >> 24)) & 0xFF) << 24)
                    | (((((v >> 16) & 0xFF) - ((pred >> 16) & 0xFF)) & 0xFF) << 16)
                    | (((((v >> 8) & 0xFF) - ((pred >> 8) & 0xFF)) & 0xFF) << 8)
                    | ((((v & 0xFF) - (pred & 0xFF)) & 0xFF))
                )
        cur = res
    bw.write(0, 1)  # no more transforms
    _encode_entropy_image(bw, cur, cache_bits, lz77_runs)
    payload = b"\x2f" + bw.bytes()
    chunk = b"VP8L" + struct.pack("<I", len(payload)) + payload
    if len(payload) % 2:
        chunk += b"\x00"
    return b"RIFF" + struct.pack("<I", 4 + len(chunk)) + b"WEBP" + chunk


def _encode_entropy_image(
    bw: _BitWriter, img: np.ndarray, cache_bits: int, lz77_runs: bool,
    level0: bool = True,
) -> None:
    """One entropy-coded image: single code group, optional color cache,
    optional dist=1 run coding for repeated pixels."""
    h, w = img.shape
    flat = img.reshape(-1).astype(np.uint32)
    n = len(flat)
    cache_size = (1 << cache_bits) if cache_bits else 0
    # token pass: (kind, payload) kind 0=literal argb, 1=(len run), 2=cache idx
    tokens: list[tuple[int, int]] = []
    cache = [None] * cache_size if cache_size else None
    i = 0
    while i < n:
        px = int(flat[i])
        if lz77_runs and i > 0 and px == int(flat[i - 1]):
            run = 1
            while i + run < n and int(flat[i + run]) == px and run < 4096:
                run += 1
            tokens.append((1, run))
            if cache_size:
                ci = _cache_index(px, cache_bits)
                cache[ci] = px
            i += run
            continue
        if cache_size:
            ci = _cache_index(px, cache_bits)
            if cache[ci] == px:
                tokens.append((2, ci))
                i += 1
                continue
            cache[ci] = px
        tokens.append((0, px))
        i += 1
    # histograms
    gf: dict[int, int] = {}
    rf: dict[int, int] = {}
    bf: dict[int, int] = {}
    af: dict[int, int] = {}
    df: dict[int, int] = {}
    for kind, v in tokens:
        if kind == 0:
            gf[(v >> 8) & 0xFF] = gf.get((v >> 8) & 0xFF, 0) + 1
            rf[(v >> 16) & 0xFF] = rf.get((v >> 16) & 0xFF, 0) + 1
            bf[v & 0xFF] = bf.get(v & 0xFF, 0) + 1
            af[(v >> 24) & 0xFF] = af.get((v >> 24) & 0xFF, 0) + 1
        elif kind == 1:
            lcode, _, _ = _lz77_code(v)
            gf[256 + lcode] = gf.get(256 + lcode, 0) + 1
            dcode, _, _ = _lz77_code(121)  # dist 1 encoded as 1+120
            df[dcode] = df.get(dcode, 0) + 1
        else:
            gf[256 + 24 + v] = gf.get(256 + 24 + v, 0) + 1
    # ensure non-empty histograms for R/B/A/D even in all-run images
    for f in (rf, bf, af):
        if not f:
            f[0] = 1
    if not df:
        df[0] = 1
    if not gf:
        gf[0] = 1
    if cache_bits:
        bw.write(1, 1)
        bw.write(cache_bits, 4)
    else:
        bw.write(0, 1)
    if level0:
        bw.write(0, 1)  # no meta prefix image (sub-images have no meta bit)
    gl = _huffman_lengths(gf, 256 + 24 + cache_size)
    rl = _huffman_lengths(rf, 256)
    bl = _huffman_lengths(bf, 256)
    al = _huffman_lengths(af, 256)
    dl = _huffman_lengths(df, 40)
    gc = _emit_code(bw, gl)
    rc = _emit_code(bw, rl)
    bc = _emit_code(bw, bl)
    ac = _emit_code(bw, al)
    dc = _emit_code(bw, dl)
    for kind, v in tokens:
        if kind == 0:
            code, ln = gc[(v >> 8) & 0xFF]
            _write_code(bw, code, ln)
            code, ln = rc[(v >> 16) & 0xFF]
            _write_code(bw, code, ln)
            code, ln = bc[v & 0xFF]
            _write_code(bw, code, ln)
            code, ln = ac[(v >> 24) & 0xFF]
            _write_code(bw, code, ln)
        elif kind == 1:
            lcode, extra, nbits = _lz77_code(v)
            code, ln = gc[256 + lcode]
            _write_code(bw, code, ln)
            bw.write(extra, nbits)
            dcode, dextra, dnbits = _lz77_code(121)
            code, ln = dc[dcode]
            _write_code(bw, code, ln)
            bw.write(dextra, dnbits)
        else:
            code, ln = gc[256 + 24 + v]
            _write_code(bw, code, ln)


def _emit_code(bw: _BitWriter, lengths: list[int]) -> dict:
    """Write one prefix-code header and return symbol -> (code, len)."""
    nz = [s for s, l in enumerate(lengths) if l]
    if 1 <= len(nz) <= 2 and max(nz) < 256:
        # force simple form (lengths may be [1] or [1,1])
        bw.write(1, 1)
        bw.write(len(nz) - 1, 1)
        if len(nz) == 1 and nz[0] < 2:
            bw.write(0, 1)
            bw.write(nz[0], 1)
        else:
            bw.write(1, 1)
            bw.write(nz[0], 8)
        if len(nz) == 2:
            bw.write(nz[1], 8)
            return {nz[0]: (0, 1), nz[1]: (1, 1)}
        return {nz[0]: (0, 0)}
    bw.write(0, 1)  # normal form
    cl_freq: dict[int, int] = {}
    for ln in lengths:
        cl_freq[ln] = cl_freq.get(ln, 0) + 1
    cl_lengths = _huffman_lengths(cl_freq, 19)
    order_pos = {c: i for i, c in enumerate(_CL_ORDER)}
    last_needed = max(order_pos[c] for c in range(19) if cl_lengths[c]) + 1
    num_codes = max(4, last_needed)
    bw.write(num_codes - 4, 4)
    for i in range(num_codes):
        bw.write(cl_lengths[_CL_ORDER[i]], 3)
    bw.write(0, 1)  # no max_symbol
    cl_codes = _canonical_codes(cl_lengths)
    single_cl = len(cl_codes) == 1
    for ln in lengths:
        if single_cl:
            continue  # 0-bit code: decoder reads nothing
        code, n = cl_codes[ln]
        _write_code(bw, code, n)
    return _canonical_codes(lengths)


# ------------------------------------------------------------- animation


def _walk_chunks(data: bytes, start: int = 12):
    pos = start
    while pos + 8 <= len(data):
        tag = data[pos : pos + 4]
        ln = int.from_bytes(data[pos + 4 : pos + 8], "little")
        payload = data[pos + 8 : pos + 8 + ln]
        if len(payload) < ln:
            raise ValueError("truncated WebP chunk")
        yield tag, payload
        pos += 8 + ln + (ln & 1)


def decode_webp_frames(data: bytes) -> list[np.ndarray]:
    """Animated (or still) WebP -> list of composited HxWx3 uint8 frames.

    ANMF sub-frames are placed at their (2x-coded) offsets on an opaque
    black canvas, honoring the spec's blending method (0 = alpha blend,
    1 = overwrite) and dispose-to-background; VP8L frames decode through
    the pure-Python codec (alpha preserved), lossy VP8 frames through the
    env-gated libwebp fallback (each wrapped back into a one-image
    container). A non-animated file returns its single frame."""
    if data[:4] != b"RIFF" or data[8:12] != b"WEBP":
        raise ValueError("not a WebP")
    canvas_w = canvas_h = None
    animated = False
    frames: list[np.ndarray] = []
    canvas = None
    for tag, payload in _walk_chunks(data):
        if tag == b"VP8X":
            animated = bool(payload[0] & 0x02)
            canvas_w = 1 + int.from_bytes(payload[4:7], "little")
            canvas_h = 1 + int.from_bytes(payload[7:10], "little")
            canvas = np.zeros((canvas_h, canvas_w, 4), dtype=np.uint8)
            canvas[..., 3] = 255  # opaque black background
        elif tag == b"ANMF":
            if canvas is None:
                raise ValueError("ANMF before VP8X")
            fx = 2 * int.from_bytes(payload[0:3], "little")
            fy = 2 * int.from_bytes(payload[3:6], "little")
            fw = 1 + int.from_bytes(payload[6:9], "little")
            fh = 1 + int.from_bytes(payload[9:12], "little")
            flags = payload[15]
            no_blend = bool((flags >> 1) & 1)
            dispose = bool(flags & 1)
            rgba = _decode_frame_payload(payload[16:], fw, fh)
            if fy + fh > canvas_h or fx + fw > canvas_w:
                raise ValueError("ANMF frame outside canvas")
            region = canvas[fy : fy + fh, fx : fx + fw]
            if no_blend:
                region[:] = rgba
            else:  # alpha blend over the canvas
                a = rgba[..., 3:4].astype(np.float64) / 255.0
                region[..., :3] = (
                    rgba[..., :3] * a + region[..., :3] * (1.0 - a)
                ).astype(np.uint8)
                region[..., 3] = np.maximum(region[..., 3], rgba[..., 3])
            frames.append(canvas[..., :3].copy())
            if dispose:
                region[..., :3] = 0
                region[..., 3] = 255
        # metadata chunks (ANIM/ICCP/EXIF/XMP) carry no pixels
    if animated:
        if not frames:
            raise ValueError("animated WebP with no frames")
        return frames
    return [decode_webp(data)]


def _decode_frame_payload(frame_data: bytes, fw: int, fh: int) -> np.ndarray:
    """The sub-chunks inside one ANMF frame -> HxWx4 RGBA."""
    alpha = None
    for tag, payload in _walk_chunks(frame_data, start=0):
        if tag == b"ALPH":
            alpha = payload
        elif tag == b"VP8L":
            rgba = decode_vp8l_rgba(payload)
            if rgba.shape[:2] != (fh, fw):
                raise ValueError("ANMF frame dims mismatch")
            return rgba
        elif tag == b"VP8 ":
            from .vp8 import decode_vp8, yuv420_to_rgb

            rgb = yuv420_to_rgb(*decode_vp8(payload))
            if rgb.shape[:2] != (fh, fw):
                raise ValueError("ANMF frame dims mismatch")
            rgba = np.empty((fh, fw, 4), dtype=np.uint8)
            rgba[..., :3] = rgb
            if alpha is not None:
                rgba[..., 3] = decode_alph_chunk(alpha, fw, fh)
            else:
                rgba[..., 3] = 255
            return rgba
    raise ValueError("ANMF frame has no image sub-chunk")


def encode_webp_anim(
    frames: list[np.ndarray], duration_ms: int = 40, **vp8l_opts
) -> bytes:
    """Full-canvas RGB(A) frames -> animated WebP (each frame VP8L-coded
    with ``vp8l_opts``, no-blend, no dispose). Fixture generator for the
    video fingerprint path."""
    if not frames:
        raise ValueError("need at least one frame")
    h, w = frames[0].shape[:2]
    chunks = b""
    vp8x = bytes([0x02, 0, 0, 0]) + (w - 1).to_bytes(3, "little") + (
        h - 1
    ).to_bytes(3, "little")
    chunks += b"VP8X" + struct.pack("<I", len(vp8x)) + vp8x
    anim = struct.pack("<IH", 0xFF000000, 0)  # bg color, loop forever
    chunks += b"ANIM" + struct.pack("<I", len(anim)) + anim
    for f in frames:
        if f.shape[:2] != (h, w):
            raise ValueError("all frames must be canvas-sized")
        whole = encode_vp8l(f, **vp8l_opts)
        # lift the VP8L chunk out of the single-image container
        vp8l_payload = None
        for tag, payload in _walk_chunks(whole):
            if tag == b"VP8L":
                vp8l_payload = payload
        assert vp8l_payload is not None
        sub = b"VP8L" + struct.pack("<I", len(vp8l_payload)) + vp8l_payload
        if len(vp8l_payload) % 2:
            sub += b"\x00"
        head = (
            (0).to_bytes(3, "little")
            + (0).to_bytes(3, "little")
            + (w - 1).to_bytes(3, "little")
            + (h - 1).to_bytes(3, "little")
            + duration_ms.to_bytes(3, "little")
            + bytes([0x02])  # no-blend, no dispose
        )
        anmf = head + sub
        chunks += b"ANMF" + struct.pack("<I", len(anmf)) + anmf
        if len(anmf) % 2:
            chunks += b"\x00"
    return b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WEBP" + chunks
