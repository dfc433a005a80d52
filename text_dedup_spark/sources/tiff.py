"""Pure-Python baseline TIFF codec (the public TIFF 6.0 spec).

Archival/scan corpora carry TIFF alongside PNG/JPEG; this decodes the
baseline still-image surface real writers emit:

- both byte orders (II little-endian, MM big-endian), first IFD;
- compressions 1 (none), 5 (LZW, MSB-first with early code change),
  8/32946 (Deflate), 32773 (PackBits);
- photometric 0/1 (gray, WhiteIsZero inverted), 2 (RGB), 3 (palette);
- bits per sample 1/4/8 (gray+palette) and 16 (gray/RGB, high byte);
- extra samples (alpha) dropped; horizontal-differencing predictor (2)
  for 8- and 16-bit samples; multi-strip images;
- tiled layout (TileWidth/TileLength/TileOffsets/TileByteCounts, edge
  tiles padded to full tile size per the spec) and planar configuration 2
  (separate sample planes), in any combination.

Output is normalized to the pipeline's HxWx3 uint8 contract like
sources/png.py. Float samples, photometrics beyond 3 (YCbCr/CMYK/Lab),
and sub-byte predictor-2 raise NotImplementedError — the operator-level
skip+flag policy turns those into decode_ok=false rows, never task
failures. ``encode_tiff`` writes fixtures (and gray/palette/alpha output
tables) for every decode-supported variant — including tiled and planar
layouts — so the round-trip matrix exercises a separate forward
implementation.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_TYPE_SIZE = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8}  # BYTE ASCII SHORT LONG RATIONAL


def _read_entries(data: bytes, bo: str):
    """First-IFD tag dict: tag -> list of ints (RATIONALs as num/den pairs)."""
    (ifd_off,) = struct.unpack(bo + "I", data[4:8])
    (n,) = struct.unpack(bo + "H", data[ifd_off : ifd_off + 2])
    tags = {}
    for i in range(n):
        e = data[ifd_off + 2 + i * 12 : ifd_off + 14 + i * 12]
        tag, typ, cnt = struct.unpack(bo + "HHI", e[:8])
        if typ not in _TYPE_SIZE:
            continue  # unknown type: skip (spec-sanctioned reader behavior)
        size = _TYPE_SIZE[typ] * cnt
        raw = e[8:12] if size <= 4 else None
        if raw is None:
            (off,) = struct.unpack(bo + "I", e[8:12])
            raw = data[off : off + size]
            if len(raw) < size:
                raise ValueError("TIFF tag data out of bounds")
        if typ == 3:
            vals = list(struct.unpack(bo + "H" * cnt, raw[: 2 * cnt]))
        elif typ == 4:
            vals = list(struct.unpack(bo + "I" * cnt, raw[: 4 * cnt]))
        elif typ == 5:
            vals = list(struct.unpack(bo + "I" * (2 * cnt), raw))
        else:  # BYTE / ASCII
            vals = list(raw[:cnt])
        tags[tag] = vals
    return tags


def _lzw_decode(data: bytes) -> bytes:
    """TIFF-variant LZW: MSB-first bit packing, 9-bit start codes,
    Clear=256 / EOI=257, and the spec's early code-width change (the width
    grows when the NEXT code would not fit, i.e. at table size 2**w - 1)."""
    out = bytearray()
    table: list[bytes] = []

    def reset():
        nonlocal table, width
        table = [bytes([i]) for i in range(256)] + [b"", b""]
        width = 9

    width = 9
    reset()
    buf = 0
    nbits = 0
    prev: bytes | None = None
    for byte in data:
        buf = (buf << 8) | byte
        nbits += 8
        while nbits >= width:
            code = (buf >> (nbits - width)) & ((1 << width) - 1)
            nbits -= width
            if code == 256:
                reset()
                prev = None
                continue
            if code == 257:
                return bytes(out)
            if prev is None:
                entry = table[code]
            elif code < len(table):
                entry = table[code]
                table.append(prev + entry[:1])
            elif code == len(table):
                entry = prev + prev[:1]
                table.append(entry)
            else:
                raise ValueError("corrupt LZW stream")
            out += entry
            prev = entry
            # early change, decoder side: the decoder's table lags the
            # encoder's by one entry, so it widens at 2**w - 2 where the
            # encoder widens at 2**w - 1
            if len(table) == (1 << width) - 2 and width < 12:
                width += 1
    return bytes(out)


def _lzw_encode(data: bytes) -> bytes:
    """Forward TIFF LZW (fixture generation; mirrors _lzw_decode's early
    change so libtiff-compatible streams come out)."""
    out = bytearray()
    buf = 0
    nbits = 0

    def emit(code: int, width: int):
        nonlocal buf, nbits
        buf = (buf << width) | code
        nbits += width
        while nbits >= 8:
            out.append((buf >> (nbits - 8)) & 0xFF)
            nbits -= 8

    table = {bytes([i]): i for i in range(256)}
    nxt = 258
    width = 9
    emit(256, width)
    w = b""
    for byte in data:
        wc = w + bytes([byte])
        if wc in table:
            w = wc
            continue
        emit(table[w], width)
        table[wc] = nxt
        nxt += 1
        if nxt == (1 << width) - 1 and width < 12:
            width += 1
        if nxt >= 4094:  # table nearly full: clear (keeps decoder in sync)
            emit(256, width)
            table = {bytes([i]): i for i in range(256)}
            nxt = 258
            width = 9
        w = bytes([byte])
    if w:
        emit(table[w], width)
    emit(257, width)
    if nbits:
        out.append((buf << (8 - nbits)) & 0xFF)
    return bytes(out)


def _packbits_decode(data: bytes, expect: int) -> bytes:
    out = bytearray()
    i = 0
    while i < len(data) and len(out) < expect:
        n = data[i]
        i += 1
        if n < 128:
            out += data[i : i + n + 1]
            i += n + 1
        elif n > 128:
            out += data[i : i + 1] * (257 - n)
            i += 1
        # n == 128: no-op
    if len(out) < expect:
        raise ValueError("PackBits strip short")
    return bytes(out[:expect])


def _packbits_encode(data: bytes) -> bytes:
    """Simple literal-run PackBits writer (fixtures; correctness only)."""
    out = bytearray()
    i = 0
    while i < len(data):
        run = 1
        while i + run < len(data) and data[i + run] == data[i] and run < 128:
            run += 1
        if run >= 2:
            out += bytes([257 - run, data[i]])
            i += run
        else:
            j = i + 1
            while (
                j < len(data)
                and (j + 1 >= len(data) or data[j + 1] != data[j])
                and j - i < 128
            ):
                j += 1
            out += bytes([j - i - 1]) + data[i:j]
            i = j
    return bytes(out)


def _decompress(chunk: bytes, comp: int, expect: int) -> bytes:
    """One strip/tile -> exactly ``expect`` raw bytes (or raise)."""
    if comp == 1:
        dec = chunk[:expect]
        if len(dec) < expect:
            raise ValueError("TIFF strip short")
    elif comp == 5:
        dec = _lzw_decode(chunk)[:expect]
        if len(dec) < expect:
            raise ValueError("TIFF LZW strip short")
    elif comp in (8, 32946):
        dec = zlib.decompress(chunk)[:expect]
        if len(dec) < expect:
            raise ValueError("TIFF deflate strip short")
    elif comp == 32773:
        dec = _packbits_decode(chunk, expect)
    else:
        raise NotImplementedError(f"TIFF compression {comp} not supported")
    return dec


def _samples_from_raw(
    raw: bytes, rows: int, width: int, spp: int, bits: int, bo: str, pred: int
) -> np.ndarray:
    """Raw (already decompressed) scanline bytes -> (rows, width, spp)
    uint8 sample codes: undo predictor 2 (per sample lane; 16-bit lanes
    accumulate mod 65536 per the spec), then reduce to 8-bit codes (16-bit
    keeps the high byte, sub-byte unpacks MSB-first)."""
    stride = (width * spp * bits + 7) // 8
    arr = np.frombuffer(raw, dtype=np.uint8).reshape(rows, stride)
    if pred == 2 and bits == 16:
        dt = ">u2" if bo == ">" else "<u2"
        vals = np.frombuffer(raw, dtype=dt).reshape(rows, width, spp)
        acc = np.cumsum(vals.astype(np.int64), axis=1) & 0xFFFF
        return (acc >> 8).astype(np.uint8)
    if pred == 2:  # bits == 8: horizontal differencing per sample channel
        lanes = arr.reshape(rows, width, spp).astype(np.int64)
        arr = (
            (np.cumsum(lanes, axis=1) & 0xFF).astype(np.uint8).reshape(rows, stride)
        )
    if bits == 8:
        return arr.reshape(rows, width, spp)
    if bits == 16:
        pairs = arr.reshape(rows, width, spp, 2)
        return pairs[..., 0] if bo == ">" else pairs[..., 1]
    # 1 or 4, spp == 1
    bits_arr = np.unpackbits(arr, axis=1)
    groups = bits_arr[:, : (stride * 8 // bits) * bits].reshape(rows, -1, bits)
    weights = (1 << np.arange(bits - 1, -1, -1)).astype(np.uint8)
    return ((groups * weights).sum(axis=2).astype(np.uint8))[:, :width, None]


def decode_tiff(data: bytes) -> np.ndarray:
    """TIFF bytes -> HxWx3 uint8 (scope in the module docstring)."""
    if data[:2] == b"II" and data[2:4] == b"*\x00":
        bo = "<"
    elif data[:2] == b"MM" and data[2:4] == b"\x00*":
        bo = ">"
    else:
        raise ValueError("not a TIFF")
    t = _read_entries(data, bo)
    tiled = 322 in t or 323 in t
    planar = t.get(284, [1])[0]
    if planar not in (1, 2):
        raise NotImplementedError(f"planar configuration {planar} not supported")
    if t.get(339, [1])[0] not in (1,):  # SampleFormat: unsigned only
        raise NotImplementedError("non-integer TIFF samples not supported")
    try:
        w = t[256][0]
        h = t[257][0]
        offsets = t[324] if tiled else t[273]
        counts = t[325] if tiled else t[279]
        photo = t[262][0]
    except KeyError as e:
        raise ValueError(f"TIFF missing required tag {e}") from e
    spp = t.get(277, [1])[0]
    bits_l = t.get(258, [1] * spp)
    if len(set(bits_l)) != 1:
        raise NotImplementedError("mixed bits-per-sample")
    bits = bits_l[0]
    comp = t.get(259, [1])[0]
    pred = t.get(317, [1])[0]
    rps = t.get(278, [h])[0] or h
    if photo not in (0, 1, 2, 3):
        raise NotImplementedError(f"TIFF photometric {photo} not supported")
    if bits not in (1, 4, 8, 16):
        raise NotImplementedError(f"{bits}-bit TIFF samples not supported")
    if bits < 8 and (spp != 1 or photo == 2):
        raise NotImplementedError("sub-byte TIFF only for gray/palette")
    if pred == 2 and bits not in (8, 16):
        raise NotImplementedError("predictor 2 only for 8/16-bit samples")
    if pred not in (1, 2):
        raise NotImplementedError(f"TIFF predictor {pred} not supported")
    if w == 0 or h == 0:
        raise ValueError("zero-dimension TIFF")
    # planar config 2: each plane is laid out as an independent 1-sample
    # image; chunky is the planes==1 case of the same loops
    planes = spp if planar == 2 else 1
    spp_eff = 1 if planar == 2 else spp

    def chunk_at(i: int) -> bytes:
        off, cnt = offsets[i], counts[i]
        chunk = bytes(data[off : off + cnt])
        if len(chunk) < cnt:
            raise ValueError("TIFF strip out of bounds")
        return chunk

    plane_samples = []
    if tiled:
        try:
            tw = t[322][0]
            th = t[323][0]
        except KeyError as e:
            raise ValueError(f"tiled TIFF missing tag {e}") from e
        if tw == 0 or th == 0:
            raise ValueError("zero-dimension TIFF tile")
        across = (w + tw - 1) // tw
        down = (h + th - 1) // th
        per_plane = across * down
        if len(offsets) < planes * per_plane or len(counts) < planes * per_plane:
            raise ValueError("TIFF tile table short")
        tile_stride = (tw * spp_eff * bits + 7) // 8
        for p in range(planes):
            canvas = np.zeros((down * th, across * tw, spp_eff), dtype=np.uint8)
            for ti in range(per_plane):
                dec = _decompress(chunk_at(p * per_plane + ti), comp, th * tile_stride)
                ty, tx = divmod(ti, across)
                canvas[ty * th : (ty + 1) * th, tx * tw : (tx + 1) * tw] = (
                    _samples_from_raw(dec, th, tw, spp_eff, bits, bo, pred)
                )
            plane_samples.append(canvas[:h, :w])
    else:
        per_plane = (h + rps - 1) // rps
        if len(offsets) < planes * per_plane or len(counts) < planes * per_plane:
            raise ValueError("TIFF strip table short")
        stride = (w * spp_eff * bits + 7) // 8
        for p in range(planes):
            raw = bytearray()
            for si in range(per_plane):
                rows = min(rps, h - si * rps)
                raw += _decompress(
                    chunk_at(p * per_plane + si), comp, rows * stride)
            plane_samples.append(
                _samples_from_raw(bytes(raw), h, w, spp_eff, bits, bo, pred))
    samples = (
        plane_samples[0] if planes == 1
        else np.concatenate(plane_samples, axis=2)
    )
    if photo == 2:
        if spp < 3:
            raise ValueError("RGB TIFF with <3 samples")
        return np.ascontiguousarray(samples[..., :3])
    if photo == 3:
        cmap = t.get(320)
        if not cmap or len(cmap) != 3 * (1 << bits):
            raise ValueError("palette TIFF missing/bad ColorMap")
        pal = (np.array(cmap, dtype=np.uint16).reshape(3, -1).T >> 8).astype(
            np.uint8
        )
        return pal[samples[..., 0]]
    g = samples[..., 0]
    if bits < 8:
        g = g * np.uint8(255 // ((1 << bits) - 1))
    if photo == 0:  # WhiteIsZero
        g = np.uint8(255) - g
    return np.repeat(g[..., None], 3, axis=2)


def encode_tiff(
    arr: np.ndarray,
    *,
    photometric: int = 2,
    compression: int = 1,
    bits: int = 8,
    predictor: int = 1,
    rows_per_strip: int | None = None,
    palette: np.ndarray | None = None,
    big_endian: bool = False,
    tiles: tuple[int, int] | None = None,
    planar: int = 1,
) -> bytes:
    """Write any decode-supported baseline TIFF variant.

    ``arr`` by photometric: 0/1 -> (H,W) gray codes, 2 -> (H,W,3|4) RGB(A),
    3 -> (H,W) palette indices with ``palette`` (N,3) uint8 — uint8 codes
    throughout (16-bit widens v to v*257, matching the decoder's high-byte
    reduction). ``tiles=(tw, th)`` writes the tiled layout (edge tiles
    zero-padded to full size per the spec); ``planar=2`` writes separate
    sample planes. Fixture generator and gray/palette output writer;
    exercises a forward path independent of decode_tiff."""
    if photometric in (0, 1, 3) and arr.ndim == 2:
        arr = arr[..., None]
    if arr.dtype != np.uint8 or arr.ndim != 3:
        raise ValueError("expected uint8 HxW[xC] sample codes")
    h, w, spp = arr.shape
    if photometric == 2 and spp not in (3, 4):
        raise ValueError("RGB wants 3 or 4 samples")
    if bits < 8:
        if spp != 1 or int(arr.max(initial=0)) >= (1 << bits):
            raise ValueError("sub-byte TIFF wants single-sample small codes")
    if predictor == 2 and bits not in (8, 16):
        raise ValueError("predictor 2 only for 8/16-bit samples")
    if planar not in (1, 2):
        raise ValueError("planar configuration must be 1 or 2")
    bo = ">" if big_endian else "<"
    rps = rows_per_strip or h
    # photometric 0 stores inverted *meaning*, not inverted codes — the
    # decoder does the inversion, so codes pass through unchanged here
    codes = arr

    def pack(rows: np.ndarray) -> bytes:
        """(n, width, nsamp) uint8 codes -> raw scanline bytes."""
        width, nsamp = rows.shape[1], rows.shape[2]
        if bits == 16:
            wide = rows.astype(np.uint16) * 257
            if predictor == 2:
                diff = wide.astype(np.int32).copy()
                diff[:, 1:, :] = diff[:, 1:, :] - diff[:, :-1, :].astype(np.int32)
                wide = (diff & 0xFFFF).astype(np.uint16)
            dt = ">u2" if big_endian else "<u2"
            return np.ascontiguousarray(wide, dtype=dt).tobytes()
        if predictor == 2:
            lanes = rows.astype(np.int16)
            diff = lanes.copy()
            diff[:, 1:, :] = lanes[:, 1:, :] - lanes[:, :-1, :]
            rows = (diff & 0xFF).astype(np.uint8)
        if bits == 8:
            return rows.reshape(rows.shape[0], width * nsamp).tobytes()
        b = (
            (rows.reshape(rows.shape[0], width)[:, :, None]
             >> np.arange(bits - 1, -1, -1)) & 1
        ).astype(np.uint8)
        flat = b.reshape(rows.shape[0], width * bits)
        pad = (-flat.shape[1]) % 8
        if pad:
            flat = np.pad(flat, ((0, 0), (0, pad)))
        return np.packbits(flat, axis=1).tobytes()

    def squeeze(raw: bytes) -> bytes:
        if compression == 1:
            return raw
        if compression == 5:
            return _lzw_encode(raw)
        if compression in (8, 32946):
            return zlib.compress(raw, 6)
        if compression == 32773:
            return _packbits_encode(raw)
        raise ValueError(f"unsupported compression {compression}")

    plane_arrays = (
        [codes[:, :, s : s + 1] for s in range(spp)] if planar == 2 else [codes]
    )
    strips = []
    if tiles is not None:
        tw, th = tiles
        if tw % 16 or th % 16:
            # TIFF 6.0 p.67: TileWidth/TileLength "must be a multiple of
            # 16" — libtiff-based readers reject or warn on violations, so
            # emitted fixtures stay spec-conforming (the DECODER remains
            # lenient: wild files do violate this)
            raise ValueError("TIFF tile dimensions must be multiples of 16")
        for plane in plane_arrays:
            for y0 in range(0, h, th):
                for x0 in range(0, w, tw):
                    block = plane[y0 : y0 + th, x0 : x0 + tw]
                    full = np.zeros((th, tw, plane.shape[2]), dtype=np.uint8)
                    full[: block.shape[0], : block.shape[1]] = block
                    strips.append(squeeze(pack(full)))
    else:
        for plane in plane_arrays:
            for y0 in range(0, h, rps):
                strips.append(squeeze(pack(plane[y0 : y0 + rps])))

    # layout: header(8) | strip data | bits array | colormap | IFD
    header = (b"II*\x00" if not big_endian else b"MM\x00*")
    pos = 8
    strip_offsets = []
    body = bytearray()
    for s in strips:
        strip_offsets.append(pos)
        body += s
        pos += len(s)
    if pos % 2:
        body += b"\x00"
        pos += 1

    entries = []  # (tag, type, count, value_or_bytes)

    def short(tag, *vals):
        entries.append((tag, 3, len(vals), list(vals)))

    def long_(tag, *vals):
        entries.append((tag, 4, len(vals), list(vals)))

    short(256, w)
    short(257, h)
    short(258, *([bits] * spp))
    short(259, compression)
    short(262, photometric)
    if tiles is not None:
        short(322, tiles[0])
        short(323, tiles[1])
        long_(324, *strip_offsets)
        long_(325, *[len(s) for s in strips])
    else:
        long_(273, *strip_offsets)
        short(278, rps)
        long_(279, *[len(s) for s in strips])
    short(277, spp)
    short(284, planar)
    if predictor != 1:
        short(317, predictor)
    if photometric == 3:
        if palette is None:
            raise ValueError("palette TIFF needs a palette")
        pal = np.zeros((3, 1 << bits), dtype=np.uint16)
        p = np.asarray(palette, dtype=np.uint8)
        pal[:, : p.shape[0]] = (p.astype(np.uint16) * 257).T
        short(320, *pal.flatten().tolist())
    if spp == 4 and photometric == 2:
        short(338, 2)  # unassociated alpha

    # place out-of-line tag arrays after strip data, then the IFD
    out_of_line = bytearray()
    fixed = []
    for tag, typ, cnt, vals in sorted(entries):
        size = _TYPE_SIZE[typ] * cnt
        fmt = "H" if typ == 3 else "I"
        packed = struct.pack(bo + fmt * cnt, *vals)
        if size <= 4:
            fixed.append((tag, typ, cnt, packed.ljust(4, b"\x00")))
        else:
            off = pos + len(out_of_line)
            out_of_line += packed
            if len(out_of_line) % 2:
                out_of_line += b"\x00"
            fixed.append((tag, typ, cnt, struct.pack(bo + "I", off)))
    ifd_off = pos + len(out_of_line)
    ifd = struct.pack(bo + "H", len(fixed))
    for tag, typ, cnt, val4 in fixed:
        ifd += struct.pack(bo + "HHI", tag, typ, cnt) + val4
    ifd += struct.pack(bo + "I", 0)
    return header + struct.pack(bo + "I", ifd_off) + bytes(body) + bytes(
        out_of_line
    ) + ifd
