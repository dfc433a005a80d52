"""Pure-Python GIF codec (GIF87a/89a, the public GIF specification).

GIF is the third most common still/animated image container in web
corpora after JPEG and PNG, so the image-dedup surface should decode it
natively (the container has no PIL). Scope:

- **decode**: global + local color tables, LZW-compressed image data
  (variable code width 3..12 bits, deferred-clear tolerant), interlaced
  row order, and animation — frames with sub-canvas regions, graphic
  control extensions (transparency + disposal none/keep/background/
  previous) composited onto the logical-screen canvas. Returns every
  composited frame, so a 1-frame GIF is a still image and an N-frame GIF
  plugs into the video fingerprint path.
- **encode**: single- or multi-frame writer used to build deterministic
  test fixtures — exact palette when the input has <=256 unique colors
  (lossless round-trip, which the tests assert), else a fixed 6x7x6
  color-cube quantize (deterministic, lossy); optional interlacing;
  NETSCAPE looping extension on animations so decoders see a real-world
  block layout.

No reference analog: the reference engine (weiyx16/text-dedup) is
text-only; the image modality is this repo's extension of the dedup
surface to image+caption corpora (BASELINE.json input_hint).

Error contract matches sources/png.py: ValueError for corrupt/truncated
streams, NotImplementedError never (all GIF87a/89a features in the wild
are covered); low-level crashes are normalized by the decode_image seam.
"""

from __future__ import annotations

import struct

import numpy as np

_MAGICS = (b"GIF87a", b"GIF89a")


def is_gif(data: bytes) -> bool:
    return len(data) >= 6 and data[:6] in _MAGICS


# --- LZW (GIF variant: LSB-first bit packing, variable 3..12-bit codes) -----


def _lzw_decode(mcs: int, data: bytes, expected: int) -> bytes:
    """GIF LZW stream -> pixel indices (one byte per pixel).

    ``mcs`` is the minimum code size from the image data header;
    ``expected`` bounds the output so a corrupt stream cannot balloon.
    Tolerates deferred clear codes (full table, no reset) as real-world
    encoders emit them."""
    if not 2 <= mcs <= 11:
        raise ValueError(f"GIF LZW minimum code size {mcs} out of range")
    clear = 1 << mcs
    end = clear + 1
    code_size = mcs + 1
    # table as (prefix_code, suffix_byte); roots are (-1, i)
    prefix = np.full(4096, -1, dtype=np.int32)
    suffix = np.zeros(4096, dtype=np.uint8)
    suffix[:clear] = np.arange(clear, dtype=np.uint8)
    next_code = end + 1
    out = bytearray()
    prev = -1
    acc = 0
    nbits = 0
    pos = 0

    def expand(code: int) -> bytes:
        chunk = bytearray()
        c = code
        while c >= 0:
            chunk.append(suffix[c])
            c = int(prefix[c]) if c >= clear else -1
            if len(chunk) > 4096:
                raise ValueError("GIF LZW chain cycle")
        chunk.reverse()
        return bytes(chunk)

    while True:
        while nbits < code_size:
            if pos >= len(data):
                # streams lacking an explicit end code exist in the wild;
                # accept iff we already produced every expected pixel
                if len(out) >= expected:
                    return bytes(out[:expected])
                raise ValueError("GIF LZW stream truncated")
            acc |= data[pos] << nbits
            nbits += 8
            pos += 1
        code = acc & ((1 << code_size) - 1)
        acc >>= code_size
        nbits -= code_size
        if code == clear:
            code_size = mcs + 1
            next_code = end + 1
            prev = -1
            continue
        if code == end:
            break
        if prev < 0:
            if code >= clear:
                raise ValueError("GIF LZW first code not a root")
            out.append(code)
            prev = code
            continue
        if code < next_code:
            entry = expand(code) if code >= clear else bytes([code])
        elif code == next_code:
            head = expand(prev) if prev >= clear else bytes([prev])
            entry = head + head[:1]
        else:
            raise ValueError("GIF LZW code out of table range")
        out += entry
        if next_code < 4096:
            prefix[next_code] = prev
            suffix[next_code] = entry[0]
            next_code += 1
            if next_code == (1 << code_size) and code_size < 12:
                code_size += 1
        prev = code
        if len(out) > expected:
            return bytes(out[:expected])
    return bytes(out[:expected]) if len(out) >= expected else bytes(out)


def _lzw_encode(mcs: int, indices: bytes) -> bytes:
    """Pixel indices -> GIF LZW stream, mirroring _lzw_decode's growth
    timing (code size bumps one step behind the decoder's table — the
    classic no-early-change rule) and clearing just before the 12-bit
    table would overflow."""
    clear = 1 << mcs
    end = clear + 1
    out = bytearray()
    acc = 0
    nbits = 0

    def emit(code: int, size: int) -> None:
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += size
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    code_size = mcs + 1
    table: dict[bytes, int] = {bytes([i]): i for i in range(clear)}
    next_code = end + 1
    emit(clear, code_size)
    if indices:
        current = indices[:1]
        for b in indices[1:]:
            cand = current + bytes([b])
            if cand in table:
                current = cand
                continue
            emit(table[current], code_size)
            if next_code < 4096:
                table[cand] = next_code
                next_code += 1
                # decoder inserts this entry only after reading the NEXT
                # code, so its width grows one emission later than the
                # table size alone would suggest
                if next_code == (1 << code_size) + 1 and code_size < 12:
                    code_size += 1
            else:
                emit(clear, code_size)
                table = {bytes([i]): i for i in range(clear)}
                next_code = end + 1
                code_size = mcs + 1
            current = bytes([b])
        emit(table[current], code_size)
    emit(end, code_size)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


# --- block-level parsing -----------------------------------------------------

_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def _read_subblocks(data: bytes, pos: int) -> tuple[bytes, int]:
    chunks = []
    while True:
        if pos >= len(data):
            raise ValueError("GIF sub-block stream truncated")
        n = data[pos]
        pos += 1
        if n == 0:
            return b"".join(chunks), pos
        if pos + n > len(data):
            raise ValueError("GIF sub-block overruns buffer")
        chunks.append(data[pos : pos + n])
        pos += n


def _deinterlace(rows: np.ndarray) -> np.ndarray:
    h = rows.shape[0]
    out = np.empty_like(rows)
    src = 0
    for start, step in _INTERLACE_PASSES:
        for y in range(start, h, step):
            out[y] = rows[src]
            src += 1
    return out


def decode_gif(data: bytes) -> np.ndarray:
    """GIF bytes -> uint8 (n_frames, h, w, 3) composited RGB frames at
    logical-screen size. Still images are n_frames == 1."""
    if not is_gif(data):
        raise ValueError("not a GIF stream")
    if len(data) < 13:
        raise ValueError("GIF header truncated")
    w, h, packed, bg_index, _aspect = struct.unpack("<HHBBB", data[6:13])
    if w == 0 or h == 0:
        raise ValueError("GIF has zero logical-screen dimension")
    pos = 13
    gct = None
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        if pos + 3 * n > len(data):
            raise ValueError("GIF global color table truncated")
        gct = np.frombuffer(data[pos : pos + 3 * n], dtype=np.uint8).reshape(n, 3)
        pos += 3 * n

    if gct is not None and bg_index < len(gct):
        canvas = np.tile(gct[bg_index], (h, w, 1)).astype(np.uint8)
    else:
        canvas = np.zeros((h, w, 3), dtype=np.uint8)

    frames: list[np.ndarray] = []
    transparent = -1
    disposal = 0
    while True:
        if pos >= len(data):
            # missing trailer: accept what decoded (real-world truncation
            # after the last frame), else it is corrupt
            break
        block = data[pos]
        pos += 1
        if block == 0x3B:  # trailer
            break
        if block == 0x21:  # extension
            if pos >= len(data):
                raise ValueError("GIF extension truncated")
            label = data[pos]
            pos += 1
            body, pos = _read_subblocks(data, pos)
            if label == 0xF9 and len(body) >= 4:  # graphic control
                gc_packed = body[0]
                disposal = (gc_packed >> 2) & 0x07
                transparent = body[3] if gc_packed & 0x01 else -1
            continue
        if block != 0x2C:
            raise ValueError(f"unknown GIF block 0x{block:02x}")
        if pos + 9 > len(data):
            raise ValueError("GIF image descriptor truncated")
        fx, fy, fw, fh, fpacked = struct.unpack("<HHHHB", data[pos : pos + 9])
        pos += 9
        if fw == 0 or fh == 0 or fx + fw > w or fy + fh > h:
            raise ValueError("GIF frame region outside logical screen")
        table = gct
        if fpacked & 0x80:
            n = 2 << (fpacked & 0x07)
            if pos + 3 * n > len(data):
                raise ValueError("GIF local color table truncated")
            table = np.frombuffer(data[pos : pos + 3 * n], dtype=np.uint8).reshape(n, 3)
            pos += 3 * n
        if table is None:
            raise ValueError("GIF frame has neither local nor global color table")
        if pos >= len(data):
            raise ValueError("GIF image data truncated")
        mcs = data[pos]
        pos += 1
        stream, pos = _read_subblocks(data, pos)
        idx = _lzw_decode(mcs, stream, fw * fh)
        if len(idx) < fw * fh:
            raise ValueError("GIF frame pixel data incomplete")
        region = np.frombuffer(idx, dtype=np.uint8).reshape(fh, fw)
        if fpacked & 0x40:
            region = _deinterlace(region)
        if int(region.max()) >= len(table):
            raise ValueError("GIF pixel index outside color table")

        before = canvas.copy() if disposal == 3 else None
        patch = canvas[fy : fy + fh, fx : fx + fw]
        if 0 <= transparent < len(table):
            mask = region != transparent
            patch[mask] = table[region][mask]
        else:
            patch[:] = table[region]
        frames.append(canvas.copy())
        if disposal == 2:  # restore region to background
            if gct is not None and bg_index < len(gct):
                canvas[fy : fy + fh, fx : fx + fw] = gct[bg_index]
            else:
                canvas[fy : fy + fh, fx : fx + fw] = 0
        elif disposal == 3 and before is not None:  # restore to previous
            canvas = before
        disposal = 0
        transparent = -1

    if not frames:
        raise ValueError("GIF contains no image data")
    return np.stack(frames)


# --- encoder ----------------------------------------------------------------


def _palette_and_indices(frames: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """(n, h, w, 3) -> (palette (p,3), indices (n, h, w)). Exact palette
    when <=256 unique colors (lexicographically sorted: deterministic and
    lossless); else a fixed 6x7x6 cube quantize (252 colors)."""
    flat = frames.reshape(-1, 3)
    colors = np.unique(flat, axis=0)
    if len(colors) <= 256:
        packed = (
            colors[:, 0].astype(np.int64) << 16
            | colors[:, 1].astype(np.int64) << 8
            | colors[:, 2].astype(np.int64)
        )
        lut = {int(c): i for i, c in enumerate(packed)}
        keys = (
            flat[:, 0].astype(np.int64) << 16
            | flat[:, 1].astype(np.int64) << 8
            | flat[:, 2].astype(np.int64)
        )
        idx = np.array([lut[int(k)] for k in keys], dtype=np.uint8)
        return colors, idx.reshape(frames.shape[:3])
    r = np.minimum(flat[:, 0] // 43, 5).astype(np.int64)
    g = np.minimum(flat[:, 1] // 37, 6).astype(np.int64)
    b = np.minimum(flat[:, 2] // 43, 5).astype(np.int64)
    idx = (r * 42 + g * 6 + b).astype(np.uint8)
    ri, gi, bi = np.meshgrid(np.arange(6), np.arange(7), np.arange(6), indexing="ij")
    pal = np.stack(
        [ri * 51, (gi * 255) // 6, bi * 51], axis=-1
    ).reshape(-1, 3).astype(np.uint8)
    return pal, idx.reshape(frames.shape[:3])


def _write_subblocks(payload: bytes) -> bytes:
    out = bytearray()
    for i in range(0, len(payload), 255):
        chunk = payload[i : i + 255]
        out.append(len(chunk))
        out += chunk
    out.append(0)
    return bytes(out)


def encode_gif(
    frames: np.ndarray,
    delay_cs: int = 4,
    interlace: bool = False,
    loop: bool = True,
) -> bytes:
    """uint8 (h, w, 3) or (n, h, w, 3) -> GIF89a bytes with one global
    color table. Lossless iff the input uses <=256 unique colors (the
    fixture contract); multi-frame inputs get per-frame graphic-control
    blocks (disposal=keep) and a NETSCAPE loop extension."""
    arr = np.asarray(frames, dtype=np.uint8)
    if arr.ndim == 3:
        arr = arr[None]
    if arr.ndim != 4 or arr.shape[3] != 3:
        raise ValueError("expected (h, w, 3) or (n, h, w, 3) uint8")
    n_frames, h, w, _ = arr.shape
    pal, idx = _palette_and_indices(arr)
    bits = max(1, int(len(pal) - 1).bit_length())
    table_n = 1 << bits
    padded = np.zeros((table_n, 3), dtype=np.uint8)
    padded[: len(pal)] = pal
    mcs = max(2, bits)

    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", w, h, 0x80 | ((bits - 1) & 0x07), 0, 0)
    out += padded.tobytes()
    if n_frames > 1 and loop:
        out += b"\x21\xff\x0bNETSCAPE2.0" + _write_subblocks(b"\x01\x00\x00")
    for f in range(n_frames):
        if n_frames > 1:
            out += b"\x21\xf9" + _write_subblocks(
                struct.pack("<BHB", 0x04, delay_cs, 0)  # disposal=keep
            )
        out += struct.pack("<BHHHHB", 0x2C, 0, 0, w, h, 0x40 if interlace else 0)
        rows = idx[f]
        if interlace:
            order = [
                y for start, step in _INTERLACE_PASSES for y in range(start, h, step)
            ]
            rows = rows[order]
        out.append(mcs)
        out += _write_subblocks(_lzw_encode(mcs, rows.tobytes()))
    out.append(0x3B)
    return bytes(out)
