"""JPEG metadata handling: lossless strip + minimal EXIF parse.

The image-side twin of the text PII pass (`operators/pii.py`): camera
EXIF carries GPS coordinates, timestamps, and serial-number-bearing
Make/Model strings — exactly what a published training set must not leak.
JPEG metadata lives in standalone APPn/COM segments, so stripping is a
BYTE SPLICE: entropy-coded data is untouched and the decoded pixels are
bit-identical (tested), unlike a decode+re-encode scrub which costs a
generation loss.

- ``iter_jpeg_segments``: marker walk up to SOS (after SOS the entropy
  stream runs to EOI and is copied verbatim).
- ``strip_jpeg_metadata``: drop APP1..APP13/APP15 + COM; APP0 (JFIF) and
  APP14 (Adobe color transform — required to decode CMYK/YCCK correctly)
  are kept by default.
- ``parse_exif``: APP1 'Exif\\0\\0' -> TIFF IFD0 walk (both endiannesses,
  offsets bounds-checked): orientation, Make/Model/DateTime, GPS-IFD
  presence. Parse only — no external library, no network.
- ``build_exif_app1``: spec-shaped fixture writer (tests/synth).
"""

from __future__ import annotations

import struct
from typing import Iterator

# markers with no length field
_BARE = frozenset({0xD8, 0xD9, 0x01} | set(range(0xD0, 0xD8)))
_DEFAULT_KEEP = frozenset({0xE0, 0xEE})  # APP0 JFIF, APP14 Adobe
_STRIPPABLE = frozenset(set(range(0xE1, 0xF0)) | {0xFE})  # APP1..15, COM


def iter_jpeg_segments(data: bytes) -> Iterator[tuple[int, int, int]]:
    """Yield (marker, start_offset, total_len) for each segment from SOI
    up to and including SOS; the entropy stream after SOS is not walked
    (strip copies it verbatim). Raises ValueError on a malformed
    container — same error contract as the codecs."""
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    yield 0xD8, 0, 2
    pos = 2
    n = len(data)
    while pos + 1 < n:
        if data[pos] != 0xFF:
            raise ValueError(f"expected marker at offset {pos}")
        marker = data[pos + 1]
        if marker in _BARE:
            yield marker, pos, 2
            pos += 2
            continue
        if pos + 4 > n:
            raise ValueError("truncated segment header")
        seglen = struct.unpack(">H", data[pos + 2 : pos + 4])[0]
        total = 2 + seglen
        if pos + total > n:
            raise ValueError("truncated segment payload")
        yield marker, pos, total
        pos += total
        if marker == 0xDA:  # SOS: entropy data follows
            return


def strip_jpeg_metadata(data: bytes, keep: frozenset = _DEFAULT_KEEP) -> bytes:
    """JPEG bytes with APPn/COM metadata segments removed — decoded pixels
    are bit-identical to the input (pure byte splice)."""
    out = []
    last = 0
    for marker, start, total in iter_jpeg_segments(data):
        if marker in _STRIPPABLE and marker not in keep:
            out.append(data[last:start])
            last = start + total
        if marker == 0xDA:
            break
    out.append(data[last:])
    return b"".join(out)


_ASCII, _SHORT, _LONG = 2, 3, 4
_TAG_MAKE, _TAG_MODEL, _TAG_ORIENT, _TAG_DATETIME, _TAG_GPS = (
    0x010F,
    0x0110,
    0x0112,
    0x0132,
    0x8825,
)


def _read_ifd(tiff: bytes, off: int, end: str) -> dict[int, tuple[int, int, bytes]]:
    """IFD at ``off`` -> {tag: (type, count, raw_value_field)} with bounds
    checks; raw inline value field is always the 4-byte slot."""
    if off + 2 > len(tiff):
        raise ValueError("EXIF IFD offset out of bounds")
    (count,) = struct.unpack(end + "H", tiff[off : off + 2])
    entries = {}
    p = off + 2
    if p + 12 * count > len(tiff):
        raise ValueError("EXIF IFD truncated")
    for _ in range(count):
        tag, typ, cnt = struct.unpack(end + "HHI", tiff[p : p + 8])
        entries[tag] = (typ, cnt, tiff[p + 8 : p + 12])
        p += 12
    return entries


def _entry_value(tiff: bytes, typ: int, cnt: int, raw: bytes, end: str):
    size = {1: 1, 2: 1, 3: 2, 4: 4}.get(typ)
    if size is None:
        return None
    nbytes = size * cnt
    if nbytes <= 4:
        buf = raw[:nbytes]
    else:
        (off,) = struct.unpack(end + "I", raw)
        if off + nbytes > len(tiff):
            raise ValueError("EXIF value offset out of bounds")
        buf = tiff[off : off + nbytes]
    if typ == _ASCII:
        return buf.split(b"\x00", 1)[0].decode("ascii", "replace")
    fmt = {1: "B", 3: "H", 4: "I"}[typ]
    vals = struct.unpack(end + fmt * cnt, buf)
    return vals[0] if cnt == 1 else vals


def parse_exif(data: bytes) -> dict:
    """JPEG bytes -> {'has_exif', 'has_gps', 'orientation', 'make',
    'model', 'datetime'}. Absent EXIF -> has_exif False and neutral
    values; malformed EXIF raises ValueError (loud, like the codecs)."""
    out = {
        "has_exif": False,
        "has_gps": False,
        "orientation": 0,
        "make": None,
        "model": None,
        "datetime": None,
    }
    for marker, start, total in iter_jpeg_segments(data):
        if marker != 0xE1:
            continue
        payload = data[start + 4 : start + total]
        if not payload.startswith(b"Exif\x00\x00"):
            continue  # XMP also uses APP1
        tiff = payload[6:]
        if tiff[:2] == b"II":
            end = "<"
        elif tiff[:2] == b"MM":
            end = ">"
        else:
            raise ValueError("EXIF TIFF header missing byte order")
        (magic, ifd0) = struct.unpack(end + "HI", tiff[2:8])
        if magic != 42:
            raise ValueError("EXIF TIFF magic != 42")
        entries = _read_ifd(tiff, ifd0, end)
        out["has_exif"] = True
        out["has_gps"] = _TAG_GPS in entries
        for key, tag in (
            ("make", _TAG_MAKE),
            ("model", _TAG_MODEL),
            ("datetime", _TAG_DATETIME),
        ):
            if tag in entries:
                out[key] = _entry_value(tiff, *entries[tag], end)
        if _TAG_ORIENT in entries:
            out["orientation"] = int(_entry_value(tiff, *entries[_TAG_ORIENT], end))
        return out
    return out


# --- fixture writer ----------------------------------------------------------


def build_exif_app1(
    orientation: int = 1,
    gps: bool = False,
    make: str = "synthcam",
    datetime: str = "2024:01:01 00:00:00",
) -> bytes:
    """Spec-shaped APP1 EXIF segment (little-endian TIFF) for fixtures."""
    make_b = make.encode("ascii") + b"\x00"
    dt_b = datetime.encode("ascii") + b"\x00"
    entries = []
    n = 4 + (1 if gps else 0)
    data_off = 8 + 2 + 12 * n + 4  # header + count + entries + next-IFD
    extra = b""

    def add(tag, typ, cnt, raw4):
        entries.append((tag, struct.pack("<HHI", tag, typ, cnt) + raw4))

    add(_TAG_MAKE, _ASCII, len(make_b), struct.pack("<I", data_off))
    extra += make_b
    add(_TAG_ORIENT, _SHORT, 1, struct.pack("<HH", orientation, 0))
    add(_TAG_DATETIME, _ASCII, len(dt_b), struct.pack("<I", data_off + len(make_b)))
    extra += dt_b
    gps_ifd_off = data_off + len(extra)
    if gps:
        add(_TAG_GPS, _LONG, 1, struct.pack("<I", gps_ifd_off))
        # minimal GPS IFD: GPSVersionID = 2.3.0.0
        extra += struct.pack("<H", 1)
        extra += struct.pack("<HHI", 0x0000, 1, 4) + bytes([2, 3, 0, 0])
        extra += struct.pack("<I", 0)
    add(0x011A, _LONG, 1, struct.pack("<I", 72))  # XResolution stand-in (pad)
    tiff = (
        b"II" + struct.pack("<HI", 42, 8)
        + struct.pack("<H", n)
        + b"".join(e for _, e in sorted(entries))  # spec: ascending tag order
        + struct.pack("<I", 0)
        + extra
    )
    payload = b"Exif\x00\x00" + tiff
    return b"\xff\xe1" + struct.pack(">H", len(payload) + 2) + payload


def insert_app1(jpeg: bytes, app1: bytes) -> bytes:
    """Splice an APP1 segment right after SOI (fixture helper)."""
    if jpeg[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG")
    return jpeg[:2] + app1 + jpeg[2:]


def strip_webp_metadata(data: bytes) -> bytes:
    """Lossless WebP privacy scrub: drop EXIF/XMP/ICCP chunks (the carriers
    of GPS/device/author metadata), clear their VP8X flag bits, keep every
    pixel chunk byte-identical (VP8/VP8L/ALPH/ANIM/ANMF untouched — no
    re-encode generation loss), and rewrite the RIFF size."""
    if data[:4] != b"RIFF" or data[8:12] != b"WEBP":
        raise ValueError("not a WebP")
    out = bytearray()
    pos = 12
    while pos + 8 <= len(data):
        tag = data[pos : pos + 4]
        ln = int.from_bytes(data[pos + 4 : pos + 8], "little")
        chunk = data[pos : pos + 8 + ln + (ln & 1)]
        if len(chunk) < 8 + ln:
            raise ValueError("truncated WebP chunk")
        pos += 8 + ln + (ln & 1)
        if tag in (b"EXIF", b"XMP ", b"ICCP"):
            continue
        if tag == b"VP8X" and ln >= 10:
            payload = bytearray(chunk[8:])
            payload[0] &= ~(0x20 | 0x08 | 0x04)  # clear ICC/EXIF/XMP flags
            chunk = bytes(chunk[:8]) + bytes(payload)
        out += chunk
    return b"RIFF" + struct.pack("<I", 4 + len(out)) + b"WEBP" + bytes(out)
