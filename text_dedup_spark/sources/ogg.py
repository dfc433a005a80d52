"""Minimal Ogg container (RFC 3533) + Vorbis/Opus header metadata.

The audio twin of ``sources/mp4.py``: real-world compressed audio ships
as Ogg Vorbis / Ogg Opus, whose CODEC payloads this environment cannot
decode natively — but the CONTAINER carries everything a corpus pipeline
needs for metadata columns: codec id, channels, sample rate, tags
(artist/title/...), and a duration derivable from the final granule
position. This module walks pages (capture pattern, lacing-table packet
assembly across pages, CRC-verified), parses Vorbis identification/
comment headers (`\\x01vorbis` / `\\x03vorbis`) and Opus ``OpusHead`` /
``OpusTags``, and surfaces ``ogg_meta`` + ``probe_ogg_audio`` for the
flag-policy path in ``functions/media_udf.py`` — a flagged .ogg/.opus
row still gets real sample_rate/duration columns.

Corrupt structure (bad capture pattern, CRC mismatch, truncated lacing)
raises ``ValueError``; the codec payload itself raises
``NotImplementedError`` — the closed error contract. A writer for the
same subset exists for fixtures (correct CRCs, continuation lacing).
Reference anchor: none (the reference has no media surface); this is the
beyond-parity multimodal tier.
"""

from __future__ import annotations

import struct

# RFC 3533 CRC: poly 0x04c11db7, no reflection, init/xorout 0
_CRC_TABLE = []
for _i in range(256):
    _r = _i << 24
    for _ in range(8):
        _r = ((_r << 1) ^ 0x04C11DB7 if _r & 0x80000000 else _r << 1) & 0xFFFFFFFF
    _CRC_TABLE.append(_r)


def _crc(data: bytes) -> int:
    r = 0
    for b in data:
        r = ((r << 8) & 0xFFFFFFFF) ^ _CRC_TABLE[(r >> 24) ^ b]
    return r


def is_ogg(data: bytes) -> bool:
    return data[:4] == b"OggS"


def parse_pages(data: bytes):
    """Yield ``(header_type, granule, serial, seqno, segments)`` per page
    (``segments`` = list of lacing-run byte strings, 255-runs unmerged);
    CRC-verified, ValueError on any structural damage."""
    pos = 0
    while pos < len(data):
        if data[pos : pos + 4] != b"OggS":
            raise ValueError("Ogg capture pattern missing")
        if pos + 27 > len(data):
            raise ValueError("Ogg page header truncated")
        version, htype = data[pos + 4], data[pos + 5]
        if version != 0:
            raise ValueError(f"unknown Ogg version {version}")
        granule, serial, seqno, crc = struct.unpack(
            "<qIII", data[pos + 6 : pos + 26])
        nsegs = data[pos + 26]
        lace_end = pos + 27 + nsegs
        if lace_end > len(data):
            raise ValueError("Ogg lacing table truncated")
        lacing = data[pos + 27 : lace_end]
        body_len = sum(lacing)
        if lace_end + body_len > len(data):
            raise ValueError("Ogg page body truncated")
        page = bytearray(data[pos : lace_end + body_len])
        page[22:26] = b"\x00" * 4
        if _crc(bytes(page)) != crc:
            raise ValueError("Ogg page CRC mismatch")
        segs, sp = [], lace_end
        for ln in lacing:
            segs.append(data[sp : sp + ln])
            sp += ln
        yield htype, granule, serial, seqno, segs
        pos = lace_end + body_len


def parse_packets(data: bytes):
    """Assemble lacing runs into logical packets per serial ->
    ``{serial: (packets, last_granule)}`` (packets in stream order; a
    packet ends at any lacing value < 255, continuation pages splice)."""
    streams: dict[int, dict] = {}
    for htype, granule, serial, _seq, segs in parse_pages(data):
        st = streams.setdefault(
            serial, {"packets": [], "partial": b"", "granule": -1})
        if granule >= 0:
            st["granule"] = max(st["granule"], granule)
        if not (htype & 0x01):  # not a continuation: any partial is damage
            if st["partial"]:
                raise ValueError("Ogg packet spans pages without continuation")
        for ln_seg in segs:
            st["partial"] += ln_seg
            if len(ln_seg) < 255:
                st["packets"].append(st["partial"])
                st["partial"] = b""
    return {
        s: (st["packets"], st["granule"]) for s, st in streams.items()
    }


def _comments(body: bytes) -> dict:
    """Vorbis-comment block (shared by Vorbis and OpusTags): vendor string
    + KEY=value list -> dict (keys uppercased per spec case-insensitivity;
    later duplicates win)."""
    (vlen,) = struct.unpack("<I", body[:4])
    pos = 4 + vlen
    vendor = body[4 : pos].decode("utf-8", "replace")
    (n,) = struct.unpack("<I", body[pos : pos + 4])
    pos += 4
    out = {"VENDOR": vendor}
    for _ in range(n):
        (ln,) = struct.unpack("<I", body[pos : pos + 4])
        pos += 4
        item = body[pos : pos + ln].decode("utf-8", "replace")
        pos += ln
        if "=" in item:
            k, v = item.split("=", 1)
            out[k.upper()] = v
    return out


def ogg_meta(data: bytes) -> dict:
    """Container + header metadata for the FIRST audio stream:
    ``{codec, channels, sample_rate, duration_sec, comments, n_streams}``.
    Vorbis granules count PCM samples at the stream rate; Opus granules
    are 48 kHz ticks minus the pre-skip (RFC 7845 §4)."""
    streams = parse_packets(data)
    if not streams:
        raise ValueError("Ogg with no pages")
    for serial, (packets, granule) in streams.items():
        if not packets:
            continue
        first = packets[0]
        if first[:7] == b"\x01vorbis":
            channels = first[11]
            (rate,) = struct.unpack("<I", first[12:16])
            if rate == 0:
                raise ValueError("Vorbis header with zero rate")
            comments = (
                _comments(packets[1][7:])
                if len(packets) > 1 and packets[1][:7] == b"\x03vorbis"
                else {}
            )
            return {
                "codec": "vorbis", "channels": channels, "sample_rate": rate,
                "duration_sec": max(granule, 0) / rate,
                "comments": comments, "n_streams": len(streams),
            }
        if first[:8] == b"OpusHead":
            channels = first[9]
            (preskip,) = struct.unpack("<H", first[10:12])
            (in_rate,) = struct.unpack("<I", first[12:16])
            comments = (
                _comments(packets[1][8:])
                if len(packets) > 1 and packets[1][:8] == b"OpusTags"
                else {}
            )
            return {
                "codec": "opus", "channels": channels,
                # OpusHead carries the ORIGINAL input rate; decode is 48k
                "sample_rate": in_rate or 48000,
                "duration_sec": max(max(granule, 0) - preskip, 0) / 48000.0,
                "comments": comments, "n_streams": len(streams),
            }
    raise ValueError("Ogg with no recognizable Vorbis/Opus stream")


def probe_ogg_audio(data: bytes) -> tuple[int, int]:
    """(sample_rate, n_samples) from container metadata only — the
    flag-policy probe for rows whose codec cannot decode here."""
    meta = ogg_meta(data)
    rate = int(meta["sample_rate"])
    return rate, int(round(meta["duration_sec"] * rate))


# --- fixture writer ---------------------------------------------------------


def write_ogg(packets: list[bytes], serial: int = 1,
              granules: list[int] | None = None,
              max_segs_per_page: int = 255) -> bytes:
    """Page the given logical packets (one stream): lacing runs of 255
    with a closing short run, continuation pages when a packet overflows
    the per-page segment budget, correct CRCs. First page gets BOS, last
    gets EOS (RFC 3533 layout the parser round-trips)."""
    # split packets into lacing runs, then chunk runs into pages
    runs: list[tuple[int, bytes, int]] = []  # (lace value, bytes, pkt idx)
    for pi, pkt in enumerate(packets):
        off = 0
        while True:
            chunk = pkt[off : off + 255]
            off += 255
            runs.append((len(chunk), chunk, pi))
            if len(chunk) < 255:
                break
    pages = []
    pos = 0
    seq = 0
    while pos < len(runs):
        batch = runs[pos : pos + max_segs_per_page]
        pos += len(batch)
        cont = pos - len(batch) > 0 and runs[pos - len(batch) - 1][0] == 255
        htype = (0x01 if cont else 0) | (0x02 if seq == 0 else 0) | (
            0x04 if pos >= len(runs) else 0)
        last_pkt = batch[-1][2]
        ends_packet = batch[-1][0] < 255
        granule = (
            granules[last_pkt] if granules and ends_packet
            else (len(packets) if pos >= len(runs) else -1)
        )
        lacing = bytes(r[0] for r in batch)
        body = b"".join(r[1] for r in batch)
        hdr = (b"OggS" + bytes([0, htype])
               + struct.pack("<qIII", granule, serial, seq, 0)
               + bytes([len(batch)]) + lacing)
        crc = _crc(hdr + body)
        hdr = hdr[:22] + struct.pack("<I", crc) + hdr[26:]
        pages.append(hdr + body)
        seq += 1
    return b"".join(pages)


def make_opus_fixture(duration_samples_48k: int = 9600,
                      tags: dict | None = None) -> bytes:
    """A structurally valid Ogg Opus stream (real OpusHead/OpusTags, dummy
    codec payload packets) for flag-policy tests."""
    head = (b"OpusHead" + bytes([1, 1]) + struct.pack("<H", 312)
            + struct.pack("<I", 48000) + struct.pack("<hB", 0, 0))
    tag_items = [f"{k}={v}".encode() for k, v in (tags or {}).items()]
    tags_pkt = (b"OpusTags" + struct.pack("<I", 4) + b"eng!"
                + struct.pack("<I", len(tag_items))
                + b"".join(struct.pack("<I", len(t)) + t for t in tag_items))
    audio = [b"\xfc\xff\xfe" + bytes(60)] * 3  # opaque codec payload
    return write_ogg(
        [head, tags_pkt, *audio],
        granules=[0, 0, 3200, 6400, 312 + duration_samples_48k])


def make_vorbis_fixture(rate: int = 44100, n_samples: int = 44100,
                        tags: dict | None = None) -> bytes:
    """A structurally valid Ogg Vorbis stream (real identification +
    comment headers, dummy codec payload) for flag-policy tests."""
    ident = (b"\x01vorbis" + struct.pack("<I", 0) + bytes([2])
             + struct.pack("<Iiii", rate, 0, 128000, 0) + bytes([0xB8, 1]))
    tag_items = [f"{k}={v}".encode() for k, v in (tags or {}).items()]
    comment = (b"\x03vorbis" + struct.pack("<I", 6) + b"vendor"
               + struct.pack("<I", len(tag_items))
               + b"".join(struct.pack("<I", len(t)) + t for t in tag_items)
               + b"\x01")
    setup = b"\x05vorbis" + bytes(40)
    audio = [bytes([0x20 + i]) * 50 for i in range(3)]
    return write_ogg(
        [ident, comment, setup, *audio],
        granules=[0, 0, 0, n_samples // 3, 2 * n_samples // 3, n_samples])
