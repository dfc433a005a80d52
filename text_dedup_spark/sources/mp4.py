"""Minimal MP4 / ISO-BMFF (ISO 14496-12) container support.

Real-world multimodal corpora are dominated by MP4; until this module the
closed flag policy fired at the CONTAINER level, so even the track layout
of an .mp4 was invisible. This walks the box tree (``ftyp``/``moov``/
``trak``/``mdia``/``stbl``), builds a per-track table (handler, codec
fourcc, dimensions / channels+rate, sample count, duration), resolves
per-sample byte ranges through ``stsc``/``stsz``/``stco|co64``, and
decodes the codecs this environment can do natively:

- video: MJPEG (sample entry ``jpeg``: each sample is a baseline JPEG,
  decoded by the in-repo ``sources/jpeg.py``) and uncompressed ``raw ``
  24-bit RGB;
- audio: PCM — ``sowt`` (s16le), ``twos`` (s16be), ``raw `` (u8
  offset-binary), ``lpcm`` (s16le), downmixed to int16 mono exactly like
  ``decode_wav``.

H.26x / VP9 / AV1 / AAC sample entries raise ``NotImplementedError`` and
corrupt structure raises ``ValueError`` — the closed error contract
(`functions/media_udf.py` routes both to flagged rows, never a dead
task). ``probe_duration`` still surfaces real container metadata
(track table + mdhd duration) for streams whose CODEC is flagged.

A writer for the same subset (``encode_mp4``) exists for fixtures and
round-trip tests: ``ftyp`` + ``mdat`` + ``moov`` with one MJPEG video
and/or one PCM audio track, one chunk per track, spec-layout sample
tables. Reference anchor: the reference repo (text dedup scripts) has no
media surface; this extends the beyond-parity multimodal tier
(SURVEY §2 F14 neighborhood).
"""

from __future__ import annotations

import struct

import numpy as np

# codecs the native path decodes; everything else in these handler types
# is a flagged NotImplementedError
_VIDEO_NATIVE = {b"jpeg", b"raw "}
_AUDIO_NATIVE = {b"sowt", b"twos", b"raw ", b"lpcm"}
_KNOWN_FLAGGED = {
    b"avc1", b"avc3", b"hvc1", b"hev1", b"vp09", b"av01", b"mp4v",
    b"mp4a", b"Opus", b"ac-3", b"ec-3", b"alac", b"samr",
}


def is_mp4(data: bytes) -> bool:
    """Magic sniff: every ISO-BMFF file leads with an ``ftyp`` box."""
    return len(data) >= 12 and data[4:8] == b"ftyp"


def _be32(data: bytes, pos: int) -> int:
    if pos + 4 > len(data):
        raise ValueError("MP4 truncated")
    return struct.unpack(">I", data[pos : pos + 4])[0]


def _boxes(data: bytes, pos: int, end: int):
    """Yield ``(fourcc, payload_start, payload_end)`` for one box level."""
    while pos + 8 <= end:
        size = _be32(data, pos)
        fourcc = data[pos + 4 : pos + 8]
        hdr = 8
        if size == 1:  # 64-bit largesize
            if pos + 16 > end:
                raise ValueError("MP4 truncated largesize")
            size = struct.unpack(">Q", data[pos + 8 : pos + 16])[0]
            hdr = 16
        elif size == 0:  # extends to end of enclosing scope
            size = end - pos
        if size < hdr or pos + size > end:
            raise ValueError(f"MP4 box {fourcc!r} overruns its parent")
        yield fourcc, pos + hdr, pos + size
        pos += size
    if pos != end:
        raise ValueError("MP4 trailing partial box header")


def _child(data: bytes, pos: int, end: int, fourcc: bytes):
    for t, s, e in _boxes(data, pos, end):
        if t == fourcc:
            return s, e
    raise ValueError(f"MP4 missing {fourcc!r} box")


def _fullbox(data: bytes, pos: int) -> tuple[int, int]:
    """FullBox header -> (version, body_start)."""
    if pos + 4 > len(data):
        raise ValueError("MP4 truncated fullbox")
    return data[pos], pos + 4


def _mdhd(data: bytes, s: int, e: int) -> tuple[int, int]:
    ver, p = _fullbox(data, s)
    if ver == 1:
        timescale = _be32(data, p + 16)
        duration = struct.unpack(">Q", data[p + 20 : p + 28])[0]
    else:
        timescale = _be32(data, p + 8)
        duration = _be32(data, p + 12)
    if timescale == 0:
        raise ValueError("MP4 zero mdhd timescale")
    return timescale, duration


def _stsd_entry(data: bytes, s: int, e: int, handler: str) -> dict:
    """First sample entry of the stsd box -> codec + format fields."""
    _ver, p = _fullbox(data, s)
    if _be32(data, p) < 1:
        raise ValueError("MP4 empty stsd")
    entries = list(_boxes(data, p + 4, e))
    if not entries:
        raise ValueError("MP4 stsd with no sample entry")
    codec, es, ee = entries[0]
    out = {"codec": codec.decode("latin1")}
    if handler == "vide" and ee - es >= 70:
        # VisualSampleEntry: 6 reserved + dref(2) + 16 pre/reserved, then
        # width(2) height(2) ... depth at +74 from entry start
        out["width"] = struct.unpack(">H", data[es + 24 : es + 26])[0]
        out["height"] = struct.unpack(">H", data[es + 26 : es + 28])[0]
        out["depth"] = struct.unpack(">H", data[es + 74 : es + 76])[0] \
            if ee - es >= 76 else 24
    elif handler == "soun" and ee - es >= 28:
        # AudioSampleEntry: 6 reserved + dref(2) + 8 reserved, then
        # channelcount(2) samplesize(2) pre(2) reserved(2) rate(16.16)
        out["channels"] = struct.unpack(">H", data[es + 16 : es + 18])[0]
        out["sample_bits"] = struct.unpack(">H", data[es + 18 : es + 20])[0]
        out["sample_rate"] = _be32(data, es + 24) >> 16
    return out


def _stbl_tables(data: bytes, s: int, e: int) -> dict:
    """stts/stsc/stsz/stco|co64 -> sample bookkeeping."""
    out: dict = {}
    for t, bs, be in _boxes(data, s, e):
        if t == b"stts":
            _v, p = _fullbox(data, bs)
            n = _be32(data, p)
            out["stts"] = [
                (_be32(data, p + 4 + 8 * i), _be32(data, p + 8 + 8 * i))
                for i in range(n)
            ]
        elif t == b"stsc":
            _v, p = _fullbox(data, bs)
            n = _be32(data, p)
            out["stsc"] = [
                (_be32(data, p + 4 + 12 * i), _be32(data, p + 8 + 12 * i))
                for i in range(n)  # (first_chunk, samples_per_chunk)
            ]
        elif t == b"stsz":
            _v, p = _fullbox(data, bs)
            uniform = _be32(data, p)
            count = _be32(data, p + 4)
            out["sample_sizes"] = (
                [uniform] * count if uniform
                else [_be32(data, p + 8 + 4 * i) for i in range(count)]
            )
        elif t in (b"stco", b"co64"):
            _v, p = _fullbox(data, bs)
            n = _be32(data, p)
            out["chunk_offsets"] = [
                _be32(data, p + 4 + 4 * i) if t == b"stco"
                else struct.unpack(">Q", data[p + 4 + 8 * i : p + 12 + 8 * i])[0]
                for i in range(n)
            ]
    for need in ("stsc", "sample_sizes", "chunk_offsets"):
        if need not in out:
            raise ValueError(f"MP4 stbl missing {need} table")
    return out


def parse_mp4(data: bytes) -> dict:
    """Full container walk -> ``{brand, tracks: [...]}`` with per-track
    handler/codec/format/sample-table metadata. Raises ``ValueError`` on
    malformed structure (the flag policy's input)."""
    if not is_mp4(data):
        raise ValueError("not an ISO-BMFF stream (no ftyp)")
    brand = data[8:12].decode("latin1")
    tracks = []
    moov = None
    for t, s, e in _boxes(data, 0, len(data)):
        if t == b"moov":
            moov = (s, e)
    if moov is None:
        raise ValueError("MP4 missing moov box")
    for t, s, e in _boxes(data, *moov):
        if t != b"trak":
            continue
        mdia_s, mdia_e = _child(data, s, e, b"mdia")
        hdlr_s, hdlr_e = _child(data, mdia_s, mdia_e, b"hdlr")
        handler = data[hdlr_s + 8 : hdlr_s + 12].decode("latin1")
        timescale, duration = _mdhd(data, *_child(data, mdia_s, mdia_e, b"mdhd"))
        minf_s, minf_e = _child(data, mdia_s, mdia_e, b"minf")
        stbl_s, stbl_e = _child(data, minf_s, minf_e, b"stbl")
        track = {
            "handler": handler,
            "timescale": timescale,
            "duration_sec": duration / timescale,
            **_stsd_entry(data, *_child(data, stbl_s, stbl_e, b"stsd"), handler),
            **_stbl_tables(data, stbl_s, stbl_e),
        }
        track["n_samples"] = len(track["sample_sizes"])
        tracks.append(track)
    if not tracks:
        raise ValueError("MP4 with no tracks")
    return {"brand": brand, "tracks": tracks}


def mp4_track_table(data: bytes) -> list[dict]:
    """Metadata-only view: one dict per track without the sample tables —
    real container metadata even when the codec itself is flagged."""
    out = []
    for t in parse_mp4(data)["tracks"]:
        out.append({
            k: t.get(k)
            for k in ("handler", "codec", "width", "height", "channels",
                      "sample_rate", "n_samples", "duration_sec")
        })
    return out


def _sample_ranges(data: bytes, track: dict) -> list[tuple[int, int]]:
    """stsc/stsz/stco walk -> [(offset, size)] per sample, stream order."""
    sizes = track["sample_sizes"]
    stsc = track["stsc"]
    out = []
    si = 0
    for ci, off in enumerate(track["chunk_offsets"], start=1):
        spc = 0
        for first_chunk, n in stsc:
            if first_chunk <= ci:
                spc = n
        pos = off
        for _ in range(spc):
            if si >= len(sizes):
                break
            if pos + sizes[si] > len(data):
                raise ValueError("MP4 sample overruns file")
            out.append((pos, sizes[si]))
            pos += sizes[si]
            si += 1
    if si != len(sizes):
        raise ValueError("MP4 chunk map does not cover all samples")
    return out


def _first_track(meta: dict, handler: str) -> dict:
    for t in meta["tracks"]:
        if t["handler"] == handler:
            return t
    raise ValueError(f"MP4 has no {handler!r} track")


def decode_mp4_video(data: bytes) -> np.ndarray:
    """First video track -> uint8 ``(n, h, w)`` grayscale frames (MJPEG /
    raw RGB native; other codecs flagged)."""
    from .avi import _to_gray
    from .jpeg import decode_jpeg_baseline

    track = _first_track(parse_mp4(data), "vide")
    codec = track["codec"].encode("latin1")
    if codec not in _VIDEO_NATIVE:
        raise NotImplementedError(
            f"MP4 video codec {track['codec']!r} has no native decoder "
            "(MJPEG 'jpeg' and 'raw ' RGB decode natively)")
    frames = []
    for off, size in _sample_ranges(data, track):
        sample = data[off : off + size]
        if codec == b"jpeg":
            frames.append(_to_gray(decode_jpeg_baseline(sample)))
        else:  # 'raw ' interleaved RGB, depth 24
            w, h = track.get("width", 0), track.get("height", 0)
            if track.get("depth", 24) != 24 or size != w * h * 3:
                raise ValueError("MP4 raw video sample size/depth mismatch")
            frames.append(_to_gray(
                np.frombuffer(sample, np.uint8).reshape(h, w, 3)))
    if not frames:
        raise ValueError("MP4 video track with no samples")
    return np.stack(frames)


def decode_mp4_audio(data: bytes) -> tuple[np.ndarray, int]:
    """First sound track -> (int16 mono samples, rate); PCM variants
    native, compressed codecs flagged. Mono downmix matches decode_wav."""
    track = _first_track(parse_mp4(data), "soun")
    codec = track["codec"].encode("latin1")
    if codec not in _AUDIO_NATIVE:
        raise NotImplementedError(
            f"MP4 audio codec {track['codec']!r} has no native decoder "
            "(PCM sowt/twos/raw /lpcm decode natively)")
    payload = b"".join(
        data[o : o + s] for o, s in _sample_ranges(data, track))
    n_ch = max(1, track.get("channels", 1))
    if codec == b"raw ":  # 8-bit offset-binary
        x = (np.frombuffer(payload, np.uint8).astype(np.float64) - 128.0) * 256.0
    else:
        dt = ">i2" if codec == b"twos" else "<i2"
        x = np.frombuffer(
            payload[: len(payload) - len(payload) % 2], dt).astype(np.float64)
    x = x[: len(x) - len(x) % n_ch]
    if n_ch > 1:
        x = x.reshape(-1, n_ch).mean(axis=1)
    rate = track.get("sample_rate") or 0
    if rate <= 0:
        raise ValueError("MP4 audio track with no sample rate")
    return np.clip(np.rint(x), -32768, 32767).astype(np.int16), rate


def probe_duration(data: bytes) -> tuple[int, int]:
    """Container-level ``(sample_rate, n_samples)`` estimate for the first
    sound track WITHOUT touching the codec payload — real metadata for
    rows whose codec is flagged (mdhd duration is in media timescale
    units, which for audio tracks is the sample rate by convention)."""
    track = _first_track(parse_mp4(data), "soun")
    rate = track.get("sample_rate") or track["timescale"]
    return int(rate), int(round(track["duration_sec"] * rate))


# --- fixture writer ---------------------------------------------------------


def _box(fourcc: bytes, payload: bytes) -> bytes:
    return struct.pack(">I", 8 + len(payload)) + fourcc + payload


def _full(fourcc: bytes, version: int, payload: bytes) -> bytes:
    return _box(fourcc, bytes([version, 0, 0, 0]) + payload)


def _visual_entry(codec: bytes, w: int, h: int) -> bytes:
    body = (
        b"\x00" * 6 + struct.pack(">H", 1)          # SampleEntry: dref 1
        + b"\x00" * 16
        + struct.pack(">HH", w, h)
        + struct.pack(">II", 0x00480000, 0x00480000)  # 72 dpi
        + b"\x00" * 4
        + struct.pack(">H", 1)                      # frame_count
        + b"\x00" * 32                              # compressorname
        + struct.pack(">Hh", 24, -1)                # depth, pre_defined
    )
    return _box(codec, body)


def _audio_entry(codec: bytes, channels: int, rate: int) -> bytes:
    body = (
        b"\x00" * 6 + struct.pack(">H", 1)
        + b"\x00" * 8
        + struct.pack(">HHHH", channels, 16, 0, 0)
        + struct.pack(">I", rate << 16)
    )
    return _box(codec, body)


def _track(handler: bytes, entry: bytes, sizes: list[int], chunk_off: int,
           timescale: int, duration: int, media_header: bytes) -> bytes:
    stbl = (
        _full(b"stsd", 0, struct.pack(">I", 1) + entry)
        + _full(b"stts", 0, struct.pack(">III", 1, len(sizes), 1))
        + _full(b"stsc", 0, struct.pack(">IIII", 1, 1, len(sizes), 1))
        + _full(b"stsz", 0, (
            struct.pack(">II", sizes[0], len(sizes))
            if len(set(sizes)) == 1
            else struct.pack(">II", 0, len(sizes))
            + b"".join(struct.pack(">I", s) for s in sizes)))
        + _full(b"stco", 0, struct.pack(">II", 1, chunk_off))
    )
    dinf = _box(b"dinf", _full(b"dref", 0, struct.pack(">I", 1)
                               + _full(b"url ", 1, b"")))
    minf = _box(b"minf", media_header + dinf + _box(b"stbl", stbl))
    hdlr = _full(b"hdlr", 0, b"\x00" * 4 + handler + b"\x00" * 12 + b"\x00")
    mdhd = _full(b"mdhd", 0, struct.pack(">IIIIHH", 0, 0, timescale,
                                         duration, 0x55C4, 0))
    mdia = _box(b"mdia", mdhd + hdlr + minf)
    tkhd = _full(b"tkhd", 0, struct.pack(">III", 0, 0, 1) + b"\x00" * 72)
    return _box(b"trak", tkhd + mdia)


def encode_mp4(
    frames: list[np.ndarray] | None = None,
    samples: np.ndarray | None = None,
    rate: int = 16000,
    fps: int = 10,
    video_codec: bytes = b"jpeg",
    audio_codec: bytes = b"sowt",
    quant_scale: int = 2,
) -> bytes:
    """Fixture writer: ``ftyp`` + ``mdat`` + ``moov`` with an MJPEG (or
    raw RGB) video track and/or a PCM audio track, one chunk per track.
    ``video_codec``/``audio_codec`` may name a FLAGGED codec (e.g.
    ``b'avc1'``/``b'mp4a'``) to build closed-contract fixtures — the
    payload is then the frames' raw bytes, never meant to decode."""
    from .jpeg import encode_jpeg_baseline

    if frames is None and samples is None:
        raise ValueError("encode_mp4 wants frames and/or samples")
    mdat = bytearray()
    chunks = []  # (handler, entry, sizes, intra_mdat_offset, timescale, dur)
    if frames is not None:
        if video_codec == b"jpeg":
            blobs = [encode_jpeg_baseline(f, quant_scale=quant_scale)
                     for f in frames]
        elif video_codec == b"raw ":
            blobs = [np.ascontiguousarray(f).tobytes() for f in frames]
        else:  # flagged-codec fixture: opaque payload
            blobs = [np.ascontiguousarray(f).tobytes() for f in frames]
        h, w = frames[0].shape[:2]
        off = len(mdat)
        for b in blobs:
            mdat += b
        chunks.append((b"vide", _visual_entry(video_codec, w, h),
                       [len(b) for b in blobs], off, fps, len(blobs),
                       _full(b"vmhd", 0, b"\x00" * 8)))
    if samples is not None:
        pcm = np.asarray(samples, dtype=np.int16)
        raw = (pcm.astype(">i2") if audio_codec == b"twos"
               else pcm.astype("<i2")).tobytes()
        if audio_codec not in _AUDIO_NATIVE:  # flagged-codec fixture
            raw = pcm.astype("<i2").tobytes()
        off = len(mdat)
        mdat += raw
        chunks.append((b"soun", _audio_entry(audio_codec, 1, rate),
                       [2] * len(pcm), off, rate, len(pcm),
                       _full(b"smhd", 0, b"\x00" * 4)))
    ftyp = _box(b"ftyp", b"isom" + struct.pack(">I", 512) + b"isomiso2")
    mdat_box_off = len(ftyp)
    traks = b"".join(
        _track(handler, entry, sizes, mdat_box_off + 8 + off, ts, dur, mh)
        for handler, entry, sizes, off, ts, dur, mh in chunks
    )
    mvhd = _full(b"mvhd", 0, struct.pack(">IIII", 0, 0, 1000, 0)
                 + b"\x00" * 80 + struct.pack(">I", len(chunks) + 1))
    moov = _box(b"moov", mvhd + traks)
    return ftyp + _box(b"mdat", bytes(mdat)) + moov
