"""Multimodal (audio/video) column plumbing.

The engine treats non-image media exactly like images (BASELINE.json
input_hint pattern): an opaque ``binary`` payload column + typed metadata
columns, processed by Arrow-batched pandas UDFs over ``mapInPandas``. The
image path (functions/image_udf.py) is fully real (pure-numpy PNG codec),
and the most common ARCHIVAL formats of the other two modalities decode
natively as well: RIFF/WAVE PCM audio (``decode_wav``, below), FLAC
compressed audio (sources/flac.py, pure Python with the stream's own MD5
as an intrinsic oracle), RIFF/AVI video with uncompressed-DIB or MJPEG
frames (sources/avi.py), animated GIF as a frame sequence
(sources/gif.py), and IVF-contained VP8 video INCLUDING interframes
(sources/vp8p.py: P-frame chains with motion compensation and
last/golden/altref reference buffers — round 4). Only *lossy* audio
(mp3/ogg) and the remaining inter-frame video codecs (H.26x, VP9) are
environment-gated:

- ``decode_audio`` / ``decode_video_frames`` raise ``NotImplementedError``
  for those unless a real backend (soundfile / av) is importable — the
  clearly-marked stub the integration point expects;
- ``fake_pcm`` / ``fake_frames`` provide a deterministic stand-in container
  (header + raw samples) so the Spark-side plumbing — schemas, batching,
  partitioning, UDF signatures — is exercised end-to-end by real tests.

Fingerprinting reuses the engine's existing machinery: an audio clip or
video frame-sample reduces to a 64-bit perceptual fingerprint that feeds
the same SimHash Hamming bucketing used for phash
(operators/simhash_dedup.simhash_assignments_from_fingerprint).
"""

from __future__ import annotations

import struct
import zlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    IntegerType,
    LongType,
    StructField,
    StructType,
)

_FAKE_AUDIO_MAGIC = b"FPCM"
_FAKE_VIDEO_MAGIC = b"FVID"


# --- deterministic fake containers (tests / sandbox) ------------------------


def fake_pcm(samples: np.ndarray, rate: int = 16000) -> bytes:
    """int16 mono samples -> deterministic container bytes."""
    s = np.asarray(samples, dtype="<i2")
    return _FAKE_AUDIO_MAGIC + struct.pack("<II", rate, len(s)) + zlib.compress(s.tobytes(), 1)


def fake_frames(frames: np.ndarray) -> bytes:
    """uint8 (n, h, w) grayscale frames -> deterministic container bytes."""
    f = np.asarray(frames, dtype=np.uint8)
    n, h, w = f.shape
    return _FAKE_VIDEO_MAGIC + struct.pack("<III", n, h, w) + zlib.compress(f.tobytes(), 1)


# --- decode: real WAV (pure Python), fake containers, import-try stubs ------


def decode_wav(data: bytes) -> tuple[np.ndarray, int]:
    """Pure-Python RIFF/WAVE PCM parser (no external dep): bytes ->
    (int16 mono samples, sample_rate).

    Handles format 1 (integer PCM at 8/16/24/32 bit) and format 3 (float32/
    float64), any channel count (downmixed to mono by averaging), extra
    chunks before/after `data`, and WAVE_FORMAT_EXTENSIBLE (0xFFFE) wrapping
    either. Everything re-quantizes to int16 — the fingerprint input the
    rest of the engine uses."""
    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE stream")
    pos, end = 12, min(len(data), 8 + struct.unpack("<I", data[4:8])[0])
    fmt = None
    payload = None
    while pos + 8 <= end:
        cid = data[pos : pos + 4]
        (size,) = struct.unpack("<I", data[pos + 4 : pos + 8])
        body = data[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            tag, n_ch, rate, _br, _ba, bits = struct.unpack("<HHIIHH", body[:16])
            if tag == 0xFFFE and size >= 40:  # EXTENSIBLE: real tag in the GUID
                (tag,) = struct.unpack("<H", body[24:26])
            fmt = (tag, n_ch, rate, bits)
        elif cid == b"data":
            payload = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt is None or payload is None:
        raise ValueError("WAV missing fmt or data chunk")
    tag, n_ch, rate, bits = fmt
    if n_ch < 1:
        raise ValueError("WAV with zero channels")
    if tag == 1:  # integer PCM
        if bits == 8:  # unsigned, offset-128
            x = (np.frombuffer(payload, dtype=np.uint8).astype(np.float64) - 128.0) * 256.0
        elif bits == 16:
            x = np.frombuffer(payload, dtype="<i2").astype(np.float64)
        elif bits == 24:
            raw = np.frombuffer(payload, dtype=np.uint8)
            raw = raw[: len(raw) - len(raw) % 3].reshape(-1, 3).astype(np.uint32)
            u = raw[:, 0] | (raw[:, 1] << 8) | (raw[:, 2] << 16)
            x = (u.astype(np.int32) - ((u >> 23) & 1).astype(np.int32) * (1 << 24)).astype(
                np.float64
            ) / 256.0
        elif bits == 32:
            x = np.frombuffer(payload, dtype="<i4").astype(np.float64) / 65536.0
        else:
            raise ValueError(f"unsupported PCM bit depth {bits}")
    elif tag == 3:  # IEEE float, range [-1, 1]
        dt = "<f4" if bits == 32 else "<f8" if bits == 64 else None
        if dt is None:
            raise ValueError(f"unsupported float bit depth {bits}")
        x = np.frombuffer(payload, dtype=dt).astype(np.float64) * 32767.0
    else:
        raise ValueError(f"unsupported WAV format tag {tag} (PCM/float only)")
    x = x[: len(x) - len(x) % n_ch]
    if n_ch > 1:
        x = x.reshape(-1, n_ch).mean(axis=1)
    return np.clip(np.rint(x), -32768, 32767).astype(np.int16), rate


def encode_wav(samples: np.ndarray, rate: int = 16000, n_channels: int = 1) -> bytes:
    """int16 samples -> minimal PCM WAV bytes (fixture/round-trip helper).
    Multi-channel input is interleaved as given (len % n_channels == 0)."""
    s = np.asarray(samples, dtype="<i2").tobytes()
    ba = 2 * n_channels
    fmt = struct.pack("<HHIIHH", 1, n_channels, rate, rate * ba, ba, 16)
    chunks = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    chunks += b"data" + struct.pack("<I", len(s)) + s + (b"\x00" if len(s) & 1 else b"")
    return b"RIFF" + struct.pack("<I", len(chunks)) + chunks


def decode_audio(data: bytes) -> tuple[np.ndarray, int]:
    """bytes -> (int16 mono samples, sample_rate). Dispatch: real WAV and
    FLAC (both pure Python, always available), the deterministic FPCM test
    container, then the import-gated external backend for lossy formats.

    Error contract (same as sources/png.decode_image): ValueError for
    corrupt/truncated streams — low-level parse crashes normalized here —
    NotImplementedError for codecs this environment cannot decode."""
    try:
        if data[:4] == b"RIFF" and data[8:12] == b"WAVE":
            return decode_wav(data)
        if data[:4] == b"fLaC":  # compressed archival audio, pure Python
            from ..sources.flac import decode_flac

            return decode_flac(data)
        if data[:4] == _FAKE_AUDIO_MAGIC:
            rate, n = struct.unpack("<II", data[4:12])
            return np.frombuffer(zlib.decompress(data[12:]), dtype="<i2")[:n], rate
        if len(data) >= 12 and data[4:8] == b"ftyp":  # MP4/ISO-BMFF
            from ..sources.mp4 import decode_mp4_audio

            return decode_mp4_audio(data)
        if data[:4] == b"OggS":  # Ogg Vorbis/Opus: container parses
            from ..sources.ogg import ogg_meta

            meta = ogg_meta(data)  # structural damage -> ValueError here
            raise NotImplementedError(
                f"Ogg {meta['codec']} payload has no native decoder "
                "(container metadata available via probe_audio_meta)")
    except (ValueError, NotImplementedError):
        raise
    except (IndexError, KeyError, struct.error, zlib.error) as e:
        raise ValueError(f"corrupt audio stream: {type(e).__name__}: {e}") from e
    try:  # pragma: no cover - backend not in this environment
        import soundfile  # noqa: F401
    except ImportError:
        raise NotImplementedError(
            "lossy-audio decoding needs the 'soundfile' backend; WAV, FLAC "
            "and the deterministic FPCM container decode natively"
        ) from None
    raise NotImplementedError("real-codec path not wired")  # pragma: no cover


def probe_audio_meta(data: bytes) -> tuple[int, int] | None:
    """Container-level ``(sample_rate, n_samples)`` for streams whose
    CODEC is flagged but whose CONTAINER parses — Ogg Vorbis/Opus headers
    + final granule position, MP4 mdhd duration. ``None`` when nothing
    parses: the flag path then keeps zeroed meta. This is what makes a
    flagged .ogg/.opus/.mp4-AAC row still carry real duration columns."""
    try:
        if data[:4] == b"OggS":
            from ..sources.ogg import probe_ogg_audio

            return probe_ogg_audio(data)
        if len(data) >= 12 and data[4:8] == b"ftyp":
            from ..sources.mp4 import probe_duration

            return probe_duration(data)
    except (ValueError, IndexError, KeyError, struct.error):
        return None
    return None


def decode_video_frames(data: bytes) -> np.ndarray:
    """bytes -> uint8 (n, h, w) frames. Dispatch mirrors decode_audio:
    real AVI (pure Python: uncompressed DIB + MJPEG via the in-repo
    baseline-JPEG decoder, sources/avi.py), animated GIF (sources/gif.py,
    composited frames -> grayscale), the deterministic FVID test
    container, then the import-gated external backend for other codecs."""
    try:
        if data[:4] == b"RIFF" and data[8:12] == b"AVI ":
            from ..sources.avi import decode_avi

            return decode_avi(data)
        if data[:6] in (b"GIF87a", b"GIF89a"):  # animated GIF as video
            from ..sources.avi import _to_gray
            from ..sources.gif import decode_gif

            return np.stack([_to_gray(f) for f in decode_gif(data)])
        if data[:4] == b"RIFF" and data[8:12] == b"WEBP":  # animated WebP
            from ..sources.avi import _to_gray
            from ..sources.vp8l import decode_webp_frames

            return np.stack([_to_gray(f) for f in decode_webp_frames(data)])
        if data[:4] == b"\x1a\x45\xdf\xa3":  # WebM/EBML: VP8 track
            from ..sources.avi import _to_gray
            from ..sources.vp8 import yuv420_to_rgb
            from ..sources.webm import decode_webm_vp8

            frames = decode_webm_vp8(data)
            if not frames:
                raise ValueError("WebM stream with no shown frames")
            return np.stack(
                [_to_gray(yuv420_to_rgb(y, u, v)) for y, u, v in frames]
            )
        if data[:4] == b"DKIF":  # IVF-contained VP8: key + P-frame chains
            from ..sources.avi import _to_gray
            from ..sources.vp8 import yuv420_to_rgb
            from ..sources.vp8p import decode_ivf_vp8

            frames = decode_ivf_vp8(data)
            if not frames:
                raise ValueError("IVF stream with no shown frames")
            return np.stack(
                [_to_gray(yuv420_to_rgb(y, u, v)) for y, u, v in frames]
            )
        if len(data) >= 12 and data[4:8] == b"ftyp":  # MP4/ISO-BMFF
            from ..sources.mp4 import decode_mp4_video

            return decode_mp4_video(data)
        if data[:4] == _FAKE_VIDEO_MAGIC:
            n, h, w = struct.unpack("<III", data[4:16])
            return np.frombuffer(zlib.decompress(data[16:]), dtype=np.uint8).reshape(n, h, w)
    except (ValueError, NotImplementedError):
        raise
    except (IndexError, KeyError, struct.error, zlib.error) as e:
        raise ValueError(f"corrupt video stream: {type(e).__name__}: {e}") from e
    try:  # pragma: no cover
        import av  # noqa: F401
    except ImportError:
        raise NotImplementedError(
            "H.26x/VPx decoding needs the 'av' backend; AVI (DIB/MJPEG) "
            "and the deterministic FVID container decode natively"
        ) from None
    raise NotImplementedError("real-codec path not wired")  # pragma: no cover


# --- fingerprints (pure numpy, reuse SimHash machinery downstream) ----------


def audio_fingerprint64(samples: np.ndarray, rate: int) -> int:
    """64-bit spectral-band fingerprint: 64 equal slices -> per-slice energy
    -> bit = energy above running median. Deterministic, robust to gain."""
    s = np.asarray(samples, dtype=np.float64)
    if len(s) == 0:
        return 0
    slices = np.array_split(s, 64)
    energy = np.array([float((x * x).mean()) if len(x) else 0.0 for x in slices])
    bits = (energy > np.median(energy)).astype(np.uint64)
    return int(sum(b << np.uint64(i) for i, b in enumerate(bits)))


def frames_fingerprint64(frames: np.ndarray) -> int:
    """64-bit video fingerprint: temporal-mean frame -> 8x8 block means ->
    bit = block above mean (a temporal aHash)."""
    if frames.size == 0:
        return 0
    mean_frame = frames.astype(np.float64).mean(axis=0)
    h, w = mean_frame.shape
    bh, bw = max(1, h // 8), max(1, w // 8)
    blocks = mean_frame[: bh * 8, : bw * 8].reshape(8, bh, 8, bw).mean(axis=(1, 3))
    bits = (blocks > blocks.mean()).astype(np.uint64).ravel()
    return int(sum(b << np.uint64(i) for i, b in enumerate(bits)))


def _signed64(x: int) -> int:
    return x - (1 << 64) if x >= (1 << 63) else x


AUDIO_META = StructType(
    [
        StructField("sample_rate", IntegerType()),
        StructField("n_samples", LongType()),
        StructField("duration_sec", DoubleType()),
        StructField("afp", LongType()),
    ]
)

VIDEO_META = StructType(
    [
        StructField("n_frames", IntegerType()),
        StructField("height", IntegerType()),
        StructField("width", IntegerType()),
        StructField("vfp", LongType()),
    ]
)


def audio_meta_table(
    df: DataFrame, bytes_col: str = "bytes", undecodable: str = "raise"
) -> DataFrame:
    """mapInPandas: decode + meta + fingerprint per clip. Schema = input
    columns minus payload, plus AUDIO_META fields (payload dropped early —
    never shuffle opaque bytes you no longer need).

    ``undecodable``: 'raise' (default — corrupt bytes fail the task, for
    trusted corpora) or 'flag' (same policy as image_dedup: the row gets
    decode_ok=false with zeroed meta and is excluded from fingerprint
    clustering downstream — a bad row never kills a 100-TB job)."""
    if undecodable not in ("raise", "flag"):
        raise ValueError(f"unknown undecodable policy {undecodable!r}")
    flag = undecodable == "flag"
    from pyspark.sql.types import BooleanType

    out_fields = [f for f in df.schema.fields if f.name != bytes_col]
    schema = StructType(
        out_fields
        + list(AUDIO_META.fields)
        + ([StructField("decode_ok", BooleanType())] if flag else [])
    )
    keep = [f.name for f in out_fields]

    def process(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            # decode is inherently per-clip; iterate raw values (zip over
            # .values) — no pandas Series-per-row materialization
            rates = np.zeros(len(pdf), dtype=np.int32)
            counts = np.zeros(len(pdf), dtype=np.int64)
            fps = np.zeros(len(pdf), dtype=np.int64)
            oks = np.ones(len(pdf), dtype=bool)
            for i, data in enumerate(pdf[bytes_col].values):
                try:
                    samples, rate = decode_audio(bytes(data))
                except (ValueError, NotImplementedError):
                    if not flag:
                        raise
                    oks[i] = False
                    probed = probe_audio_meta(bytes(data))
                    if probed:  # flagged codec, parseable container:
                        rates[i], counts[i] = probed  # real meta columns
                    continue
                rates[i] = rate
                counts[i] = len(samples)
                fps[i] = _signed64(audio_fingerprint64(samples, rate))
            out = pdf[keep].copy()
            out["sample_rate"] = rates
            out["n_samples"] = counts
            out["duration_sec"] = np.where(rates > 0, counts / np.maximum(rates, 1), 0.0)
            out["afp"] = fps
            if flag:
                out["decode_ok"] = oks
            yield out

    return df.mapInPandas(process, schema)


def video_meta_table(
    df: DataFrame,
    bytes_col: str = "bytes",
    sample_every: int = 1,
    undecodable: str = "raise",
) -> DataFrame:
    """mapInPandas: frame-sample (every Nth frame) + meta + fingerprint.
    ``undecodable``: 'raise' or 'flag' — same contract as
    audio_meta_table."""
    if undecodable not in ("raise", "flag"):
        raise ValueError(f"unknown undecodable policy {undecodable!r}")
    flag = undecodable == "flag"
    from pyspark.sql.types import BooleanType

    out_fields = [f for f in df.schema.fields if f.name != bytes_col]
    schema = StructType(
        out_fields
        + list(VIDEO_META.fields)
        + ([StructField("decode_ok", BooleanType())] if flag else [])
    )
    keep = [f.name for f in out_fields]

    def process(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            nfr = np.zeros(len(pdf), dtype=np.int32)
            hs = np.zeros(len(pdf), dtype=np.int32)
            ws = np.zeros(len(pdf), dtype=np.int32)
            fps = np.zeros(len(pdf), dtype=np.int64)
            oks = np.ones(len(pdf), dtype=bool)
            for i, data in enumerate(pdf[bytes_col].values):
                try:
                    frames = decode_video_frames(bytes(data))
                except (ValueError, NotImplementedError):
                    if not flag:
                        raise
                    oks[i] = False
                    continue
                nfr[i], hs[i], ws[i] = frames.shape
                fps[i] = _signed64(frames_fingerprint64(frames[::sample_every]))
            out = pdf[keep].copy()
            out["n_frames"] = nfr
            out["height"] = hs
            out["width"] = ws
            out["vfp"] = fps
            if flag:
                out["decode_ok"] = oks
            yield out

    return df.mapInPandas(process, schema)


def media_near_dup_assignments(
    meta: DataFrame, fp_col: str, id_col: str, bit_diff: int = 3
) -> DataFrame:
    """Near-dup clustering over any 64-bit media fingerprint column —
    literally the phash path (Catalyst bucketing + Hamming verify + CC)."""
    from ..config import SimHashConfig
    from ..operators.simhash_dedup import simhash_assignments_from_fingerprint

    cfg = SimHashConfig(f=64, bit_diff=bit_diff, num_bucket=4, ngram=3)
    return simhash_assignments_from_fingerprint(meta, fp_col, cfg, id_col)
