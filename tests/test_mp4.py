"""MP4/ISO-BMFF container (sources/mp4.py): box walk, track table, native
MJPEG/raw-video + PCM-audio decode, flagged modern codecs, truncation fuzz,
and the media_udf dispatch + flag-policy integration (VERDICT r4 #4)."""

from __future__ import annotations

import numpy as np
import pytest

from text_dedup_spark.functions.media_udf import (
    audio_meta_table,
    decode_audio,
    decode_video_frames,
    probe_audio_meta,
    video_meta_table,
)
from text_dedup_spark.sources.avi import _to_gray
from text_dedup_spark.sources.jpeg import decode_jpeg_baseline, encode_jpeg_baseline
from text_dedup_spark.sources.mp4 import (
    decode_mp4_audio,
    decode_mp4_video,
    encode_mp4,
    is_mp4,
    mp4_track_table,
    parse_mp4,
    probe_duration,
)

RNG = np.random.RandomState(1)


def _frames(n=4, h=16, w=24):
    base = np.add.outer(np.linspace(0, 200, h), np.linspace(0, 255, w)) / 2
    return [(base[:, :, None] + RNG.randint(0, 50, (h, w, 3))).astype(np.uint8)
            for _ in range(n)]


def _samples(n=800):
    return (np.sin(np.arange(n) / 7.0) * 8000).astype(np.int16)


@pytest.fixture(scope="module")
def av_mp4():
    frames, samples = _frames(), _samples()
    return encode_mp4(frames=frames, samples=samples, rate=8000, fps=5), \
        frames, samples


def test_track_table_metadata(av_mp4):
    data, frames, samples = av_mp4
    assert is_mp4(data) and parse_mp4(data)["brand"] == "isom"
    vid, aud = mp4_track_table(data)
    assert (vid["handler"], vid["codec"]) == ("vide", "jpeg")
    assert (vid["width"], vid["height"], vid["n_samples"]) == (24, 16, 4)
    assert vid["duration_sec"] == pytest.approx(4 / 5)
    assert (aud["handler"], aud["codec"]) == ("soun", "sowt")
    assert (aud["channels"], aud["sample_rate"], aud["n_samples"]) == (1, 8000, 800)
    assert aud["duration_sec"] == pytest.approx(0.1)


def test_mjpeg_video_bit_identical_to_jpeg_path(av_mp4):
    """Each MJPEG sample decodes through the same in-repo JPEG decoder, so
    the container path must be bit-identical to per-frame decode."""
    data, frames, _ = av_mp4
    exp = np.stack([
        _to_gray(decode_jpeg_baseline(encode_jpeg_baseline(f, quant_scale=2)))
        for f in frames])
    assert np.array_equal(decode_mp4_video(data), exp)
    assert np.array_equal(decode_video_frames(data), exp)  # magic dispatch


def test_pcm_audio_exact_all_variants(av_mp4):
    data, _, samples = av_mp4
    out, rate = decode_mp4_audio(data)
    assert rate == 8000 and np.array_equal(out, samples)
    out2, _ = decode_audio(data)  # magic dispatch
    assert np.array_equal(out2, samples)
    # big-endian twos + raw video variant
    b2 = encode_mp4(frames=_frames(2), samples=samples, rate=8000,
                    video_codec=b"raw ", audio_codec=b"twos")
    out3, _ = decode_mp4_audio(b2)
    assert np.array_equal(out3, samples)
    assert decode_mp4_video(b2).shape == (2, 16, 24)
    assert probe_duration(b2) == (8000, 800)


def test_flagged_codecs_raise_not_implemented():
    b = encode_mp4(frames=_frames(2), samples=_samples(100), rate=8000,
                   video_codec=b"avc1", audio_codec=b"mp4a")
    with pytest.raises(NotImplementedError, match="avc1"):
        decode_mp4_video(b)
    with pytest.raises(NotImplementedError, match="mp4a"):
        decode_mp4_audio(b)
    # container metadata still fully readable on flagged codecs
    vid, aud = mp4_track_table(b)
    assert vid["codec"] == "avc1" and aud["codec"] == "mp4a"
    assert probe_duration(b) == (8000, 100)
    assert probe_audio_meta(b) == (8000, 100)


def test_truncation_and_overrun_fuzz(av_mp4):
    """Every cut either parses to the same metadata or raises the closed
    contract's ValueError/NotImplementedError — never an uncaught crash."""
    data, _, _ = av_mp4
    for cut in [6, 10, 30, 60, 100, len(data) // 2, len(data) - 5]:
        try:
            decode_mp4_video(data[:cut])
            decode_mp4_audio(data[:cut])
        except (ValueError, NotImplementedError):
            pass
    # box size overrunning its parent is structural damage
    bad = bytearray(data)
    bad[0:4] = (2**31).to_bytes(4, "big")
    with pytest.raises(ValueError):
        parse_mp4(bytes(bad))


def test_meta_tables_flag_policy_over_mp4(spark):
    """video/audio meta tables accept .mp4 rows; an avc1/mp4a clip flags
    with decode_ok=false — and the AUDIO row still carries real container
    metadata (rate/duration from mdhd) instead of zeros."""
    good = encode_mp4(frames=_frames(3), samples=_samples(400), rate=8000)
    flagged = encode_mp4(frames=_frames(2), samples=_samples(200), rate=8000,
                         video_codec=b"avc1", audio_codec=b"mp4a")
    df = spark.createDataFrame(
        [("good", bytearray(good)), ("h264", bytearray(flagged))],
        "clip_id string, bytes binary")
    vrows = {r["clip_id"]: r for r in
             video_meta_table(df, undecodable="flag").collect()}
    assert vrows["good"]["decode_ok"] and vrows["good"]["n_frames"] == 3
    assert not vrows["h264"]["decode_ok"]
    arows = {r["clip_id"]: r for r in
             audio_meta_table(df, undecodable="flag").collect()}
    assert arows["good"]["decode_ok"] and arows["good"]["n_samples"] == 400
    flag_row = arows["h264"]
    assert not flag_row["decode_ok"]
    assert flag_row["sample_rate"] == 8000  # real container metadata
    assert flag_row["n_samples"] == 200
    assert flag_row["duration_sec"] == pytest.approx(200 / 8000)
    assert flag_row["afp"] == 0  # no fingerprint without a codec decode
