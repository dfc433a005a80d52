"""Ogg container (sources/ogg.py): page CRC + lacing/continuation packet
assembly, Vorbis/Opus header + comment parsing, duration from granules,
and the flag-with-real-metadata integration (VERDICT r4 #6)."""

from __future__ import annotations

import struct

import pytest

from text_dedup_spark.functions.media_udf import (
    audio_meta_table,
    decode_audio,
    probe_audio_meta,
)
from text_dedup_spark.sources.ogg import (
    make_opus_fixture,
    make_vorbis_fixture,
    ogg_meta,
    parse_packets,
    probe_ogg_audio,
    write_ogg,
)


def test_opus_header_tags_duration():
    b = make_opus_fixture(duration_samples_48k=9600,
                          tags={"title": "Clip", "artist": "A&B"})
    m = ogg_meta(b)
    assert (m["codec"], m["channels"], m["sample_rate"]) == ("opus", 1, 48000)
    # final granule 312+9600 minus 312 pre-skip -> exactly 9600 48k samples
    assert m["duration_sec"] == pytest.approx(9600 / 48000)
    assert m["comments"]["TITLE"] == "Clip" and m["comments"]["ARTIST"] == "A&B"
    assert probe_ogg_audio(b) == (48000, 9600)


def test_vorbis_header_tags_duration():
    b = make_vorbis_fixture(rate=44100, n_samples=22050, tags={"album": "x"})
    m = ogg_meta(b)
    assert (m["codec"], m["channels"], m["sample_rate"]) == ("vorbis", 2, 44100)
    assert m["duration_sec"] == pytest.approx(0.5)
    assert m["comments"]["ALBUM"] == "x"
    assert probe_ogg_audio(b) == (44100, 22050)


def test_continuation_lacing_round_trip():
    """A packet longer than one page's segment budget splits across pages
    with the continuation flag; the parser splices it back exactly."""
    big = bytes(range(256)) * 5
    head = (b"\x01vorbis" + struct.pack("<I", 0) + bytes([1])
            + struct.pack("<Iiii", 8000, 0, 0, 0) + bytes([0xB8, 1]))
    b = write_ogg([head, big, b"tail"], max_segs_per_page=3)
    (packets, _gran), = parse_packets(b).values()
    assert packets == [head, big, b"tail"]


def test_corruption_raises_value_error():
    b = make_opus_fixture()
    bad = bytearray(b)
    bad[40] ^= 0xFF  # body flip -> CRC mismatch
    with pytest.raises(ValueError, match="CRC"):
        ogg_meta(bytes(bad))
    with pytest.raises(ValueError):
        ogg_meta(b[:20])  # truncated header
    with pytest.raises(ValueError):
        ogg_meta(b"OggX" + b[4:])  # capture pattern
    # a page claiming more lacing than bytes present
    trunc = b[: len(b) - 10]
    with pytest.raises(ValueError):
        ogg_meta(trunc)


def test_decode_audio_flags_with_parse_first():
    """Dispatch order: structural damage is ValueError; a well-formed Ogg
    raises NotImplementedError naming the codec (closed contract)."""
    with pytest.raises(NotImplementedError, match="opus"):
        decode_audio(make_opus_fixture())
    with pytest.raises(NotImplementedError, match="vorbis"):
        decode_audio(make_vorbis_fixture())
    bad = bytearray(make_opus_fixture())
    bad[40] ^= 0xFF
    with pytest.raises(ValueError):
        decode_audio(bytes(bad))
    assert probe_audio_meta(b"OggS" + b"\x00" * 10) is None  # damaged -> None


def test_audio_meta_flags_with_real_container_metadata(spark):
    """The verdict's done-criterion: audio_meta over .ogg/.opus fixtures
    flags cleanly (decode_ok=false) with REAL metadata columns."""
    rows = [
        ("opus", bytearray(make_opus_fixture(duration_samples_48k=4800))),
        ("vorbis", bytearray(make_vorbis_fixture(rate=16000, n_samples=8000))),
        ("junk", bytearray(b"\x00" * 64)),
    ]
    df = spark.createDataFrame(rows, "clip_id string, bytes binary")
    got = {r["clip_id"]: r for r in
           audio_meta_table(df, undecodable="flag").collect()}
    assert not any(got[k]["decode_ok"] for k in ("opus", "vorbis", "junk"))
    assert got["opus"]["sample_rate"] == 48000
    assert got["opus"]["n_samples"] == 4800
    assert got["opus"]["duration_sec"] == pytest.approx(0.1)
    assert got["vorbis"]["sample_rate"] == 16000
    assert got["vorbis"]["duration_sec"] == pytest.approx(0.5)
    assert got["junk"]["sample_rate"] == 0  # nothing parseable stays zeroed
    # raise-mode still raises on the flagged codec (trusted-corpus contract)
    with pytest.raises(Exception):
        audio_meta_table(df, undecodable="raise").collect()


def test_fixtures_deterministic():
    """Fixtures are fully deterministic — byte-identical across calls."""
    assert make_opus_fixture() == make_opus_fixture()
    assert make_vorbis_fixture() == make_vorbis_fixture()
