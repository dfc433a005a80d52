"""EXIF parse / lossless metadata strip."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from text_dedup_spark.sources.exif import (
    build_exif_app1,
    insert_app1,
    iter_jpeg_segments,
    parse_exif,
    strip_jpeg_metadata,
)
from text_dedup_spark.sources.jpeg import decode_jpeg_baseline, encode_jpeg_baseline


def _jpeg(seed=0):
    rng = np.random.default_rng(seed)
    img = rng.integers(0, 256, (24, 32, 3), dtype=np.uint8)
    return encode_jpeg_baseline(img)


def test_parse_and_strip_round_trip():
    base = _jpeg()
    tagged = insert_app1(
        base, build_exif_app1(orientation=6, gps=True, make="camX",
                              datetime="2023:05:04 12:00:00")
    )
    m = parse_exif(tagged)
    assert m == {
        "has_exif": True, "has_gps": True, "orientation": 6,
        "make": "camX", "model": None, "datetime": "2023:05:04 12:00:00",
    }
    stripped = strip_jpeg_metadata(tagged)
    # metadata gone, pixels bit-identical, bytes smaller
    assert parse_exif(stripped)["has_exif"] is False
    assert np.array_equal(decode_jpeg_baseline(stripped), decode_jpeg_baseline(tagged))
    assert len(stripped) < len(tagged)
    # stripping an already-clean stream is a no-op on decode and markers
    markers = [mk for mk, _, _ in iter_jpeg_segments(stripped)]
    assert 0xE1 not in markers and 0xFE not in markers


def test_parse_no_exif_and_errors():
    base = _jpeg(1)
    assert parse_exif(base)["has_exif"] is False
    with pytest.raises(ValueError):
        parse_exif(b"not a jpeg")
    # malformed TIFF header inside APP1 is loud
    bad = insert_app1(base, b"\xff\xe1\x00\x0cExif\x00\x00XXXX")
    with pytest.raises(ValueError):
        parse_exif(bad)


def test_comment_segment_stripped():
    base = _jpeg(2)
    com = b"\xff\xfe" + (len(b"secret") + 2).to_bytes(2, "big") + b"secret"
    tagged = base[:2] + com + base[2:]
    stripped = strip_jpeg_metadata(tagged)
    assert b"secret" not in stripped
    assert np.array_equal(decode_jpeg_baseline(stripped), decode_jpeg_baseline(base))


def test_exif_udfs(spark):
    rows = [
        (1, insert_app1(_jpeg(3), build_exif_app1(orientation=3, gps=True))),
        (2, insert_app1(_jpeg(4), build_exif_app1(orientation=1, gps=False))),
        (3, _jpeg(5)),              # no EXIF
        (4, b"\x89PNG not a jpeg"), # non-JPEG: neutral / passthrough
    ]
    df = spark.createDataFrame(rows, "image_id long, bytes binary")
    from text_dedup_spark.functions.exif_udf import exif_info, strip_metadata

    info = {r["image_id"]: r["i"] for r in df.select(
        "image_id", exif_info("bytes").alias("i")).collect()}
    assert info[1]["has_gps"] and info[1]["orientation"] == 3
    assert info[2]["has_exif"] and not info[2]["has_gps"]
    assert not info[3]["has_exif"] and not info[4]["has_exif"]

    out = {r["image_id"]: bytes(r["s"]) for r in df.select(
        "image_id", strip_metadata("bytes").alias("s")).collect()}
    assert parse_exif(out[1])["has_exif"] is False
    assert out[4] == rows[3][1]  # non-JPEG passthrough
    assert np.array_equal(decode_jpeg_baseline(out[1]),
                          decode_jpeg_baseline(bytes(rows[0][1])))


def test_strip_webp_metadata_lossless():
    """WebP privacy scrub: EXIF/XMP/ICCP chunks (GPS/device carriers) drop,
    VP8X flags clear, pixels stay bit-identical, and the scrub composes
    with the container-dispatched strip_metadata UDF path."""
    import struct

    import numpy as np

    from text_dedup_spark.sources.exif import strip_webp_metadata
    from text_dedup_spark.sources.vp8l import decode_webp, encode_vp8l

    rng = np.random.RandomState(4)
    img = rng.randint(0, 256, (9, 7, 3)).astype(np.uint8)
    plain = encode_vp8l(img)
    vp8l_chunk = plain[12:]

    def chunk(tag, payload):
        c = tag + struct.pack("<I", len(payload)) + payload
        return c + (b"\x00" if len(payload) % 2 else b"")

    vp8x = bytes([0x20 | 0x08 | 0x04, 0, 0, 0]) + (6).to_bytes(3, "little") + (
        8
    ).to_bytes(3, "little")
    body = (
        chunk(b"VP8X", vp8x)
        + chunk(b"ICCP", b"fake-icc-profile")
        + vp8l_chunk
        + chunk(b"EXIF", b"II*\x00gps-coordinates-here")
        + chunk(b"XMP ", b"<x:xmpmeta>author</x:xmpmeta>")
    )
    dirty = b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WEBP" + body

    clean = strip_webp_metadata(dirty)
    assert b"EXIF" not in clean and b"XMP " not in clean and b"ICCP" not in clean
    assert b"gps-coordinates-here" not in clean and b"author" not in clean
    assert clean[12 + 8] & (0x20 | 0x08 | 0x04) == 0  # VP8X flags cleared
    assert np.array_equal(decode_webp(clean), img)  # pixels bit-identical
    assert np.array_equal(decode_webp(dirty), img)

    with pytest.raises(ValueError):
        strip_webp_metadata(b"not webp")
