"""Baseline TIFF codec coverage (sources/tiff.py) + format sniffing.

Evidence classes mirror tests/test_png_full.py:
1. a synthetic round-trip matrix over photometric x bits x compression x
   predictor x byte order x strip size (forward and inverse paths are
   separate implementations, incl. two independent LZW codecs);
2. a real-encoder golden — CPython's test python.tiff (16x16 RGBA,
   uncompressed) — cross-checked against a DIRECT numpy read of its raw
   strip bytes, so the IFD/strip walker is validated independently of
   this repo's own encoder;
3. error paths feeding the operator-level skip+flag policy;
4. magic-byte sniffing for the multimodal binary column.
"""

from __future__ import annotations

import base64

import numpy as np
import pytest

from text_dedup_spark.sources.png import sniff_format, try_decode_image
from text_dedup_spark.sources.tiff import decode_tiff, encode_tiff

RNG = np.random.RandomState(11)

MATRIX = [
    # (photometric, bits, shape)
    (1, 8, (7, 5)),
    (0, 8, (7, 5)),
    (1, 16, (5, 9)),
    (1, 1, (9, 3)),
    (1, 4, (6, 6)),
    (2, 8, (7, 5, 3)),
    (2, 8, (7, 5, 4)),  # RGBA: alpha dropped
    (2, 16, (4, 3, 3)),
    (3, 8, (7, 5)),
    (3, 4, (5, 5)),
    (3, 1, (4, 4)),
]


def _expected(arr, photo, bits, pal):
    if photo == 2:
        return arr[..., :3]
    if photo == 3:
        return pal[arr]
    g = arr
    if bits < 8:
        g = (g.astype(int) * (255 // ((1 << bits) - 1))).astype(np.uint8)
    if photo == 0:
        g = 255 - g
    return np.repeat(g[..., None], 3, axis=2)


@pytest.mark.parametrize("photo,bits,shape", MATRIX)
@pytest.mark.parametrize("comp", [1, 5, 8, 32773])
def test_tiff_matrix_roundtrip(photo, bits, shape, comp):
    hi = 256 if bits >= 8 else (1 << bits)
    pal = RNG.randint(0, 256, (hi, 3)).astype(np.uint8) if photo == 3 else None
    arr = RNG.randint(0, hi, shape).astype(np.uint8)
    exp = _expected(arr, photo, bits, pal)
    for pred in [1, 2] if bits == 8 else [1]:
        for be in (False, True):
            for rps in (None, 2):
                data = encode_tiff(
                    arr,
                    photometric=photo,
                    compression=comp,
                    bits=bits,
                    predictor=pred,
                    palette=pal,
                    big_endian=be,
                    rows_per_strip=rps,
                )
                assert sniff_format(data) == "tiff"
                assert np.array_equal(decode_tiff(data), exp), (pred, be, rps)


# CPython test asset Lib/test/test_email/data/python.tiff (PSF license):
# 16x16 RGBA, uncompressed, little-endian — a real-writer golden.
REAL_TIFF_B64 = (
    "SUkqAAgEAAAAAAAAAAAAAAAAAAAAAAAATo3Ar0qGuu1Ig7T/RH6t/0B4p/88cZ73N2iW"
    "kgAAAAsAAAADAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAEyKvP//////RX+v/0F5"
    "qP8+dKL/Om+b/zZplP8AAAAoAAAACwAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAABJ"
    "hbf/RoCx/0J7qv8+daP/O3Cd/zdqlv82aZT/AAAAQQAAABUAAAAAAAAAAAAAAAAAAAAA"
    "To/EfkyKv6BIhbahQ32toz10oac5bJaqNmaQqjhsl/82aZT/NmmU/wAAAEgAAAAYAAAA"
    "AAAAAAAAAAAAUpHGvU+Nwf9LiLv/SIO0/0R9rf9AeKb/PXOg/zltmf82aZT/NmmU/zZp"
    "lP8AAABI/+JV//3dSvf51T6CAAAAClCPw/9Mibz/SIS1/0V/r/9Beaj/PXSh/zpvm/82"
    "aZT/NmmU/zZplP8yYIe2AAAAQ//eS///2kH//dU27QAAACRNi77/SYW3/0aAsP9Ce6r/"
    "PnWj/ztwnP83apb/NmmU/zVokvcyYIe2AAAAT+zORYj/2kL//9Y3///TLf8AAAA9Soe5"
    "/0eBsv9DfKv/P3al/zZpk7YbMUVcAAAATAAAAEgAAABHAAAAQeLDRWv92UH3/9c4///T"
    "Lf//zyP/AAAARkaBsvdEfa3/QHim/zZnkaoAAABO8uFupv3pavf/5mH//+NX///fTf//"
    "20L//9c4///TLv//zyT//csb9wAAAEdDfa7XQXmo/z10of8cMktb9eNvs//rbP//52H/"
    "/+NX///fTf//20P//9c5///TLv//zyT//8wc//PBGsIAAABBQHWjbz1zovc6cJz/AAAA"
    "S//rbP//52L//+NY///fTv//20P//9c5///TL///zyT//8wc///MHP/CmhJ6AAAANAAA"
    "AAgAAAAhAAAAPAAAADX/52L//+NY///fTv/oxz2q68U0qevCKqnrviGp67sYqeu7GKnG"
    "mxJ5AAAAQQAAACAAAAACAAAACQAAABMAAAAS/+NY///fTv//20T//9c6///TMP//0CX/"
    "/8wc/wAAAEEAAAA1AAAALAAAAB4AAAALAAAAAAAAAAAAAAAAAAAAAP3eTvf/20T//9g6"
    "///UMP//0Cb///////3LG/cAAABAAAAAHAAAAAkAAAAFAAAAAQAAAAAAAAAAAAAAAAAA"
    "AADx0D9M+tM5zP3SL/f/0Cb//8wc//rHGdjAlxJ7AAAAOwAAABIAAAAAAAAAAAAAAAAA"
    "AAAAAAAAAAAAAAAAAAAAAAAACAAAAB0AAAA1AAAAQgAAAEcAAABFAAAAOAAAAB8AAAAI"
    "AAAAAAAAAAAAAAAAEQAAAQMAAQAAABAAAAABAQMAAQAAABAAAAACAQMABAAAANoEAAAD"
    "AQMAAQAAAAEAAAAGAQMAAQAAAAIAAAAKAQMAAQAAAAEAAAANAQIADAAAACIFAAARAQQA"
    "AQAAAAgAAAASAQMAAQAAAAEAAAAVAQMAAQAAAAQAAAAWAQMAAQAAAIAAAAAXAQQAAQAA"
    "AAAEAAAcAQMAAQAAAAEAAAApAQMAAgAAAAAAAQA+AQUAAgAAABIFAAA/AQUABgAAAOIE"
    "AABSAQMAAQAAAAIAAAAAAAAACAAIAAgACAAACtej/////4DhelT/////AM3MTP////8A"
    "mpmZ/////4BmZib/////8ChcD/////+AGw1Q/////wBYOVT/////cHl0aG9uLnRpZmYA"
)


@pytest.mark.parametrize("comp", [1, 5, 8, 32773])
@pytest.mark.parametrize("tiles", [(16, 16), (16, 32), (32, 16)])
def test_tiff_tiled_roundtrip(comp, tiles):
    """Tiled layout (16-multiple dims per TIFF 6.0): edge tiles padded to
    full tile size; output pixels must equal the strip layout's
    (cross-layout parity on one array). 37x29 -> multi-tile grids with
    partial edge tiles at every parametrized tile size."""
    arr = RNG.randint(0, 256, (37, 29, 3)).astype(np.uint8)
    strip = decode_tiff(encode_tiff(arr, compression=comp))
    for be in (False, True):
        data = encode_tiff(arr, compression=comp, tiles=tiles, big_endian=be)
        assert np.array_equal(decode_tiff(data), arr[..., :3])
        assert np.array_equal(decode_tiff(data), strip)


@pytest.mark.parametrize("photo,bits,shape", [
    (2, 8, (7, 5, 3)),
    (2, 8, (9, 4, 4)),   # RGBA planar: 4 planes, alpha dropped
    (2, 16, (5, 6, 3)),
    (1, 8, (6, 6)),      # single-sample planar == chunky, still legal
])
@pytest.mark.parametrize("comp", [1, 5, 32773])
def test_tiff_planar_roundtrip(photo, bits, shape, comp):
    arr = RNG.randint(0, 256, shape).astype(np.uint8)
    exp = _expected(arr, photo, bits, None)
    for rps in (None, 2):
        data = encode_tiff(
            arr, photometric=photo, bits=bits, compression=comp,
            planar=2, rows_per_strip=rps,
        )
        assert np.array_equal(decode_tiff(data), exp), (comp, rps)


def test_tiff_planar_tiled_combined():
    # 16-multiple tile dims (TIFF 6.0 p.67); 20x35 -> a 2x3 tile grid with
    # zero-padded edge tiles in BOTH dimensions
    arr = RNG.randint(0, 256, (20, 35, 3)).astype(np.uint8)
    data = encode_tiff(arr, compression=8, planar=2, tiles=(16, 16))
    assert np.array_equal(decode_tiff(data), arr)


def test_tiff_tiles_must_be_16_multiples():
    arr = RNG.randint(0, 256, (8, 8, 3)).astype(np.uint8)
    for bad in ((4, 16), (16, 6), (4, 4)):
        with pytest.raises(ValueError, match="multiples of 16"):
            encode_tiff(arr, tiles=bad)


@pytest.mark.parametrize("photo,shape", [(1, (6, 7)), (2, (5, 4, 3))])
def test_tiff_predictor2_16bit(photo, shape):
    """Predictor 2 on 16-bit lanes accumulates mod 65536 (spec 14) —
    round-trips through strips, tiles, and planar at both byte orders."""
    arr = RNG.randint(0, 256, shape).astype(np.uint8)
    exp = _expected(arr, photo, 16, None)
    for be in (False, True):
        for kw in ({}, {"tiles": (16, 16)}, {"planar": 2},
                   {"rows_per_strip": 3}):
            data = encode_tiff(
                arr, photometric=photo, bits=16, predictor=2,
                compression=5, big_endian=be, **kw,
            )
            assert np.array_equal(decode_tiff(data), exp), (be, kw)


def test_tiff_tile_errors_feed_flag_policy():
    arr = RNG.randint(0, 256, (8, 8, 3)).astype(np.uint8)
    data = bytearray(encode_tiff(arr, tiles=(16, 16)))
    # truncation (clips IFD/tile bytes) -> flagged skip, never a crash
    assert try_decode_image(bytes(data[:-40]), "tiff") is None
    assert try_decode_image(bytes(data[:60]), "tiff") is None
    # sub-byte predictor-2 stays outside the supported surface
    with pytest.raises(ValueError):
        encode_tiff(np.zeros((4, 4), np.uint8), photometric=1, bits=4,
                    predictor=2)


def test_tiff_real_golden_vs_direct_strip_read():
    data = base64.b64decode(REAL_TIFF_B64)
    img = decode_tiff(data)
    assert img.shape == (16, 16, 3) and img.dtype == np.uint8
    # independent ground truth: the file is uncompressed RGBA with its one
    # strip at offset 8 — read it straight with numpy, bypassing the codec
    raw = np.frombuffer(data, np.uint8, 16 * 16 * 4, 8).reshape(16, 16, 4)
    assert np.array_equal(img, raw[..., :3])


def test_tiff_errors_feed_flag_policy():
    arr = RNG.randint(0, 256, (6, 6, 3)).astype(np.uint8)
    good = encode_tiff(arr)
    assert try_decode_image(good, "tiff") is not None
    # truncated strip / header -> flagged skip, not a crash
    assert try_decode_image(good[:20], "tiff") is None
    assert try_decode_image(b"II*\x00" + b"\x00" * 20, "tiff") is None
    with pytest.raises(ValueError):
        decode_tiff(b"not a tiff at all")
    with pytest.raises(ValueError):
        encode_tiff(arr, compression=99)
    with pytest.raises(ValueError):
        encode_tiff(np.zeros((4, 4), np.uint8), photometric=3)  # no palette


def test_tiff_lzw_codecs_agree():
    """The two LZW implementations are independent; pin a few stream
    properties beyond round-trip: clear code first, EOI last."""
    from text_dedup_spark.sources.tiff import _lzw_decode, _lzw_encode

    for n in (0, 1, 300, 5000):
        payload = bytes(RNG.randint(0, 8, n).astype(np.uint8))  # repetitive
        enc = _lzw_encode(payload)
        assert _lzw_decode(enc) == payload
        if n:
            assert enc[0] == 0x80  # 9-bit Clear (256) packed MSB-first
    # full-alphabet random bytes grow the table ~1 entry/byte: crosses every
    # width boundary (9->10->11->12) and the 4094-entry clear, twice
    payload = bytes(RNG.randint(0, 256, 10000).astype(np.uint8))
    assert _lzw_decode(_lzw_encode(payload)) == payload


def test_sniff_format():
    from text_dedup_spark.sources.bmp import encode_bmp
    from text_dedup_spark.sources.gif import encode_gif
    from text_dedup_spark.sources.jpeg import encode_jpeg_baseline
    from text_dedup_spark.sources.png import encode_png

    arr = RNG.randint(0, 256, (16, 16, 3)).astype(np.uint8)
    assert sniff_format(encode_png(arr)) == "png"
    assert sniff_format(encode_jpeg_baseline(arr)) == "jpeg"
    assert sniff_format(encode_bmp(arr)) == "bmp"
    assert sniff_format(encode_gif([arr])) == "gif"
    assert sniff_format(encode_tiff(arr)) == "tiff"
    assert sniff_format(b"RIFF\x04\x00\x00WAVE") is None  # < 12 bytes
    assert sniff_format(b"RIFF\x04\x00\x00\x00WAVEdata") == "wav"
    assert sniff_format(b"RIFF\x04\x00\x00\x00WEBPVP8 ") == "webp"
    assert sniff_format(b"RIFF\x04\x00\x00\x00AVI LIST") == "avi"
    assert sniff_format(b"\x00" * 32) is None
    assert sniff_format(b"") is None


def test_tiff_and_sniff_through_spark(spark):
    """Seam test: a TIFF row decodes through the image UDFs; a mislabeled
    row (JPEG bytes, fmt says png) is repaired by coalesce(sniffed, fmt)
    and then decodes, while trusting the lying label would flag-skip it."""
    from pyspark.sql import functions as F

    from text_dedup_spark.functions.image_udf import (
        phash_from_bytes_flagged,
        sniffed_format,
    )
    from text_dedup_spark.sources.jpeg import encode_jpeg_baseline

    rgb = RNG.randint(0, 256, (16, 16, 3)).astype(np.uint8)
    rows = [
        ("t1", bytearray(encode_tiff(rgb, compression=5, predictor=2)), "tiff"),
        ("lie", bytearray(encode_jpeg_baseline(rgb)), "png"),
    ]
    df = spark.createDataFrame(rows, "image_id string, bytes binary, fmt string")
    fixed = df.withColumn(
        "true_fmt", F.coalesce(sniffed_format("bytes"), F.col("fmt"))
    )
    got = {
        r["image_id"]: r
        for r in fixed.withColumn(
            "ph", phash_from_bytes_flagged("bytes", "true_fmt")
        )
        .withColumn("ph_lying", phash_from_bytes_flagged("bytes", "fmt"))
        .select("image_id", "true_fmt", "ph.*", F.col("ph_lying.decode_ok").alias("ok_lying"))
        .collect()
    }
    assert got["t1"]["decode_ok"] and got["t1"]["true_fmt"] == "tiff"
    assert got["lie"]["true_fmt"] == "jpeg"
    assert got["lie"]["decode_ok"]  # repaired label decodes
    assert not got["lie"]["ok_lying"]  # trusted lying label flag-skips
