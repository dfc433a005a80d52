"""WebP-lossless (VP8L) codec coverage (sources/vp8l.py).

Evidence classes, mirroring the sibling codec test files:
1. encode/decode option-matrix round-trips — transforms (subtract-green,
   all 14 predictor modes, delta-coded palette with every bundling
   width), color cache, LZ77 runs; encoder and decoder implement the
   spec independently (canonical-code writer vs bit-walk reader);
2. a REAL libwebp-produced VP8L stream: the ALPH chunk of CPython's
   test python.webp (compression method 1 = lossless alpha) decodes to
   the Python-logo alpha mask through the palette transform and normal
   prefix codes. This golden caught a matched encoder/decoder bug the
   round-trips could not (the VP8L code-length order puts 16 between 5
   and 6, unlike DEFLATE);
3. error paths feeding the operator-level skip+flag policy (lossy VP8
   recognized but flag-skipped; corrupt streams -> ValueError);
4. the Spark seam: webp rows decode through the image UDFs.
"""

from __future__ import annotations

import base64
import hashlib

import numpy as np
import pytest

from text_dedup_spark.sources.png import sniff_format, try_decode_image
from text_dedup_spark.sources.vp8l import (
    decode_alpha_vp8l,
    decode_webp,
    encode_vp8l,
)

RNG = np.random.RandomState(9)


def _structured(h, w, ch=3, nc=256):
    base = np.zeros((h, w, ch), np.uint8)
    for c in range(ch):
        base[..., c] = (
            np.arange(w)[None, :] * 3 + np.arange(h)[:, None] * 5 + c * 40
        ) % nc * (255 // max(nc - 1, 1))
    base[h // 3 : h // 2, :, :] = 200  # flat region: runs + cache hits
    return base


@pytest.mark.parametrize("subtract_green", [False, True])
@pytest.mark.parametrize("predictor", [None, 0, 1, 2, 5, 11, 12, 13])
@pytest.mark.parametrize("cache_bits,lz77", [(0, False), (6, True)])
def test_vp8l_transform_matrix(subtract_green, predictor, cache_bits, lz77):
    a = _structured(13, 17)
    d = encode_vp8l(
        a,
        subtract_green=subtract_green,
        predictor_mode=predictor,
        cache_bits=cache_bits,
        lz77_runs=lz77,
    )
    assert sniff_format(d) == "webp"
    assert np.array_equal(decode_webp(d), a)


def test_vp8l_all_predictor_modes():
    a = _structured(11, 9)
    for mode in range(14):
        assert np.array_equal(
            decode_webp(encode_vp8l(a, predictor_mode=mode)), a
        ), mode


@pytest.mark.parametrize("nc", [2, 3, 4, 9, 16, 17, 200])
def test_vp8l_palette_bundling_widths(nc):
    a = _structured(9, 21, nc=nc)
    d = encode_vp8l(a, use_palette=True, lz77_runs=True)
    assert np.array_equal(decode_webp(d), a)


def test_vp8l_random_and_edge_dims():
    for shape in [(1, 1, 3), (1, 9, 3), (9, 1, 3), (16, 16, 3)]:
        a = RNG.randint(0, 256, shape).astype(np.uint8)
        d = encode_vp8l(a, cache_bits=8, lz77_runs=True)
        assert np.array_equal(decode_webp(d), a), shape


def test_vp8l_rgba_alpha_roundtrip():
    """RGBA encodes; the RGB projection round-trips (pipeline contract
    drops alpha, same as PNG color type 6)."""
    a = RNG.randint(0, 256, (8, 8, 4)).astype(np.uint8)
    assert np.array_equal(
        decode_webp(encode_vp8l(a, subtract_green=True)), a[..., :3]
    )


# The ALPH chunk payload (after its 1-byte header) of CPython's
# Lib/test/test_email/data/python.webp (PSF license): a REAL libwebp
# VP8L lossless stream (16x16, palette-transformed) carrying the
# Python-logo alpha mask.
REAL_VP8L_ALPHA_B64 = (
    "J6KokSTleucYX+ffKpmImP90cY3gJjDi4Yt3MsjBEVyDKzDosHgVjnhRNcEIDAJPkqBq"
    "sFUZHNa2bUYvTsZ2PLbtd/uvKa4hov9J0f2PkPe6REkkGzolkTTzFG0Ox9PlFiD0CxS+"
    "kOGDtxoynjaCfx0pfk52CPuInrOR75lzRugygtv4zEiy90UwfSD9NheMITJWLaXWayO8"
    "XeOlWRXVnIGk2W6WdYoYMQ+KqixQNPowgt+6a1BSKbUtz+lUFAoBAAA="
)


def test_vp8l_real_libwebp_stream_golden():
    alpha = decode_alpha_vp8l(base64.b64decode(REAL_VP8L_ALPHA_B64), 16, 16)
    assert alpha.shape == (16, 16) and alpha.dtype == np.uint8
    assert hashlib.sha256(alpha.tobytes()).hexdigest().startswith("00d64fd7")
    # shape sanity of the Python-logo mask: opaque core, transparent
    # corners, full dynamic range
    assert alpha[0, 0] == 0 and alpha[15, 15] == 0
    assert int(alpha.max()) == 255 and int(alpha.min()) == 0
    assert int((alpha > 200).sum()) > 80  # the two snakes' solid body


def test_webp_error_contract():
    # garbage lossy VP8 payload: now routed to the pure-Python VP8
    # decoder, which rejects it as corrupt (ValueError), so the flag
    # policy still yields None — never a task failure
    lossy = (
        b"RIFF" + (30).to_bytes(4, "little") + b"WEBP"
        + b"VP8 " + (10).to_bytes(4, "little") + b"\x00" * 10
    )
    with pytest.raises(ValueError):
        decode_webp(lossy)
    assert try_decode_image(lossy, "webp") is None
    with pytest.raises(ValueError):
        decode_webp(b"RIFF\x00\x00\x00\x00NOPE")
    good = encode_vp8l(_structured(6, 6))
    assert try_decode_image(good, "webp") is not None
    assert try_decode_image(good[:20], "webp") is None  # truncated
    # a bit flip may still decode (to different pixels) or fail — the
    # contract is array-or-None, never a stray exception
    flipped = bytearray(good)
    flipped[25] ^= 0xFF
    out = try_decode_image(bytes(flipped), "webp")
    assert out is None or (out.ndim == 3 and out.dtype == np.uint8)


def test_webp_through_spark_image_udfs(spark):
    from text_dedup_spark.functions.image_udf import (
        image_meta,
        phash_from_bytes_flagged,
    )

    rows = [
        ("w1", bytearray(encode_vp8l(_structured(16, 16), subtract_green=True)),
         "webp"),
        ("w2", bytearray(encode_vp8l(_structured(16, 16, nc=7),
                                     use_palette=True, lz77_runs=True)), "webp"),
    ]
    df = spark.createDataFrame(rows, "image_id string, bytes binary, fmt string")
    got = {
        r["image_id"]: r
        for r in df.withColumn("meta", image_meta("bytes", "fmt"))
        .withColumn("ph", phash_from_bytes_flagged("bytes", "fmt"))
        .select("image_id", "meta.*", "ph.*")
        .collect()
    }
    assert len(got) == 2
    for r in got.values():
        assert r["decode_ok"] and r["dec_w"] == 16 and r["dec_h"] == 16


# ---------------------------------------------------------- animated WebP


def test_webp_anim_roundtrip_and_video_path():
    from text_dedup_spark.functions.media_udf import decode_video_frames
    from text_dedup_spark.sources.vp8l import decode_webp_frames, encode_webp_anim

    frames = [RNG.randint(0, 256, (12, 10, 3)).astype(np.uint8) for _ in range(4)]
    d = encode_webp_anim(frames, cache_bits=4, lz77_runs=True)
    assert sniff_format(d) == "webp"
    got = decode_webp_frames(d)
    assert len(got) == 4
    assert all(np.array_equal(a, b) for a, b in zip(got, frames))
    gray = decode_video_frames(d)  # the video fingerprint entry point
    assert gray.shape == (4, 12, 10) and gray.dtype == np.uint8
    # still image passes through as a single frame
    still = decode_webp_frames(encode_vp8l(frames[0]))
    assert len(still) == 1 and np.array_equal(still[0], frames[0])


def test_webp_anim_subrect_blend_and_dispose():
    """Hand-built ANMF stream: frame 2 is a sub-rectangle overwrite at an
    offset; frame 3 tests dispose-to-background. Pixels are asserted
    against a manually composited canvas."""
    import struct as _s

    from text_dedup_spark.sources.vp8l import _walk_chunks, decode_webp_frames

    def vp8l_sub(img):
        whole = encode_vp8l(img)
        for tag, payload in _walk_chunks(whole):
            if tag == b"VP8L":
                sub = b"VP8L" + _s.pack("<I", len(payload)) + payload
                return sub + (b"\x00" if len(payload) % 2 else b"")
        raise AssertionError

    def anmf(img, x, y, flags):
        h, w = img.shape[:2]
        head = (
            (x // 2).to_bytes(3, "little")
            + (y // 2).to_bytes(3, "little")
            + (w - 1).to_bytes(3, "little")
            + (h - 1).to_bytes(3, "little")
            + (40).to_bytes(3, "little")
            + bytes([flags])
        )
        body = head + vp8l_sub(img)
        chunk = b"ANMF" + _s.pack("<I", len(body)) + body
        return chunk + (b"\x00" if len(body) % 2 else b"")

    base = RNG.randint(0, 256, (8, 8, 3)).astype(np.uint8)
    patch = RNG.randint(0, 256, (4, 4, 3)).astype(np.uint8)
    vp8x = bytes([0x02, 0, 0, 0]) + (7).to_bytes(3, "little") + (7).to_bytes(3, "little")
    chunks = b"VP8X" + _s.pack("<I", len(vp8x)) + vp8x
    chunks += anmf(base, 0, 0, 0x02)               # full frame, overwrite
    chunks += anmf(patch, 2, 4, 0x02)              # sub-rect overwrite
    chunks += anmf(patch, 0, 0, 0x02 | 0x01)       # overwrite + dispose
    data = b"RIFF" + _s.pack("<I", 4 + len(chunks)) + b"WEBP" + chunks

    f = decode_webp_frames(data)
    assert len(f) == 3
    assert np.array_equal(f[0], base)
    exp1 = base.copy()
    exp1[4:8, 2:6] = patch
    assert np.array_equal(f[1], exp1)
    exp2 = exp1.copy()
    exp2[0:4, 0:4] = patch
    assert np.array_equal(f[2], exp2)


def test_webp_anim_error_contract():
    from text_dedup_spark.sources.vp8l import decode_webp_frames, encode_webp_anim

    frames = [RNG.randint(0, 256, (6, 6, 3)).astype(np.uint8) for _ in range(2)]
    d = encode_webp_anim(frames)
    with pytest.raises(ValueError):
        decode_webp_frames(d[: len(d) - 10])  # truncated last frame
    with pytest.raises(ValueError):
        decode_webp_frames(b"RIFF\x00\x00\x00\x00NOPE")
