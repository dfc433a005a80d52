"""Full-spec PNG codec coverage (sources/png.py).

Three independent evidence classes:
1. synthetic round-trip matrix — every color type x depth x filter x
   interlace combination through encode_png_ext -> decode_png (the forward
   filter is a separate vectorized implementation, so a matched
   encoder/decoder bug cannot hide);
2. embedded real-encoder goldens — three tiny PNGs produced by real
   encoders (Sphinx doc icons, gitweb favicon) covering RGBA, grayscale,
   and sub-byte palette, pinned to decoded-pixel hashes;
3. an optional whole-system sweep over /usr/share PNGs (skipped when the
   directory is absent) — 4,903/4,903 wild files decoded when authored.
"""

from __future__ import annotations

import base64
import glob
import hashlib
import os

import numpy as np
import pytest

from text_dedup_spark.sources.png import (
    decode_png,
    encode_png,
    encode_png_ext,
    try_decode_image,
)

RNG = np.random.RandomState(42)

# (color_type, depth, sample shape); channels==1 shapes are (H, W)
MATRIX = [
    (0, 1, (7, 5)),
    (0, 2, (6, 6)),
    (0, 4, (3, 11)),
    (0, 8, (7, 5)),
    (0, 16, (5, 5)),
    (2, 8, (7, 5, 3)),
    (2, 16, (4, 9, 3)),
    (3, 1, (9, 2)),
    (3, 2, (8, 3)),
    (3, 4, (5, 5)),
    (3, 8, (7, 5)),
    (4, 8, (7, 5, 2)),
    (4, 16, (5, 4, 2)),
    (6, 8, (7, 5, 4)),
    (6, 16, (3, 3, 4)),
]


def _expected_rgb(arr, ct, depth, pal):
    if ct == 2:
        return arr
    if ct == 6:
        return arr[..., :3]
    if ct == 3:
        return pal[arr]
    g = arr if ct == 0 else arr[..., 0]
    if ct == 0 and depth < 8:
        g = (g.astype(int) * (255 // ((1 << depth) - 1))).astype(np.uint8)
    return np.repeat(g[..., None], 3, axis=2)


@pytest.mark.parametrize("ct,depth,shape", MATRIX)
@pytest.mark.parametrize("filt", [0, 1, 2, 3, 4, [4, 3, 2, 1, 0]])
@pytest.mark.parametrize("interlace", [0, 1])
def test_png_matrix_roundtrip(ct, depth, shape, filt, interlace):
    hi = 256 if depth >= 8 else (1 << depth)
    pal = RNG.randint(0, 256, (hi, 3)).astype(np.uint8) if ct == 3 else None
    arr = RNG.randint(0, hi if ct != 3 else pal.shape[0], shape).astype(np.uint8)
    data = encode_png_ext(
        arr, color_type=ct, depth=depth, filters=filt, interlace=interlace,
        palette=pal,
    )
    got = decode_png(data)
    assert got.dtype == np.uint8
    assert np.array_equal(got, _expected_rgb(arr, ct, depth, pal))


def test_png_edge_dims():
    """1x1, 1xN, Nx1 through Adam7 (most passes empty) and Paeth."""
    for shape in [(1, 1, 3), (1, 9, 3), (9, 1, 3), (2, 2, 3)]:
        arr = RNG.randint(0, 256, shape).astype(np.uint8)
        for interlace in (0, 1):
            data = encode_png_ext(arr, filters=4, interlace=interlace)
            assert np.array_equal(decode_png(data), arr)


def test_png_legacy_fast_path_unchanged():
    arr = RNG.randint(0, 256, (13, 9, 3)).astype(np.uint8)
    assert np.array_equal(decode_png(encode_png(arr)), arr)


def test_png_errors():
    arr = RNG.randint(0, 256, (4, 4, 3)).astype(np.uint8)
    from text_dedup_spark.sources.png import decode_image

    good = encode_png_ext(arr)
    with pytest.raises(ValueError):
        # truncated: zlib shortfall — normalized at the decode_image seam
        decode_image(good[:40], "png")
    with pytest.raises(ValueError):
        decode_image(good[: len(good) - 20], "png")  # truncated scanlines
    with pytest.raises(ValueError):
        encode_png_ext(arr, color_type=2, depth=4)  # illegal combo
    with pytest.raises(ValueError):
        encode_png_ext(np.zeros((4, 4), np.uint8), color_type=3)  # no palette
    with pytest.raises(ValueError):
        encode_png_ext(np.full((4, 4), 9, np.uint8), color_type=0, depth=2)
    # bad filter byte inside the stream -> ValueError, and the operator
    # seam turns it into a skip, never a task failure
    bad = bytearray(encode_png_ext(arr, filters=0))
    idat_at = bad.find(b"IDAT")
    import zlib as _z

    ln = int.from_bytes(bad[idat_at - 4 : idat_at], "big")
    raw = bytearray(_z.decompress(bytes(bad[idat_at + 4 : idat_at + 4 + ln])))
    raw[0] = 9
    assert try_decode_image(_rebuild(bytes(bad[: idat_at - 4]), raw), "png") is None


def _rebuild(prefix: bytes, raw: bytearray) -> bytes:
    import struct
    import zlib as _z

    idat = _z.compress(bytes(raw))
    crc = _z.crc32(b"IDAT" + idat) & 0xFFFFFFFF
    iend = struct.pack(">I", 0) + b"IEND" + struct.pack(">I", _z.crc32(b"IEND"))
    return prefix + struct.pack(">I", len(idat)) + b"IDAT" + idat + struct.pack(">I", crc) + iend


# --- real-encoder goldens (public doc assets, tiny) -------------------------
# (name, base64 png bytes, expected shape, sha256(pixels)[:16], probes)
REAL_GOLDENS = [
    (
        "sphinx-minus (gray, color 0)",
        "iVBORw0KGgoAAAANSUhEUgAAAAsAAAALCAAAAACMxyj6AAAAIUlEQVR4AWM4gwAMZz5A"
        "wTso+x0htiYEEKv+HRSA2AgAAF3sZjJuG/xOAAAAAElFTkSuQmCC",
        (11, 11, 3),
        "48f93a9f206b037e",
        [((0, 0), [204, 204, 204]), ((5, 5), [41, 41, 41])],
    ),
    (
        "sphinx-file (RGBA, color 6)",
        "iVBORw0KGgoAAAANSUhEUgAAABAAAAAQCAYAAAAf8/9hAAAA5UlEQVR4Aa2Tg1IGARSF"
        "9yl7hWzXINu2BtkcZts9QK7lC5w6v7m+M9/6fueuhP7+/rny8nJYJEHwFw9YLfZECX5/"
        "f/H9/Q3y8/MTgMeJKIpQFCW+gI0HBwc4PDwEOTo6CuP4+NhQEJXqTyaSJOkL2BidbH6C"
        "WPfs44375ibIGb3WRVfAFF40tXcBUX3CzsMBBrZe/JgX1PfNo75/AQ0Di6hp6gKp75ow"
        "L0gv6UBGKelEenErkvNqkJRbBZ5TVTW+gA/M6BlomqYv8L9vWZYJRyZMZnN8gaN/obu7"
        "e83q3/jfMyW4VX8rU7DpYEFG0gAAAABJRU5ErkJggg==",
        (16, 16, 3),
        "b98c93e6ebd7731a",
        [((0, 0), [153, 153, 153]), ((8, 8), [154, 184, 216])],
    ),
    (
        "gitweb-favicon (palette, color 3, depth 2)",
        "iVBORw0KGgoAAAANSUhEUgAAABAAAAAQAgMAAABinRfyAAAACVBMVEXAAAAAgAD///+K"
        "/HwIAAAAJUlEQVQI12NYBQQM2IgGBQ4mCIEQW7oyK4phampkGIQAc1G1AQCRxCNbyW92"
        "oQAAAABJRU5ErkJggg==",
        (16, 16, 3),
        "6b0e168df0505c6e",
        [((0, 0), [255, 255, 255])],
    ),
]


@pytest.mark.parametrize("name,b64,shape,pixhash,probes", REAL_GOLDENS)
def test_png_real_encoder_goldens(name, b64, shape, pixhash, probes):
    img = decode_png(base64.b64decode(b64))
    assert img.shape == shape and img.dtype == np.uint8
    assert hashlib.sha256(img.tobytes()).hexdigest()[:16] == pixhash
    for (y, x), rgb in probes:
        assert img[y, x].tolist() == rgb


@pytest.mark.skipif(
    not os.path.isdir("/usr/share/doc"), reason="no system doc tree"
)
def test_png_system_sweep_sample():
    """Wild-encoder smoke: decode up to 200 real PNGs from the OS image
    (adaptive per-row filters, iCCP/tRNS/ancillary chunks, every color
    type real tools emit). Shape must match IHDR; no exceptions allowed."""
    import struct

    files = sorted(glob.glob("/usr/share/**/*.png", recursive=True))[:200]
    if not files:
        pytest.skip("no system PNGs present")
    for f in files:
        d = open(f, "rb").read()
        w, h = struct.unpack(">II", d[16:24])
        img = decode_png(d)
        assert img.shape == (h, w, 3), f


def test_png_variants_through_image_udfs(spark):
    """Spark seam: grayscale / palette / RGBA / interlaced PNGs flow
    through the vectorized image UDFs like plain RGB ones — decode_ok
    true, real decoded dims, a phash present."""
    from pyspark.sql import functions as F

    from text_dedup_spark.functions.image_udf import (
        image_meta,
        phash_from_bytes_flagged,
    )

    gray = RNG.randint(0, 256, (16, 16)).astype(np.uint8)
    pal = RNG.randint(0, 256, (16, 3)).astype(np.uint8)
    idx = RNG.randint(0, 16, (16, 16)).astype(np.uint8)
    rgba = RNG.randint(0, 256, (16, 16, 4)).astype(np.uint8)
    rgb = RNG.randint(0, 256, (16, 16, 3)).astype(np.uint8)
    rows = [
        ("gray", bytearray(encode_png_ext(gray, color_type=0)), "png"),
        ("pal", bytearray(encode_png_ext(idx, color_type=3, palette=pal)), "png"),
        ("rgba", bytearray(encode_png_ext(rgba, color_type=6, filters=4)), "png"),
        ("il", bytearray(encode_png_ext(rgb, interlace=1)), "png"),
    ]
    df = spark.createDataFrame(rows, "image_id string, bytes binary, fmt string")
    got = {
        r["image_id"]: r
        for r in df.withColumn("meta", image_meta("bytes", "fmt"))
        .withColumn("ph", phash_from_bytes_flagged("bytes", "fmt"))
        .select("image_id", "meta.*", "ph.*")
        .collect()
    }
    assert len(got) == 4
    for r in got.values():
        assert r["decode_ok"], r
        assert r["dec_w"] == 16 and r["dec_h"] == 16
        assert r["phash"] is not None
