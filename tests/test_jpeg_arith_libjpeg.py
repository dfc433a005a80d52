"""Arithmetic-JPEG (SOF9) cross-validation against the SYSTEM libjpeg
(VERDICT r4 next-round #2) — the matched-bug killer: until this file, the
engine's T.81 QM coder had only been verified against libjpeg's exported
state TABLE, never against a libjpeg-produced STREAM.

The exact oracle is coefficient-level transcoding (tools/jpeg_harness.c):
``jpeg_read_coefficients -> jpeg_write_coefficients`` rewrites only the
entropy layer, so an engine decode of the input and of the transcoded
output must be BIT-IDENTICAL — any divergence in either arithmetic coder
(statistics bins, conditioning, renormalization, byte stuffing, restart
resync) breaks the equality. Pixel-level tolerance checks then cover the
full decode paths, with libjpeg switched to box chroma upsampling (the
engine's method; its default triangular filter differs by design).

Env-gated: skipped when gcc or jpeglib.h is absent (the harness compiles
on first use per session). Reference anchor: the reference repo has no
image surface at all; this guards the beyond-parity codec tier.
"""

from __future__ import annotations

import os
import shutil
import struct
import subprocess

import numpy as np
import pytest

from text_dedup_spark.sources.jpeg import (
    decode_jpeg_baseline,
    encode_jpeg_arith,
    encode_jpeg_baseline,
)

_SRC = os.path.join(os.path.dirname(__file__), "..", "tools", "jpeg_harness.c")

pytestmark = pytest.mark.skipif(
    shutil.which("gcc") is None or not os.path.exists("/usr/include/jpeglib.h"),
    reason="system gcc + libjpeg headers not available",
)


@pytest.fixture(scope="module")
def harness(tmp_path_factory):
    exe = str(tmp_path_factory.mktemp("jh") / "jpeg_harness")
    subprocess.run(
        ["gcc", "-O2", "-o", exe, _SRC, "-ljpeg"], check=True,
        capture_output=True)
    return exe


def _run(harness, args, data: bytes) -> bytes:
    r = subprocess.run([harness, *args], input=data, capture_output=True)
    assert r.returncode == 0, r.stderr.decode()
    return r.stdout


def _markers(b: bytes) -> list[int]:
    return [b[i + 1] for i in range(len(b) - 1)
            if b[i] == 0xFF and b[i + 1] not in (0x00, 0xFF)]


def _libjpeg_pixels(harness, jpg: bytes) -> np.ndarray:
    d = _run(harness, ["decode", "0"], jpg)  # box upsampling (engine method)
    w, h, nc = struct.unpack("<III", d[:12])
    arr = np.frombuffer(d[12:], np.uint8)
    return arr.reshape(h, w) if nc == 1 else arr.reshape(h, w, nc)


def _test_image(color: bool) -> np.ndarray:
    rng = np.random.RandomState(3)
    base = np.add.outer(np.linspace(0, 200, 24), np.linspace(0, 255, 33)) / 2
    if not color:
        return (base + rng.randint(0, 40, (24, 33))).astype(np.uint8)
    return (base[:, :, None] + rng.randint(0, 60, (24, 33, 3))).astype(np.uint8)


@pytest.mark.parametrize("color,sub", [(False, "444"), (True, "444"), (True, "420")])
def test_libjpeg_arith_transcode_of_engine_huffman_bit_identical(
        harness, color, sub):
    """Engine Huffman stream -> libjpeg rewrites the entropy layer to
    arithmetic -> engine decodes BOTH to bit-identical pixels. Proves the
    engine's arithmetic DECODER consumes a genuine libjpeg-coded stream to
    the exact coefficients."""
    img = _test_image(color)
    huff = encode_jpeg_baseline(img, quant_scale=2, subsampling=sub)
    arith = _run(harness, ["transcode", "1"], huff)
    assert 0xC9 in _markers(arith)  # SOF9 out of libjpeg
    assert np.array_equal(decode_jpeg_baseline(huff),
                          decode_jpeg_baseline(arith))


@pytest.mark.parametrize("color,sub,rst", [
    (False, "444", 0), (True, "444", 0), (True, "420", 0), (True, "420", 2),
])
def test_libjpeg_reads_engine_arith_stream_bit_identical(
        harness, color, sub, rst):
    """Engine SOF9 stream -> libjpeg transcodes the entropy layer back to
    Huffman -> engine decodes both to bit-identical pixels. Proves libjpeg
    parses the engine's arithmetic ENCODER output (incl. restart-marker
    resync) to the exact coefficients."""
    img = _test_image(color)
    ar = encode_jpeg_arith(
        img, quant_scale=2, subsampling=sub, restart_interval=rst)
    hf = _run(harness, ["transcode", "0"], ar)
    assert 0xC9 not in _markers(hf)
    assert np.array_equal(decode_jpeg_baseline(ar), decode_jpeg_baseline(hf))


def test_arith_huff_arith_round_trip_stable(harness):
    """arith -> huff -> arith through libjpeg twice: still bit-identical
    under the engine decoder (no one-way coefficient drift)."""
    ar = encode_jpeg_arith(_test_image(True), quant_scale=2, subsampling="420")
    hf = _run(harness, ["transcode", "0"], ar)
    ar2 = _run(harness, ["transcode", "1"], hf)
    assert np.array_equal(decode_jpeg_baseline(ar), decode_jpeg_baseline(ar2))


@pytest.mark.parametrize("color,tol", [(False, 2), (True, 8)])
def test_engine_decodes_fresh_libjpeg_arith_encode(harness, color, tol):
    """A from-scratch libjpeg arithmetic encode (its own quant tables,
    default 4:2:0 for color) decodes in the engine within IDCT/YCbCr
    rounding of libjpeg's own pixel output. An entropy bug would explode
    this bound; measured gray diff is 1, color 6 (downsample-filter and
    fixed-point conversion differences)."""
    img = _test_image(color)
    nc = 3 if color else 1
    jpg = _run(harness,
               ["encode", str(img.shape[1]), str(img.shape[0]), str(nc),
                "85", "1"], img.tobytes())
    assert 0xC9 in _markers(jpg)
    eng = decode_jpeg_baseline(jpg)
    ref = _libjpeg_pixels(harness, jpg)
    assert eng.shape == ref.shape
    assert int(np.abs(eng.astype(int) - ref.astype(int)).max()) <= tol


def test_libjpeg_decodes_engine_arith_pixels(harness):
    """libjpeg's full pixel decode of an engine SOF9 stream agrees with
    the engine's own decode within rounding (both on box upsampling)."""
    img = _test_image(True)
    ar = encode_jpeg_arith(img, quant_scale=2, subsampling="420")
    eng = decode_jpeg_baseline(ar)
    ref = _libjpeg_pixels(harness, ar)
    assert int(np.abs(eng.astype(int) - ref.astype(int)).max()) <= 4
