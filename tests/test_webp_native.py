"""Reference-decoder validation of the pure-Python VP8L codec, plus the
env-gated lossy-WebP path (sources/webp_native.py, system libwebp).

These are the strongest oracles the WebP surface has:
- ENCODER CONFORMANCE: streams written by encode_vp8l must decode
  bit-exactly through the real libwebp — a matched encoder/decoder bug
  in the pure-Python pair cannot survive this;
- DECODER AGREEMENT: decode_webp must agree with libwebp on those same
  streams;
- ALPHA PARITY: decode_alpha_vp8l must match libwebp's alpha channel
  pixel-exactly on a REAL lossy file's ALPH chunk;
- LOSSY PATH: the real python.webp (VP8 + ALPH) decodes through the
  native fallback and its pixels match the SAME logo shipped as
  python.tiff (cross-asset PSNR over opaque pixels).

All skipped cleanly when the platform has no libwebp.
"""

from __future__ import annotations

import base64
import itertools
import math

import numpy as np
import pytest

from text_dedup_spark.sources.vp8l import (
    decode_alpha_vp8l,
    decode_webp,
    encode_vp8l,
)
from text_dedup_spark.sources.webp_native import available, decode_webp_native

pytestmark = pytest.mark.skipif(
    not available(), reason="system libwebp not present"
)

def _structured(h, w, nc=256):
    base = np.zeros((h, w, 3), np.uint8)
    for c in range(3):
        base[..., c] = (
            np.arange(w)[None, :] * 3 + np.arange(h)[:, None] * 5 + c * 40
        ) % nc * (255 // max(nc - 1, 1))
    base[h // 3 : h // 2, :, :] = 200
    return base


def test_encoder_conformance_and_decoder_agreement_vs_libwebp():
    fails = []
    for sg, pred, cb, lz, pal in itertools.product(
        [False, True], [None, 1, 11, 13], [0, 6], [False, True], [False, True]
    ):
        if pal and (sg or pred is not None):
            continue
        a = _structured(13, 17, nc=7 if pal else 256)
        d = encode_vp8l(
            a,
            subtract_green=sg,
            predictor_mode=pred,
            cache_bits=cb,
            lz77_runs=lz,
            use_palette=pal,
        )
        ref = decode_webp_native(d)
        mine = decode_webp(d)
        if not (np.array_equal(ref[..., :3], a) and np.array_equal(mine, a)):
            fails.append((sg, pred, cb, lz, pal))
    assert not fails, fails


def _real_webp_and_tiff():
    from tests.test_tiff import REAL_TIFF_B64

    # the webp twin of the embedded tiff asset, from the same CPython dir
    import glob

    for f in glob.glob("/root/.pyenv/versions/*/lib/python*/test/test_email/data/python.webp"):
        return open(f, "rb").read(), base64.b64decode(REAL_TIFF_B64)
    pytest.skip("real python.webp asset not present")


def test_real_lossy_webp_decodes_and_matches_tiff_logo():
    webp, tiff = _real_webp_and_tiff()
    rgba = decode_webp_native(webp)
    assert rgba.shape == (16, 16, 4)
    raw = np.frombuffer(tiff, np.uint8, 16 * 16 * 4, 8).reshape(16, 16, 4)
    mask = (rgba[..., 3] > 200) & (raw[..., 3] > 200)
    assert int(mask.sum()) > 100
    diff = rgba[..., :3].astype(float)[mask] - raw[..., :3].astype(float)[mask]
    mse = float((diff ** 2).mean())
    psnr = 20 * math.log10(255) - 10 * math.log10(mse)
    # same logo, heavily lossy-compressed + independently rendered:
    # well above the ~10 dB of unrelated images (measured 22.4 dB)
    assert psnr >= 18.0, psnr


def test_alpha_decode_matches_libwebp_exactly():
    webp, _ = _real_webp_and_tiff()
    rgba = decode_webp_native(webp)
    pos = 12
    while webp[pos : pos + 4] != b"ALPH":
        ln = int.from_bytes(webp[pos + 4 : pos + 8], "little")
        pos += 8 + ln + (ln & 1)
    ln = int.from_bytes(webp[pos + 4 : pos + 8], "little")
    mine = decode_alpha_vp8l(webp[pos + 9 : pos + 8 + ln], 16, 16)
    assert np.array_equal(mine, rgba[..., 3])


def test_lossy_webp_through_decode_image_seam():
    """fmt='webp' lossy rows decode end-to-end (native fallback) instead
    of flag-skipping when libwebp is present."""
    from text_dedup_spark.sources.png import decode_image, try_decode_image

    webp, _ = _real_webp_and_tiff()
    img = decode_image(webp, "webp")
    assert img.shape == (16, 16, 3) and img.dtype == np.uint8
    assert try_decode_image(webp, "webp") is not None
    assert try_decode_image(webp[:30], "webp") is None  # still flag-safe
