"""Arithmetic-coded JPEG (SOF9): the T.81 Annex D QM coder + §F.2.4
statistics models (sources/jpeg_arith.py, sources/jpeg.py).

Evidence classes (same structure as the VP8 suite):
1. the embedded Table D.3 state machine is byte-verified against the
   system libjpeg's exported ``jpeg_aritab`` at import (and spot-pinned
   here against the spec's known rows);
2. coder-level round-trips: encoder and decoder are separate
   implementations of the Annex D flowcharts — any disagreement in
   interval subdivision, conditional exchange, renormalization, byte
   stuffing, or carry resolution desynchronizes within a few decisions,
   exercised across random, skewed, and carry-adversarial patterns;
3. image-level: SOF9 streams decode PIXEL-IDENTICAL to the SOF0 Huffman
   path on the same coefficients (entropy layer is the only difference),
   across gray/RGB x subsampling x quant x restart markers, while
   compressing strictly smaller on noise;
4. stream invariants (every 0xFF byte is stuffed or a marker) and the
   flag policy for the still-unsupported SOF10 (progressive arithmetic).

No arithmetic-JPEG sample or third-party codec for it exists in this
sandbox; the libjpeg-backed table check is the external anchor, and a
real-encoder golden would slot in beside these tests when one does.
"""

from __future__ import annotations

import numpy as np
import pytest

from text_dedup_spark.sources.jpeg import (
    decode_jpeg_baseline,
    encode_jpeg_arith,
    encode_jpeg_baseline,
)
from text_dedup_spark.sources.jpeg_arith import (
    ARITH_STATES,
    FIXED_BIN,
    ArithDecoder,
    ArithEncoder,
    _verify_against_libjpeg,
)
from text_dedup_spark.sources.png import try_decode_image

RNG = np.random.RandomState(77)


def _roundtrip(bits, bins, nbins):
    enc = ArithEncoder()
    st = bytearray(nbins)
    for b, i in zip(bits, bins):
        enc.encode(st, int(i), int(b))
    data = enc.flush()
    dec = ArithDecoder(data + b"\xff\xd9", 0)
    st2 = bytearray(nbins)
    return data, [dec.decode(st2, int(i)) for i in bins]


def test_state_table_matches_spec_rows_and_libjpeg():
    # spec-known rows of Table D.3
    assert ARITH_STATES[0] == (0x5A1D, 1, 1, 1)
    assert ARITH_STATES[1] == (0x2586, 2, 14, 0)
    assert ARITH_STATES[14] == (0x5A7F, 15, 15, 1)
    assert ARITH_STATES[FIXED_BIN] == (0x5A1D, 113, 113, 0)
    assert len(ARITH_STATES) == 114
    _verify_against_libjpeg()  # raises on any drift vs the system table


def test_coder_roundtrip_random_and_skewed():
    for trial in range(25):
        n = RNG.randint(1, 4000)
        nbins = RNG.randint(1, 24)
        bits = RNG.randint(0, 2, n)
        bins = RNG.randint(0, nbins, n)
        _, got = _roundtrip(bits, bins, nbins)
        assert got == list(bits), f"trial {trial}"
    for p in (0.9999, 0.99, 0.7, 0.3, 0.01, 0.0001):
        bits = (RNG.rand(30000) < p).astype(int)
        data, got = _roundtrip(bits, np.zeros_like(bits), 1)
        assert got == list(bits), p
        # sanity: near-deterministic streams compress hard
        if p in (0.9999, 0.0001):
            assert len(data) < 100


def test_coder_stream_stuffing_invariant():
    """Every 0xFF in an entropy segment must be followed by a stuffed
    0x00 — otherwise a decoder would see a marker mid-stream. The 0.5-ish
    alternating pattern maximizes 0xFF production via carries."""
    seen_ff = 0
    for trial in range(10):
        bits = RNG.randint(0, 2, 20000)
        data, got = _roundtrip(bits, np.zeros_like(bits), 1)
        assert got == list(bits)
        i = 0
        while i < len(data):
            if data[i] == 0xFF:
                assert i + 1 < len(data) and data[i + 1] == 0x00, i
                seen_ff += 1
                i += 2
            else:
                i += 1
    assert seen_ff > 0  # the invariant was actually exercised


def test_fixed_bin_never_adapts():
    st = bytearray([FIXED_BIN])
    enc = ArithEncoder()
    for b in RNG.randint(0, 2, 500):
        enc.encode(st, 0, int(b))
    assert st[0] & 0x7F == FIXED_BIN and st[0] >> 7 == 0


@pytest.mark.parametrize("shape,sub,q,rst", [
    ((16, 16), "444", 1, 0),
    ((24, 17, 3), "444", 1, 0),
    ((32, 32, 3), "420", 2, 0),
    ((40, 23, 3), "420", 1, 3),
    ((64, 48, 3), "444", 3, 5),
    ((8, 8), "444", 4, 0),
])
def test_sof9_decodes_pixel_identical_to_huffman(shape, sub, q, rst):
    arr = RNG.randint(0, 256, shape).astype(np.uint8)
    ab = encode_jpeg_arith(arr, quant_scale=q, subsampling=sub,
                           restart_interval=rst)
    hb = encode_jpeg_baseline(arr, quant_scale=q, subsampling=sub,
                              restart_interval=rst)
    da = decode_jpeg_baseline(ab)
    dh = decode_jpeg_baseline(hb)
    assert np.array_equal(da, dh)
    # the QM coder's whole point: smaller entropy segments
    assert len(ab) < len(hb)
    # the pipeline path decodes it too (sniffs as jpeg)
    assert try_decode_image(ab, "jpeg") is not None


def test_smooth_image_fidelity():
    """Near-lossless quant on a smooth gradient: decoded pixels within
    the usual DCT rounding envelope."""
    y, x = np.mgrid[0:32, 0:48]
    arr = ((y * 3 + x * 2) % 256).astype(np.uint8)
    out = decode_jpeg_baseline(encode_jpeg_arith(arr, quant_scale=1))
    assert out.shape == (32, 48)
    assert np.max(np.abs(out.astype(int) - arr.astype(int))) <= 2


def test_flag_policy_sof10_and_corruption():
    arr = RNG.randint(0, 256, (16, 16, 3)).astype(np.uint8)
    data = bytearray(encode_jpeg_arith(arr))
    # flip SOF9 -> SOF10 (progressive arithmetic: still unsupported, must
    # raise NotImplementedError into the flag policy, not crash)
    i = bytes(data).find(b"\xff\xc9")
    data[i + 1] = 0xCA
    with pytest.raises(NotImplementedError):
        decode_jpeg_baseline(bytes(data))
    assert try_decode_image(bytes(data), "jpeg") is None
    # truncation never escapes the closed exception set
    good = encode_jpeg_arith(arr)
    for cut in (len(good) // 2, len(good) - 5):
        try_decode_image(good[:cut], "jpeg")  # any outcome but a stray raise