"""Pure-Python VP8 (lossy WebP) decoder vs the system libwebp oracle.

Three evidence classes:
- TABLE PARITY: every constant in sources/vp8_tables.py matches the
  bytes the conformance decoder (libwebp) ships — re-extracted live
  from the platform binary by tools/extract_vp8_tables.py.
- DECODE PARITY (libwebp-gated): bitstreams produced by libwebp's own
  encoder decode BIT-EXACTLY (YUV-plane level) through the pure-Python
  decoder, across sizes that exercise every border convention and
  qualities that exercise every quantizer/filter-level regime; plus
  CRAFTED streams from the pure-Python mini encoder (vp8_enc.py) that
  pin syntax paths libwebp's encoder never emits (the simple loop
  filter, every sharpness level, chosen mode/residual combinations) —
  libwebp and vp8.py must agree on those too.
- SELF-CONTAINED goldens (no libwebp needed): crafted encoder->decoder
  round trips with pinned output hashes, ALPH filter algebra, and the
  error contract.
"""

from __future__ import annotations

import hashlib
import itertools

import numpy as np
import pytest

from text_dedup_spark.sources import vp8_tables as T
from text_dedup_spark.sources.vp8 import B_PRED, decode_vp8, yuv420_to_rgb
from text_dedup_spark.sources.vp8_enc import encode_vp8_frame, wrap_webp
from text_dedup_spark.sources.webp_native import available

needs_libwebp = pytest.mark.skipif(
    not available(), reason="system libwebp not present"
)


def _ref_yuv(webp_bytes: bytes):
    from text_dedup_spark.sources.webp_native import decode_webp_yuv_native

    return decode_webp_yuv_native(webp_bytes)


def _assert_planes_equal(ref, mine, label=""):
    for name, a, b in zip("YUV", ref, mine):
        assert a.shape == b.shape, (label, name, a.shape, b.shape)
        assert np.array_equal(a, b), (
            label,
            name,
            int(np.abs(a.astype(int) - b.astype(int)).max()),
        )


@needs_libwebp
def test_tables_match_reference_decoder_bytes():
    from tools.extract_vp8_tables import _libwebp_path, extract

    path = _libwebp_path()
    if path is None:
        pytest.skip("libwebp loaded via dlopen but file path not found")
    got = extract(open(path, "rb").read())
    assert got["KF_BMODE_PROB"] == T.KF_BMODE_PROB
    assert got["COEFF_PROBS"] == T.COEFF_PROBS
    assert got["COEFF_UPDATE_PROBS"] == T.COEFF_UPDATE_PROBS
    assert got["DC_QLOOKUP"] == T.DC_QLOOKUP
    assert got["AC_QLOOKUP"] == T.AC_QLOOKUP
    assert got["ZIGZAG"] == T.ZIGZAG
    assert got["CAT3"] == T.CAT3
    assert got["CAT4"] == T.CAT4
    assert got["CAT5"] == T.CAT5
    assert got["CAT6"] == T.CAT6


def test_table_shapes_and_ranges():
    assert len(T.COEFF_PROBS) == 4
    assert all(len(b) == 8 for b in T.COEFF_PROBS)
    assert all(len(c) == 3 for b in T.COEFF_PROBS for c in b)
    assert all(
        len(p) == 11 and all(1 <= x <= 255 for x in p)
        for b in T.COEFF_PROBS
        for c in b
        for p in c
    )
    assert len(T.KF_BMODE_PROB) == 10
    assert all(len(r) == 10 for r in T.KF_BMODE_PROB)
    assert len(T.DC_QLOOKUP) == len(T.AC_QLOOKUP) == 128
    assert sorted(T.ZIGZAG) == list(range(16))
    assert T.COEFF_BANDS[4] == 6 and T.COEFF_BANDS[15] == 7


# ---------------------------------------------------------------------------
# libwebp-gated decode parity
# ---------------------------------------------------------------------------


@needs_libwebp
def test_yuv_parity_on_libwebp_encodes():
    """libwebp-encoded streams across sizes (every border convention:
    MB-multiple, odd crops, single-MB, wide/tall) and the full quality
    range (q5 = strong loop filter + hev, q100 = filter off, dense
    tokens) reconstruct bit-exactly at the YUV level."""
    from text_dedup_spark.sources.webp_native import encode_webp_lossy_native

    rng = np.random.default_rng(11)
    for (h, w), q in itertools.product(
        [(16, 16), (32, 48), (17, 23), (31, 13), (64, 64)],
        [5, 35, 75, 100],
    ):
        kind = (h + w + q) % 3
        if kind == 0:
            img = rng.integers(0, 256, (h, w, 3), np.uint8)
        elif kind == 1:
            img = np.zeros((h, w, 3), np.uint8)
            for c in range(3):
                img[..., c] = (
                    np.arange(w)[None, :] * 3 + np.arange(h)[:, None] * 5 + 40 * c
                ) % 256
        else:
            img = (rng.integers(0, 256, (h, w, 3)).astype(int) // 2 + 60).astype(
                np.uint8
            )
        data = encode_webp_lossy_native(img, q)
        payload = _vp8_chunk(data)
        _assert_planes_equal(_ref_yuv(data), decode_vp8(payload), f"{h}x{w} q{q}")


def _vp8_chunk(data: bytes) -> bytes:
    i = 12
    while i < len(data):
        tag = data[i : i + 4]
        sz = int.from_bytes(data[i + 4 : i + 8], "little")
        if tag == b"VP8 ":
            return data[i + 8 : i + 8 + sz]
        i += 8 + sz + (sz & 1)
    raise AssertionError("no VP8 chunk")


@needs_libwebp
def test_crafted_mode_matrix_vs_libwebp():
    """Every 4x4 B-mode at every subblock position (borders and interior
    contexts), plus random mixed-mode MBs — libwebp and the pure-Python
    decoder must agree on streams neither of their encoders produced."""
    rng = np.random.default_rng(5)
    for m in range(10):
        sub = [0] * 16
        sub[(m * 7) % 16] = m
        mb = {"ymode": B_PRED, "sub": sub, "uvmode": m % 4, "skip": True}
        payload = encode_vp8_frame(16, 16, [mb])
        _assert_planes_equal(
            _ref_yuv(wrap_webp(payload)), decode_vp8(payload), f"mode{m}"
        )
    for trial in range(6):
        sub = rng.integers(0, 10, 16).tolist()
        mb = {
            "ymode": B_PRED,
            "sub": sub,
            "uvmode": int(rng.integers(0, 4)),
            "skip": True,
        }
        payload = encode_vp8_frame(16, 16, [mb])
        _assert_planes_equal(
            _ref_yuv(wrap_webp(payload)), decode_vp8(payload), f"mix{trial}"
        )


@needs_libwebp
def test_crafted_filter_matrix_vs_libwebp():
    """The normal AND simple loop filters at representative levels and
    every sharpness, over MBs with real residuals (inner edges active)
    — libwebp's encoder never emits the simple filter, so this is the
    only executable conformance evidence for that path."""
    rng = np.random.default_rng(21)
    for ftype, flevel, sharp in [
        (0, 5, 0), (0, 40, 0), (0, 63, 7), (0, 20, 3),
        (1, 5, 0), (1, 40, 0), (1, 63, 5), (1, 20, 2),
    ]:
        mbs = []
        for i in range(4):
            if i % 2 == 0:
                mbs.append(
                    {
                        "ymode": B_PRED,
                        "sub": rng.integers(0, 10, 16).tolist(),
                        "uvmode": int(rng.integers(0, 4)),
                        "y": [
                            [int(v) for v in rng.integers(-4, 5, 16)]
                            for _ in range(16)
                        ],
                        "uv": [
                            [int(v) for v in rng.integers(-3, 4, 16)]
                            for _ in range(8)
                        ],
                    }
                )
            else:
                mbs.append(
                    {
                        "ymode": int(rng.integers(0, 4)),
                        "uvmode": int(rng.integers(0, 4)),
                        "y2": [int(v) for v in rng.integers(-4, 5, 16)],
                        "y": [
                            [0] + [int(v) for v in rng.integers(-3, 4, 15)]
                            for _ in range(16)
                        ],
                        "uv": [
                            [int(v) for v in rng.integers(-2, 3, 16)]
                            for _ in range(8)
                        ],
                    }
                )
        payload = encode_vp8_frame(
            32, 32, mbs, y_ac_qi=40,
            filter_level=flevel, filter_type=ftype, sharpness=sharp,
        )
        _assert_planes_equal(
            _ref_yuv(wrap_webp(payload)),
            decode_vp8(payload),
            f"ftype{ftype} lvl{flevel} sh{sharp}",
        )


@needs_libwebp
def test_container_lossy_decode_matches_native_rgb_exactly():
    """decode_webp routes lossy VP8 through the pure decoder; its RGB
    output (fancy chroma upsampling + the studio-swing fixed-point
    matrix) is BIT-EXACT with libwebp's default WebPDecodeRGBA — the
    full container->pixels path, even dims and odd crops."""
    from text_dedup_spark.sources.vp8l import decode_webp
    from text_dedup_spark.sources.webp_native import (
        decode_webp_native,
        encode_webp_lossy_native,
    )

    rng = np.random.default_rng(2)
    for h, w in [(48, 64), (33, 29), (16, 16)]:
        img = np.zeros((h, w, 3), np.uint8)
        for c in range(3):
            img[..., c] = (
                np.arange(w)[None, :] * 3 + np.arange(h)[:, None] * 5 + 40 * c
            ) % 256
        if h == 33:
            img = rng.integers(0, 256, (h, w, 3)).astype(np.uint8)
        data = encode_webp_lossy_native(img, 80)
        mine = decode_webp(data)
        ref = decode_webp_native(data)[..., :3]
        assert np.array_equal(mine, ref), (h, w)


# ---------------------------------------------------------------------------
# self-contained goldens (run without libwebp)
# ---------------------------------------------------------------------------


def test_crafted_roundtrip_golden():
    """Deterministic crafted stream -> pinned decode hash.  The hash was
    produced while the stream ALSO decoded bit-exactly through libwebp
    (test_crafted_mode_matrix_vs_libwebp), so it pins conformance for
    environments without the native library."""
    mbs = [
        {
            "ymode": B_PRED,
            "sub": [0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 0, 2, 4, 6, 8, 1],
            "uvmode": 3,
            "y": [[(i * 7 + j * 3) % 9 - 4 for j in range(16)] for i in range(16)],
            "uv": [[(i + j) % 7 - 3 for j in range(16)] for i in range(8)],
        },
        {
            "ymode": 0,
            "uvmode": 1,
            "y2": [((i * 5) % 9) - 4 for i in range(16)],
            "y": [[0] + [(i - j) % 7 - 3 for j in range(15)] for i in range(16)],
            "uv": [[(2 * i + j) % 5 - 2 for j in range(16)] for i in range(8)],
        },
        {"ymode": 2, "uvmode": 0, "skip": True},
        {"ymode": B_PRED, "sub": [9] * 16, "uvmode": 2, "skip": True},
    ]
    payload = encode_vp8_frame(32, 32, mbs, y_ac_qi=30, filter_level=12)
    y, u, v = decode_vp8(payload)
    digest = hashlib.sha256(
        y.tobytes() + u.tobytes() + v.tobytes()
    ).hexdigest()
    if available():  # pin against the reference decoder when possible
        _assert_planes_equal(_ref_yuv(wrap_webp(payload)), (y, u, v), "golden")
    assert digest == GOLDEN_DIGEST, digest


GOLDEN_DIGEST = "8d1c23f97e2680ebb0f658bfbf07eeaa109c32ab4e88a826b64a5714cb672ade"


def _residual_mbs(rng, n, with_seg=False):
    mbs = []
    for i in range(n):
        if i % 3 == 0:
            mb = {
                "ymode": B_PRED,
                "sub": rng.integers(0, 10, 16).tolist(),
                "uvmode": int(rng.integers(0, 4)),
                "y": [[int(v) for v in rng.integers(-9, 10, 16)] for _ in range(16)],
                "uv": [[int(v) for v in rng.integers(-3, 4, 16)] for _ in range(8)],
            }
        else:
            mb = {
                "ymode": int(rng.integers(0, 4)),
                "uvmode": int(rng.integers(0, 4)),
                "y2": [int(v) for v in rng.integers(-6, 7, 16)],
                "y": [[0] + [int(v) for v in rng.integers(-5, 6, 15)] for _ in range(16)],
                "uv": [[int(v) for v in rng.integers(-3, 4, 16)] for _ in range(8)],
            }
        if with_seg:
            mb["seg"] = int(rng.integers(0, 4))
        mbs.append(mb)
    return mbs


@needs_libwebp
def test_multi_partition_tokens_vs_libwebp():
    """2/4/8 token partitions (MB row r -> partition r % n): the decoder
    must interleave partition bool-streams exactly — a path libwebp's
    encoder never produces for stills."""
    rng = np.random.default_rng(31)
    for n_parts in (2, 4, 8):
        mbs = _residual_mbs(rng, 16)
        payload = encode_vp8_frame(64, 64, mbs, y_ac_qi=40,
                                   filter_level=15, n_parts=n_parts)
        _assert_planes_equal(
            _ref_yuv(wrap_webp(payload)), decode_vp8(payload), f"parts{n_parts}"
        )


@needs_libwebp
def test_segmentation_vs_libwebp():
    """Per-MB segmentation with both delta and absolute per-segment
    quantizers and filter levels — exercises the segment-id tree, the
    per-segment dequant factors, and per-segment loop-filter strength."""
    rng = np.random.default_rng(33)
    for abs_mode, quant, lf in [
        (False, [60, 10, -20, 0], [10, -5, 20, 0]),
        (True, [20, 60, 100, 5], [5, 25, 50, 0]),
    ]:
        mbs = _residual_mbs(rng, 16, with_seg=True)
        payload = encode_vp8_frame(
            64, 64, mbs, y_ac_qi=50, filter_level=20,
            segments={"abs": abs_mode, "quant": quant, "lf": lf},
        )
        _assert_planes_equal(
            _ref_yuv(wrap_webp(payload)), decode_vp8(payload), f"seg abs={abs_mode}"
        )


def test_anim_lossy_frame_pure_python():
    """Animated WebP whose second frame is LOSSY VP8 (crafted by the
    pure-Python encoder) — the ANMF compositor must decode it without
    libwebp: frame 1 lossless base, frame 2 a full-canvas lossy
    overwrite that matches a standalone decode of the same payload."""
    import struct as _s

    from text_dedup_spark.sources.vp8_enc import encode_webp_lossy
    from text_dedup_spark.sources.vp8l import (
        _walk_chunks,
        decode_webp,
        decode_webp_frames,
        encode_vp8l,
    )

    rng = np.random.default_rng(12)
    base = rng.integers(0, 256, (16, 16, 3)).astype(np.uint8)
    lossy_whole = encode_webp_lossy(base, 10)
    expected_lossy = decode_webp(lossy_whole)

    def sub_chunk(container, want):
        for tag, payload in _walk_chunks(container):
            if tag == want:
                sub = tag + _s.pack("<I", len(payload)) + payload
                return sub + (b"\x00" if len(payload) % 2 else b"")
        raise AssertionError(want)

    def anmf(img_chunk, w, h):
        head = (
            (0).to_bytes(3, "little") * 2
            + (w - 1).to_bytes(3, "little")
            + (h - 1).to_bytes(3, "little")
            + (40).to_bytes(3, "little")
            + bytes([0x02])
        )
        body = head + img_chunk
        chunk = b"ANMF" + _s.pack("<I", len(body)) + body
        return chunk + (b"\x00" if len(body) % 2 else b"")

    vp8x = bytes([0x02, 0, 0, 0]) + (15).to_bytes(3, "little") + (
        15
    ).to_bytes(3, "little")
    chunks = b"VP8X" + _s.pack("<I", len(vp8x)) + vp8x
    chunks += anmf(sub_chunk(encode_vp8l(base), b"VP8L"), 16, 16)
    chunks += anmf(sub_chunk(lossy_whole, b"VP8 "), 16, 16)
    data = b"RIFF" + _s.pack("<I", 4 + len(chunks)) + b"WEBP" + chunks

    frames = decode_webp_frames(data)
    assert len(frames) == 2
    assert np.array_equal(frames[0][..., :3], base)
    assert np.array_equal(frames[1][..., :3], expected_lossy)


def test_mangle_fuzz_flag_safety():
    """Mangled lossy streams must feed the flag policy (None), never a
    stray exception — the same closed-exception-set contract every other
    codec in sources/ carries."""
    from text_dedup_spark.sources.png import try_decode_image
    from text_dedup_spark.sources.vp8_enc import encode_webp_lossy

    rng = np.random.default_rng(17)
    img = (rng.integers(0, 256, (32, 48, 3)).astype(int) // 2 + 50).astype(np.uint8)
    good = bytearray(encode_webp_lossy(img, 20))
    assert try_decode_image(bytes(good), "webp") is not None
    for trial in range(300):
        m = bytearray(good)
        op = trial % 3
        if op == 0:  # truncate
            m = m[: rng.integers(1, len(m))]
        elif op == 1:  # byte flips
            for _ in range(int(rng.integers(1, 8))):
                m[int(rng.integers(0, len(m)))] ^= int(rng.integers(1, 256))
        else:  # splice garbage
            at = int(rng.integers(0, len(m)))
            m[at : at + 8] = bytes(rng.integers(0, 256, 8).tolist())
        out = try_decode_image(bytes(m), "webp")
        assert out is None or isinstance(out, np.ndarray)


@needs_libwebp
def test_lossy_encoder_conformance_vs_libwebp():
    """Streams from the pure-Python lossy encoder (real fDCT + quant +
    full token categories) decode identically through libwebp and
    vp8.py — encoder conformance at the strongest available bar."""
    from text_dedup_spark.sources.vp8_enc import encode_webp_lossy
    from text_dedup_spark.sources.vp8l import decode_webp
    from text_dedup_spark.sources.webp_native import decode_webp_native

    rng = np.random.default_rng(4)
    for (h, w), qi in [((48, 64), 4), ((33, 29), 24), ((16, 16), 80)]:
        img = (
            rng.integers(0, 256, (h, w, 3)).astype(int) // 2 + 60
        ).astype(np.uint8)
        data = encode_webp_lossy(img, qi)
        assert np.array_equal(
            decode_webp(data), decode_webp_native(data)[..., :3]
        ), (h, w, qi)


def test_lossy_encoder_roundtrip_quality_and_determinism():
    """Self-contained: smooth content encoded near-losslessly round-trips
    >= 40 dB (the pipeline's lossy fidelity bar), coarser quantizers
    degrade monotonically in size, and bytes are deterministic."""
    from text_dedup_spark.sources.vp8_enc import encode_webp_lossy
    from text_dedup_spark.sources.vp8l import decode_webp

    h, w = 48, 64
    img = np.zeros((h, w, 3), np.uint8)
    for c in range(3):
        img[..., c] = np.clip(
            60 + np.arange(w)[None, :] + np.arange(h)[:, None] + 20 * c, 0, 255
        )
    d1 = encode_webp_lossy(img, 4)
    assert d1 == encode_webp_lossy(img, 4)  # deterministic
    out = decode_webp(d1).astype(np.float64)
    mse = ((out - img.astype(np.float64)) ** 2).mean()
    assert 10 * np.log10(255.0**2 / mse) >= 40.0
    d2 = encode_webp_lossy(img, 90)
    assert len(d2) < len(d1)


def test_rgb_conversion_shape_and_range():
    mb = {"ymode": 3, "uvmode": 3, "skip": True}
    payload = encode_vp8_frame(16, 16, [mb])
    rgb = yuv420_to_rgb(*decode_vp8(payload))
    assert rgb.shape == (16, 16, 3) and rgb.dtype == np.uint8


def test_alph_filters_roundtrip():
    """All four ALPH filter modes invert correctly: apply the spec's
    forward filter to a plane, decode through decode_alph_chunk
    (compression method 0), and recover the original."""
    from text_dedup_spark.sources.vp8l import decode_alph_chunk

    rng = np.random.default_rng(9)
    plane = rng.integers(0, 256, (9, 7), np.uint8).astype(np.int32)
    h, w = plane.shape
    for filt in range(4):
        resid = np.zeros_like(plane)
        for y in range(h):
            for x in range(w):
                if x == 0 and y == 0:
                    p = 0
                elif y == 0:
                    p = plane[0, x - 1]
                elif x == 0:
                    p = plane[y - 1, 0]
                elif filt == 1:
                    p = plane[y, x - 1]
                elif filt == 2:
                    p = plane[y - 1, x]
                elif filt == 3:
                    g = plane[y, x - 1] + plane[y - 1, x] - plane[y - 1, x - 1]
                    p = min(255, max(0, g))
                else:
                    p = 0
                resid[y, x] = (plane[y, x] - p) & 0xFF
        raw = resid.astype(np.uint8).tobytes() if filt else plane.astype(np.uint8).tobytes()
        chunk = bytes([filt << 2]) + raw
        out = decode_alph_chunk(chunk, w, h)
        assert np.array_equal(out, plane.astype(np.uint8)), filt


def test_error_contract():
    with pytest.raises(ValueError):
        decode_vp8(b"\x00" * 4)
    with pytest.raises(ValueError):
        decode_vp8(b"\x00" * 3 + b"\x9d\x01\x2b" + b"\x00" * 16)  # bad start code
    mb = {"ymode": 0, "uvmode": 0, "skip": True}
    payload = encode_vp8_frame(16, 16, [mb])
    with pytest.raises(ValueError):
        decode_vp8(bytes([payload[0] | 1]) + payload[1:])  # non-keyframe bit
