"""VP8 interframe (P-frame) decoder: pixel-level ground truths that are
independent of both the decoder and the bitstream writer.

- integer-MV / zero-residual P-frames must equal a numpy roll of the
  reference frame (nothing from the codec is involved in the oracle);
- subpel MVs must equal a direct 6-tap convolution implemented here from
  the RFC filter table (independent of vp8p's two-pass implementation);
- reference bookkeeping (golden refresh, copies, LAST chains) is checked
  by frame-equality across a planned sequence.

The bitstream writer (vp8_enc.encode_vp8_pframe) is an independent
spec-port of the WRITE direction: a table or layout disagreement between
writer and reader desynchronizes the boolean decoder (garbage pixels /
exceptions), it cannot cancel out.
"""

from __future__ import annotations

import numpy as np
import pytest

from text_dedup_spark.sources.vp8 import decode_vp8
from text_dedup_spark.sources.vp8_enc import (
    encode_vp8_frame,
    encode_vp8_pframe,
    encode_webp_lossy,
)
from text_dedup_spark.sources.vp8p import (
    SUBPEL_FILTERS,
    VP8SequenceDecoder,
    decode_ivf_vp8,
    write_ivf,
)

W, H = 80, 64  # 5 x 4 macroblocks


def _textured_keyframe(seed=11):
    rng = np.random.RandomState(seed)
    rgb = rng.randint(0, 256, size=(H, W, 3)).astype(np.uint8)
    payload = encode_webp_lossy(rgb, y_ac_qi=20)
    # strip the RIFF container: locate the VP8 chunk
    i = payload.index(b"VP8 ")
    sz = int.from_bytes(payload[i + 4 : i + 8], "little")
    return payload[i + 8 : i + 8 + sz]


def _inter(mode, **kw):
    d = {"mode": mode, "skip": True}
    d.update(kw)
    return d


def _decode_seq(frames):
    dec = VP8SequenceDecoder()
    return [dec.decode(f) for f in frames]


def test_zero_mv_skip_pframe_reproduces_reference_exactly():
    kf = _textured_keyframe()
    n_mb = (W // 16) * (H // 16)
    pf, _ = encode_vp8_pframe(W // 16, H // 16, [_inter("zero")] * n_mb)
    f0, f1 = _decode_seq([kf, pf])
    for a, b in zip(f0, f1):
        assert np.array_equal(a, b)


@pytest.mark.parametrize("dy,dx", [(1, 0), (0, 1), (2, 3), (-2, 1), (3, -3)])
def test_integer_mv_pframe_is_a_pure_shift(dy, dx):
    """All MBs NEWMV with one integer-pel motion vector, no residual, no
    loop filter: interior luma must equal ref shifted by (dy, dx) — the
    oracle is numpy slicing, no codec code involved."""
    kf = _textured_keyframe()
    n_mb = (W // 16) * (H // 16)
    mv = (8 * dy, 8 * dx)  # eighth-pel
    pf, _ = encode_vp8_pframe(W // 16, H // 16,
                              [_inter("new", mv=mv)] * n_mb)
    (y0, u0, v0), (y1, u1, v1) = _decode_seq([kf, pf])
    # VP8 MVs point INTO the reference: pred(x) = ref(x + mv)
    m = 8  # interior margin > |mv|
    assert np.array_equal(
        y1[m : H - m, m : W - m],
        y0[m + dy : H - m + dy, m + dx : W - m + dx],
    )
    if dy % 2 == 0 and dx % 2 == 0:
        cm = 4
        assert np.array_equal(
            u1[cm : H // 2 - cm, cm : W // 2 - cm],
            u0[cm + dy // 2 : H // 2 - cm + dy // 2,
               cm + dx // 2 : W // 2 - cm + dx // 2],
        )
        assert np.array_equal(
            v1[cm : H // 2 - cm, cm : W // 2 - cm],
            v0[cm + dy // 2 : H // 2 - cm + dy // 2,
               cm + dx // 2 : W // 2 - cm + dx // 2],
        )


def _sixtap_ref(plane, dy8, dx8):
    """Independent direct 6-tap interpolation of a whole plane displaced
    by an eighth-pel vector — single nested loop from the RFC table, no
    reuse of vp8p's windowed two-pass kernels."""
    iy, fy = dy8 >> 3, dy8 & 7
    ix, fx = dx8 >> 3, dx8 & 7
    p = np.pad(plane, 8, mode="edge").astype(np.int64)
    h, w = plane.shape
    out = np.zeros((h, w), np.int64)
    fh = SUBPEL_FILTERS[fx]
    fv = SUBPEL_FILTERS[fy]
    # horizontal pass on all rows we may touch vertically
    tmp = np.zeros((h + 5, w), np.int64)
    for r in range(h + 5):
        for c in range(w):
            src_r = 8 + iy + r - 2
            src_c = 8 + ix + c
            if fx:
                s = sum(fh[k] * p[src_r, src_c - 2 + k] for k in range(6))
                tmp[r, c] = min(255, max(0, (s + 64) >> 7))
            else:
                tmp[r, c] = p[src_r, src_c]
    for r in range(h):
        for c in range(w):
            if fy:
                s = sum(fv[k] * tmp[r + k, c] for k in range(6))
                out[r, c] = min(255, max(0, (s + 64) >> 7))
            else:
                out[r, c] = tmp[r + 2, c]
    return out.astype(np.uint8)


def test_subpel_mv_matches_independent_sixtap():
    kf = _textured_keyframe(seed=5)
    n_mb = (W // 16) * (H // 16)
    mv = (4, 6)  # half-pel rows, 6/8-pel cols
    pf, _ = encode_vp8_pframe(W // 16, H // 16,
                              [_inter("new", mv=mv)] * n_mb)
    (y0, _, _), (y1, _, _) = _decode_seq([kf, pf])
    expect = _sixtap_ref(y0, mv[0], mv[1])
    m = 8
    assert np.array_equal(y1[m : H - m, m : W - m],
                          expect[m : H - m, m : W - m])


def test_nearest_and_near_modes_inherit_neighbor_mvs():
    """Plant NEWMV (8, 8) in the first MB column; 'nearest' MBs to their
    right must decode as the SAME shift — verified on pixels, so an
    encoder/decoder survey disagreement cannot cancel out."""
    kf = _textured_keyframe(seed=7)
    mbw, mbh = W // 16, H // 16
    mv = (8, 8)
    mbs = []
    for y in range(mbh):
        for x in range(mbw):
            mbs.append(_inter("new", mv=mv) if x == 0 else _inter("nearest"))
    pf, resolved = encode_vp8_pframe(mbw, mbh, mbs)
    assert all(r[2][0] == mv for r in resolved)  # survey resolved to mv
    (y0, _, _), (y1, _, _) = _decode_seq([kf, pf])
    m = 8
    assert np.array_equal(
        y1[m : H - m, m : W - m], y0[m + 1 : H - m + 1, m + 1 : W - m + 1]
    )


def test_splitmv_per_quadrant_shifts():
    """SPLITMV with per-quadrant integer MVs: each luma quadrant shifts
    independently; chroma follows the (sum+4)>>3 average per 2x2 group."""
    kf = _textured_keyframe(seed=9)
    mbw, mbh = W // 16, H // 16
    mva, mvb = (16, 0), (0, 16)  # 2px down / 2px right
    submvs = []
    for b in range(16):
        r, c = b >> 2, b & 3
        submvs.append(mva if (r < 2) == (c < 2) else mvb)
    pf, _ = encode_vp8_pframe(mbw, mbh,
                              [_inter("split", split=submvs)] * (mbw * mbh))
    (y0, u0, v0), (y1, u1, v1) = _decode_seq([kf, pf])
    # checkerboard of quadrant shifts: verify one interior MB fully
    mbx, mby = 1, 1
    px, py = 16 * mbx, 16 * mby
    for b in range(16):
        r, c = b >> 2, b & 3
        dy, dx = (2, 0) if (r < 2) == (c < 2) else (0, 2)
        got = y1[py + 4 * r : py + 4 * r + 4, px + 4 * c : px + 4 * c + 4]
        exp = y0[py + 4 * r + dy : py + 4 * r + 4 + dy,
                 px + 4 * c + dx : px + 4 * c + 4 + dx]
        assert np.array_equal(got, exp), b
    # chroma quadrants are uniform: group avg == the quadrant mv halved
    cpx, cpy = 8 * mbx, 8 * mby
    for r in range(2):
        for c in range(2):
            dy, dx = (1, 0) if r == c else (0, 1)
            got = u1[cpy + 4 * r : cpy + 4 * r + 4,
                     cpx + 4 * c : cpx + 4 * c + 4]
            exp = u0[cpy + 4 * r + dy : cpy + 4 * r + 4 + dy,
                     cpx + 4 * c + dx : cpx + 4 * c + 4 + dx]
            assert np.array_equal(got, exp), (r, c)


def test_golden_refresh_copy_and_reference_selection():
    kf = _textured_keyframe(seed=13)
    mbw, mbh = W // 16, H // 16
    n = mbw * mbh
    shift = [_inter("new", mv=(8, 0))] * n
    zero = [_inter("zero")] * n
    # P1 shifts and refreshes golden; P2 shifts again off last; P3 reads
    # GOLDEN with zero mv -> must reproduce P1's frame, not P2's.
    p1, _ = encode_vp8_pframe(mbw, mbh, shift, refresh_golden=True)
    p2, _ = encode_vp8_pframe(mbw, mbh, shift)
    p3, _ = encode_vp8_pframe(
        mbw, mbh, [_inter("zero", ref="golden")] * n, refresh_last=False
    )
    f0, f1, f2, f3 = _decode_seq([kf, p1, p2, p3])
    assert np.array_equal(f3[0], f1[0]) and not np.array_equal(f3[0], f2[0])

    # copy_golden=1 (last -> golden) then read golden: equals prior last
    dec = VP8SequenceDecoder()
    dec.decode(kf)
    g1 = dec.decode(p1)  # refreshes last AND golden
    p4, _ = encode_vp8_pframe(mbw, mbh, shift, copy_golden=0)
    g2 = dec.decode(p4)  # last now g2, golden still g1
    p5, _ = encode_vp8_pframe(mbw, mbh, zero, copy_golden=1,
                              refresh_last=False)
    dec.decode(p5)  # golden := last (g2)
    p6, _ = encode_vp8_pframe(
        mbw, mbh, [_inter("zero", ref="golden")] * n, refresh_last=False
    )
    g3 = dec.decode(p6)
    assert np.array_equal(g3[0], g2[0]) and not np.array_equal(g3[0], g1[0])


def test_residual_coding_on_pframe():
    """NEWMV + planted residual levels: decoded = shift + dequant·IDCT.
    The IDCT/dequant machinery is the keyframe path already pinned against
    libwebp goldens; here we pin that the INTER residual add composes with
    MC (expected block computed test-side from the same public formulas)."""
    from text_dedup_spark.sources.vp8 import _idct4x4
    from text_dedup_spark.sources.vp8_tables import AC_QLOOKUP, DC_QLOOKUP

    kf = _textured_keyframe(seed=21)
    mbw, mbh = W // 16, H // 16
    n = mbw * mbh
    qi = 4
    mbs = [_inter("zero") for _ in range(n)]
    # one non-skipped MB with a single AC level in one luma block
    target = mbw + 1  # interior MB
    levels = [[0] * 16 for _ in range(16)]
    levels[5] = [0, 3, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0]
    mbs[target] = {"mode": "zero", "skip": False, "y": levels}
    pf, _ = encode_vp8_pframe(mbw, mbh, mbs, y_ac_qi=qi)
    (y0, _, _), (y1, _, _) = _decode_seq([kf, pf])
    # expected: block 5 of MB(1,1) = ref block + IDCT(dequantized levels)
    deq = [0] * 16
    deq[1] = 3 * AC_QLOOKUP[qi]  # zigzag position 1 -> natural position 1
    res = np.array(_idct4x4(deq), np.int32).reshape(4, 4)
    px, py = 16 * 1, 16 * 1
    br, bc = 5 >> 2, 5 & 3
    sl = np.s_[py + 4 * br : py + 4 * br + 4, px + 4 * bc : px + 4 * bc + 4]
    expect = np.clip(y0[sl].astype(np.int32) + res, 0, 255).astype(np.uint8)
    assert np.array_equal(y1[sl], expect)
    # everything outside the touched MB is untouched
    y1m = y1.copy()
    y1m[py : py + 16, px : px + 16] = y0[py : py + 16, px : px + 16]
    assert np.array_equal(y1m, y0)


def test_intra_mbs_inside_pframe_match_keyframe_prediction():
    """A P-frame whose MBs are all intra DC/TM skip must decode exactly
    like the keyframe carrying the same modes (keyframe path = libwebp-
    pinned)."""
    mbw, mbh = W // 16, H // 16
    n = mbw * mbh
    for ymode in (0, 3):  # DC_PRED, TM_PRED
        spec_kf = [{"ymode": ymode, "uvmode": 0, "skip": True}] * n
        kf_same = encode_vp8_frame(W, H, spec_kf)
        want = decode_vp8(kf_same)

        kf = _textured_keyframe(seed=3)
        pf, _ = encode_vp8_pframe(
            mbw, mbh,
            [{"intra": True, "ymode": ymode, "uvmode": 0, "skip": True}] * n,
        )
        _, got = _decode_seq([kf, pf])
        for a, b in zip(want, got):
            assert np.array_equal(a, b)


def test_loop_filtered_pframe_is_deterministic_and_bounded():
    kf = _textured_keyframe(seed=17)
    mbw, mbh = W // 16, H // 16
    pf, _ = encode_vp8_pframe(
        mbw, mbh, [_inter("new", mv=(8, 8))] * (mbw * mbh), filter_level=30
    )
    a = _decode_seq([kf, pf])[1]
    b = _decode_seq([kf, pf])[1]
    for pa, pb in zip(a, b):
        assert np.array_equal(pa, pb)
    # the filter is a smoothing pass: same shape, same dtype, new values
    pf0, _ = encode_vp8_pframe(
        mbw, mbh, [_inter("new", mv=(8, 8))] * (mbw * mbh), filter_level=0
    )
    c = _decode_seq([kf, pf0])[1]
    assert a[0].shape == c[0].shape and not np.array_equal(a[0], c[0])


def test_ivf_container_roundtrip_and_sequence_decode():
    kf = _textured_keyframe(seed=29)
    mbw, mbh = W // 16, H // 16
    n = mbw * mbh
    p1, _ = encode_vp8_pframe(mbw, mbh, [_inter("new", mv=(8, 0))] * n)
    p2, _ = encode_vp8_pframe(mbw, mbh, [_inter("new", mv=(0, 8))] * n)
    ivf = write_ivf(W, H, [kf, p1, p2])
    frames = decode_ivf_vp8(ivf)
    assert len(frames) == 3
    direct = _decode_seq([kf, p1, p2])
    for (ya, _, _), (yb, _, _) in zip(frames, direct):
        assert np.array_equal(ya, yb)
    # each P-frame really moved
    assert not np.array_equal(frames[0][0], frames[1][0])
    assert not np.array_equal(frames[1][0], frames[2][0])


def test_error_contract():
    with pytest.raises(ValueError):
        VP8SequenceDecoder().decode(b"\x01\x00\x00")  # inter before key
    with pytest.raises(ValueError):
        decode_ivf_vp8(b"nope")
    kf = _textured_keyframe()
    dec = VP8SequenceDecoder()
    dec.decode(kf)
    with pytest.raises(ValueError):
        dec.decode(b"\x03")  # too short


def test_ivf_vp8_feeds_video_fingerprint_pipeline():
    """decode_video_frames dispatches IVF VP8 (with P-frames) natively;
    a static clip (keyframe + two zero-MV P-frames) fingerprints exactly
    like the single-keyframe clip of the same content, and a moving clip
    diverges at the frame level."""
    from text_dedup_spark.functions.media_udf import (
        decode_video_frames,
        frames_fingerprint64,
    )

    kf = _textured_keyframe(seed=31)
    mbw, mbh = W // 16, H // 16
    n = mbw * mbh
    pz, _ = encode_vp8_pframe(mbw, mbh, [_inter("zero")] * n)
    pm, _ = encode_vp8_pframe(mbw, mbh, [_inter("new", mv=(16, 16))] * n)

    static = decode_video_frames(write_ivf(W, H, [kf, pz, pz]))
    single = decode_video_frames(write_ivf(W, H, [kf]))
    moving = decode_video_frames(write_ivf(W, H, [kf, pm, pm]))
    assert static.shape == (3, H, W) and single.shape == (1, H, W)
    assert np.array_equal(static[0], static[2])
    assert frames_fingerprint64(static) == frames_fingerprint64(single)
    assert not np.array_equal(moving[0], moving[1])


def test_ivf_mangle_fuzz_flag_safety():
    """Flag-policy contract at the media boundary: a mangled IVF VP8
    stream either decodes to frames or raises ValueError /
    NotImplementedError from decode_video_frames — never any other
    exception class (one corrupt row must not kill a Spark task)."""
    import random

    from text_dedup_spark.functions.media_udf import decode_video_frames

    kf = _textured_keyframe(seed=37)
    mbw, mbh = W // 16, H // 16
    n = mbw * mbh
    p1, _ = encode_vp8_pframe(mbw, mbh, [_inter("new", mv=(8, 8))] * n)
    good = write_ivf(W, H, [kf, p1])
    rng = random.Random(4242)
    outcomes = {"ok": 0, "flagged": 0}
    for _ in range(60):
        buf = bytearray(good)
        for _ in range(rng.randint(1, 6)):
            buf[rng.randrange(len(buf))] = rng.randrange(256)
        try:
            frames = decode_video_frames(bytes(buf))
            assert frames.ndim == 3
            outcomes["ok"] += 1
        except (ValueError, NotImplementedError):
            outcomes["flagged"] += 1
    assert outcomes["ok"] + outcomes["flagged"] == 60
    # truncations, including mid-frame
    for cut in (0, 10, 33, len(good) // 2, len(good) - 3):
        try:
            decode_video_frames(bytes(good[:cut]))
        except (ValueError, NotImplementedError):
            pass


def test_webm_container_equals_ivf_of_same_payloads():
    """WebM (EBML) and IVF carrying the SAME VP8 payloads must decode to
    identical frame sequences — the container layer adds nothing."""
    from text_dedup_spark.functions.media_udf import decode_video_frames
    from text_dedup_spark.sources.webm import (
        decode_webm_vp8,
        parse_webm_vp8,
        write_webm_vp8,
    )

    kf = _textured_keyframe(seed=41)
    mbw, mbh = W // 16, H // 16
    n = mbw * mbh
    p1, _ = encode_vp8_pframe(mbw, mbh, [_inter("new", mv=(8, 0))] * n)
    p2, _ = encode_vp8_pframe(mbw, mbh, [_inter("new", mv=(0, 8))] * n)
    payloads = [kf, p1, p2]
    webm = write_webm_vp8(payloads)
    assert parse_webm_vp8(webm) == payloads
    via_webm = decode_webm_vp8(webm)
    via_ivf = decode_ivf_vp8(write_ivf(W, H, payloads))
    assert len(via_webm) == len(via_ivf) == 3
    for (ya, ua, va), (yb, ub, vb) in zip(via_webm, via_ivf):
        assert np.array_equal(ya, yb)
        assert np.array_equal(ua, ub)
        assert np.array_equal(va, vb)
    # media dispatch: magic-byte routing straight from the binary column
    frames = decode_video_frames(webm)
    assert frames.shape == (3, H, W)


def test_webm_error_contract():
    from text_dedup_spark.sources.webm import parse_webm_vp8, write_webm_vp8

    with pytest.raises(ValueError):
        parse_webm_vp8(b"\x1a\x45\xdf\xa3")  # truncated EBML
    with pytest.raises(ValueError):
        parse_webm_vp8(b"RIFFnope")
    # a WebM whose only track is not VP8
    good = write_webm_vp8([b"\x00" * 8])
    not_vp8 = good.replace(b"V_VP8", b"V_VP9")
    with pytest.raises(ValueError):
        parse_webm_vp8(not_vp8)
