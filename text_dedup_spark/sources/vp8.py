"""Pure-Python VP8 keyframe (lossy WebP) decoder — RFC 6386.

Decodes the still-image subset of VP8 (every WebP ``VP8 `` chunk is a
keyframe by construction): boolean-arithmetic entropy decoding, keyframe
intra modes, token/coefficient decode with the RFC 6386 probability
model, dequantization, the 4x4 integer IDCT + Walsh-Hadamard transform,
all intra predictors (16x16, chroma 8x8, and the ten 4x4 B-modes with
VP8's border conventions), and the normal + simple in-loop deblocking
filters.  Output is the YUV 4:2:0 reconstruction, bit-exact with the
reference decoder (``tests/test_vp8.py`` asserts plane equality against
libwebp's ``WebPDecodeYUV`` on libwebp-encoded streams).

All constant tables come from ``vp8_tables.py`` (RFC 6386 constants,
byte-verified against the system libwebp).  This module exists so the
image-dedup pipeline can decode lossy WebP rows without any native
dependency; when libwebp is present it remains the test oracle only.

Scale note: decoding runs inside Arrow-batched pandas UDFs
(functions/image_udf.py), one row at a time within a batch — the
per-row cost is Python-level but embarrassingly parallel across
executors, and the decode stage is the measured hardware-ceiling stage
of the bench pipeline (BENCH/BASELINE.md).
"""

from __future__ import annotations

import numpy as np

from .vp8_tables import (
    AC_QLOOKUP,
    CAT1,
    CAT2,
    CAT3,
    CAT4,
    CAT5,
    CAT6,
    COEFF_BANDS,
    COEFF_PROBS,
    COEFF_UPDATE_PROBS,
    DC_QLOOKUP,
    KF_BMODE_PROB,
    KF_UV_MODE_PROB,
    KF_YMODE_PROB,
    ZIGZAG,
)

# 16x16 luma / chroma prediction modes.
DC_PRED, V_PRED, H_PRED, TM_PRED, B_PRED = 0, 1, 2, 3, 4
# 4x4 modes (indices into KF_BMODE_PROB).  NOTE: this is the reference
# decoder's (libwebp's) numbering — RD/VR/LD sit at 4/5/6 — because the
# extracted KF_BMODE_PROB context table and the mode tree below are laid
# out in that order (libvpx's enum permutes this trio differently).
(B_DC, B_TM, B_VE, B_HE, B_RD, B_VR, B_LD, B_VL, B_HD, B_HU) = range(10)

# Keyframe mode trees (RFC 6386 sec 8.2 / 11.5), leaves as ~mode.
_KF_YMODE_TREE = (-B_PRED, 2, 4, 6, -DC_PRED, -V_PRED, -H_PRED, -TM_PRED)
_UV_MODE_TREE = (-DC_PRED, 2, -V_PRED, 4, -H_PRED, -TM_PRED)
_BMODE_TREE = (
    -B_DC, 2, -B_TM, 4, -B_VE, 6, 8, 12, -B_HE, 10,
    -B_RD, -B_VR, -B_LD, 14, -B_VL, 16, -B_HD, -B_HU,
)
# Implied 4x4 context mode for a non-B_PRED keyframe neighbor.
_MODE_TO_BMODE = {DC_PRED: B_DC, V_PRED: B_VE, H_PRED: B_HE, TM_PRED: B_TM}

_CATS = (
    (5, CAT1), (7, CAT2), (11, CAT3), (19, CAT4), (35, CAT5), (67, CAT6),
)


class BoolDecoder:
    """RFC 6386 section 7 boolean arithmetic decoder."""

    __slots__ = ("data", "pos", "value", "range", "bit_count")

    def __init__(self, data: bytes):
        self.data = data
        b0 = data[0] if len(data) > 0 else 0
        b1 = data[1] if len(data) > 1 else 0
        self.value = (b0 << 8) | b1
        self.pos = 2
        self.range = 255
        self.bit_count = 0

    def get_bit(self, prob: int) -> int:
        split = 1 + (((self.range - 1) * prob) >> 8)
        big = split << 8
        if self.value >= big:
            bit = 1
            self.range -= split
            self.value -= big
        else:
            bit = 0
            self.range = split
        while self.range < 128:
            self.value <<= 1
            self.range <<= 1
            self.bit_count += 1
            if self.bit_count == 8:
                self.bit_count = 0
                if self.pos < len(self.data):
                    self.value |= self.data[self.pos]
                self.pos += 1
        return bit

    def get_flag(self) -> int:
        return self.get_bit(128)

    def get_literal(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.get_bit(128)
        return v

    def get_signed(self, n: int) -> int:
        v = self.get_literal(n)
        return -v if self.get_bit(128) else v

    def read_tree(self, tree, probs) -> int:
        i = 0
        while True:
            i = tree[i + self.get_bit(probs[i >> 1])]
            if i <= 0:
                return -i


def _clip127(q: int) -> int:
    return 0 if q < 0 else (127 if q > 127 else q)


def _iwht4x4(coeffs) -> list:
    """Inverse Walsh-Hadamard (RFC 6386 14.3) -> 16 Y-block DC values."""
    tmp = [0] * 16
    for i in range(4):
        a1 = coeffs[i] + coeffs[12 + i]
        b1 = coeffs[4 + i] + coeffs[8 + i]
        c1 = coeffs[4 + i] - coeffs[8 + i]
        d1 = coeffs[i] - coeffs[12 + i]
        tmp[i] = a1 + b1
        tmp[4 + i] = c1 + d1
        tmp[8 + i] = a1 - b1
        tmp[12 + i] = d1 - c1
    out = [0] * 16
    for i in range(4):
        r = 4 * i
        a1 = tmp[r] + tmp[r + 3]
        b1 = tmp[r + 1] + tmp[r + 2]
        c1 = tmp[r + 1] - tmp[r + 2]
        d1 = tmp[r] - tmp[r + 3]
        out[r] = (a1 + b1 + 3) >> 3
        out[r + 1] = (c1 + d1 + 3) >> 3
        out[r + 2] = (a1 - b1 + 3) >> 3
        out[r + 3] = (d1 - c1 + 3) >> 3
    return out


def _idct4x4(coeffs) -> list:
    """RFC 6386 14.3 inverse DCT (20091/35468 fixed-point), row-major 16."""
    tmp = [0] * 16
    for i in range(4):
        a1 = coeffs[i] + coeffs[8 + i]
        b1 = coeffs[i] - coeffs[8 + i]
        t1 = (coeffs[4 + i] * 35468) >> 16
        t2 = coeffs[12 + i] + ((coeffs[12 + i] * 20091) >> 16)
        c1 = t1 - t2
        t1 = coeffs[4 + i] + ((coeffs[4 + i] * 20091) >> 16)
        t2 = (coeffs[12 + i] * 35468) >> 16
        d1 = t1 + t2
        tmp[i] = a1 + d1
        tmp[12 + i] = a1 - d1
        tmp[4 + i] = b1 + c1
        tmp[8 + i] = b1 - c1
    out = [0] * 16
    for i in range(4):
        r = 4 * i
        a1 = tmp[r] + tmp[r + 2]
        b1 = tmp[r] - tmp[r + 2]
        t1 = (tmp[r + 1] * 35468) >> 16
        t2 = tmp[r + 3] + ((tmp[r + 3] * 20091) >> 16)
        c1 = t1 - t2
        t1 = tmp[r + 1] + ((tmp[r + 1] * 20091) >> 16)
        t2 = (tmp[r + 3] * 35468) >> 16
        d1 = t1 + t2
        out[r] = (a1 + d1 + 4) >> 3
        out[r + 3] = (a1 - d1 + 4) >> 3
        out[r + 1] = (b1 + c1 + 4) >> 3
        out[r + 2] = (b1 - c1 + 4) >> 3
    return out


class _Header:
    pass


def _parse_header(bd: BoolDecoder) -> _Header:
    h = _Header()
    h.color_space = bd.get_flag()
    h.clamping = bd.get_flag()

    h.segmentation = bd.get_flag()
    h.update_map = 0
    h.seg_tree_probs = [255, 255, 255]
    h.seg_abs = 0
    h.seg_quant = [0, 0, 0, 0]
    h.seg_lf = [0, 0, 0, 0]
    if h.segmentation:
        h.update_map = bd.get_flag()
        update_data = bd.get_flag()
        if update_data:
            h.seg_abs = bd.get_flag()
            for i in range(4):
                if bd.get_flag():
                    h.seg_quant[i] = bd.get_signed(7)
            for i in range(4):
                if bd.get_flag():
                    h.seg_lf[i] = bd.get_signed(6)
        if h.update_map:
            for i in range(3):
                if bd.get_flag():
                    h.seg_tree_probs[i] = bd.get_literal(8)

    h.filter_type = bd.get_flag()  # 1 = simple
    h.filter_level = bd.get_literal(6)
    h.sharpness = bd.get_literal(3)

    h.lf_delta = bd.get_flag()
    h.ref_lf_deltas = [0, 0, 0, 0]
    h.mode_lf_deltas = [0, 0, 0, 0]
    if h.lf_delta and bd.get_flag():
        for i in range(4):
            if bd.get_flag():
                h.ref_lf_deltas[i] = bd.get_signed(6)
        for i in range(4):
            if bd.get_flag():
                h.mode_lf_deltas[i] = bd.get_signed(6)

    h.n_parts = 1 << bd.get_literal(2)

    h.y_ac_qi = bd.get_literal(7)
    h.y1dc_delta = bd.get_signed(4) if bd.get_flag() else 0
    h.y2dc_delta = bd.get_signed(4) if bd.get_flag() else 0
    h.y2ac_delta = bd.get_signed(4) if bd.get_flag() else 0
    h.uvdc_delta = bd.get_signed(4) if bd.get_flag() else 0
    h.uvac_delta = bd.get_signed(4) if bd.get_flag() else 0

    # irrelevant for a still image; the sequence decoder (vp8p.py) needs it
    h.refresh_entropy = bd.get_flag()

    probs = [
        [[list(COEFF_PROBS[t][b][c]) for c in range(3)] for b in range(8)]
        for t in range(4)
    ]
    for t in range(4):
        for b in range(8):
            for c in range(3):
                row = probs[t][b][c]
                upd = COEFF_UPDATE_PROBS[t][b][c]
                for p in range(11):
                    if bd.get_bit(upd[p]):
                        row[p] = bd.get_literal(8)
    h.coeff_probs = probs

    h.mb_no_skip = bd.get_flag()
    h.prob_skip_false = bd.get_literal(8) if h.mb_no_skip else 0
    return h


def _dequant_factors(h: _Header):
    """Per-segment [y1, y2, uv] x [dc, ac] quantizer step sizes."""
    out = []
    for seg in range(4):
        if h.segmentation:
            q = h.seg_quant[seg] if h.seg_abs else h.y_ac_qi + h.seg_quant[seg]
        else:
            q = h.y_ac_qi
        q = _clip127(q)
        y1 = (DC_QLOOKUP[_clip127(q + h.y1dc_delta)], AC_QLOOKUP[q])
        y2dc = DC_QLOOKUP[_clip127(q + h.y2dc_delta)] * 2
        y2ac = (AC_QLOOKUP[_clip127(q + h.y2ac_delta)] * 101581) >> 16
        if y2ac < 8:
            y2ac = 8
        uvdc = DC_QLOOKUP[_clip127(q + h.uvdc_delta)]
        if uvdc > 132:
            uvdc = 132
        uv = (uvdc, AC_QLOOKUP[_clip127(q + h.uvac_delta)])
        out.append((y1, (y2dc, y2ac), uv))
    return out


def _get_coeffs(bd: BoolDecoder, probs_by_band, ctx: int, quant, first: int,
                out) -> int:
    """Token-decode one 4x4 block (RFC 6386 sec 13).

    Writes dequantized coefficients into ``out`` (natural order via
    zigzag) and returns the stop position n; the caller's nonzero
    context flag is (n > first).  ``probs_by_band[band][ctx]`` are the
    11 token probabilities; ``quant`` = (dc_step, ac_step).
    """
    n = first
    p = probs_by_band[COEFF_BANDS[n]][ctx]
    while n < 16:
        if not bd.get_bit(p[0]):
            return n  # EOB
        # zero run: after a zero token the EOB branch is skipped and the
        # context for the next token is 0.
        while not bd.get_bit(p[1]):
            n += 1
            if n == 16:
                return 16
            p = probs_by_band[COEFF_BANDS[n]][0]
        if not bd.get_bit(p[2]):
            v = 1
            nctx = 1
        else:
            nctx = 2
            if not bd.get_bit(p[3]):
                if not bd.get_bit(p[4]):
                    v = 2
                else:
                    v = 3 + bd.get_bit(p[5])
            else:
                if not bd.get_bit(p[6]):
                    if not bd.get_bit(p[7]):
                        base, cat = _CATS[0]
                    else:
                        base, cat = _CATS[1]
                else:
                    if not bd.get_bit(p[8]):
                        if not bd.get_bit(p[9]):
                            base, cat = _CATS[2]
                        else:
                            base, cat = _CATS[3]
                    else:
                        if not bd.get_bit(p[10]):
                            base, cat = _CATS[4]
                        else:
                            base, cat = _CATS[5]
                v = 0
                for cp in cat:
                    v = (v << 1) | bd.get_bit(cp)
                v += base
        if bd.get_bit(128):
            v = -v
        out[ZIGZAG[n]] = v * quant[1 if n > 0 else 0]
        n += 1
        if n == 16:
            return 16
        p = probs_by_band[COEFF_BANDS[n]][nctx]
    return 16


def _clamp_u8(v: int) -> int:
    return 0 if v < 0 else (255 if v > 255 else v)


def _pred_b(mode: int, A, AR, L, P: int):
    """4x4 intra predictors (RFC 6386 12.3).  A/AR/L are 4-pixel lists,
    P the above-left sample.  Returns a row-major 16-list."""
    B = [0] * 16
    if mode == B_DC:
        dc = (sum(A) + sum(L) + 4) >> 3
        return [dc] * 16
    if mode == B_TM:
        for r in range(4):
            base = L[r] - P
            for c in range(4):
                B[4 * r + c] = _clamp_u8(base + A[c])
        return B
    if mode == B_VE:
        e = (P, A[0], A[1], A[2], A[3], AR[0])
        row = [(e[c] + 2 * e[c + 1] + e[c + 2] + 2) >> 2 for c in range(4)]
        return row * 4
    if mode == B_HE:
        e = (P, L[0], L[1], L[2], L[3], L[3])
        for r in range(4):
            v = (e[r] + 2 * e[r + 1] + e[r + 2] + 2) >> 2
            B[4 * r : 4 * r + 4] = [v] * 4
        return B
    if mode == B_LD:
        e = A + AR
        for r in range(4):
            for c in range(4):
                i = r + c
                if i < 6:
                    B[4 * r + c] = (e[i] + 2 * e[i + 1] + e[i + 2] + 2) >> 2
                else:
                    B[4 * r + c] = (e[6] + 3 * e[7] + 2) >> 2
        return B
    # The remaining modes share the 9-sample edge [L3 L2 L1 L0 P A0..A3].
    e = (L[3], L[2], L[1], L[0], P, A[0], A[1], A[2], A[3])
    if mode == B_RD:
        for r in range(4):
            for c in range(4):
                i = 4 + c - r
                B[4 * r + c] = (e[i - 1] + 2 * e[i] + e[i + 1] + 2) >> 2
        return B
    if mode == B_VR:
        def s3(i):
            return (e[i - 1] + 2 * e[i] + e[i + 1] + 2) >> 2

        def a2(i):
            return (e[i] + e[i + 1] + 1) >> 1

        B[12] = s3(2)
        B[8] = s3(3)
        B[13] = B[4] = s3(4)
        B[9] = B[0] = a2(4)
        B[14] = B[5] = s3(5)
        B[10] = B[1] = a2(5)
        B[15] = B[6] = s3(6)
        B[11] = B[2] = a2(6)
        B[7] = s3(7)
        B[3] = a2(7)
        return B
    if mode == B_VL:
        e = A + AR

        def s3(i):
            return (e[i] + 2 * e[i + 1] + e[i + 2] + 2) >> 2

        def a2(i):
            return (e[i] + e[i + 1] + 1) >> 1

        B[0] = a2(0)
        B[4] = s3(0)
        B[8] = B[1] = a2(1)
        B[5] = B[12] = s3(1)
        B[9] = B[2] = a2(2)
        B[13] = B[6] = s3(2)
        B[3] = B[10] = a2(3)
        B[7] = B[14] = s3(3)
        B[11] = s3(4)
        B[15] = s3(5)
        return B
    if mode == B_HD:
        def s3(i):
            return (e[i - 1] + 2 * e[i] + e[i + 1] + 2) >> 2

        def a2(i):
            return (e[i] + e[i + 1] + 1) >> 1

        B[12] = a2(0)
        B[13] = s3(1)
        B[8] = B[14] = a2(1)
        B[9] = B[15] = s3(2)
        B[10] = B[4] = a2(2)
        B[11] = B[5] = s3(3)
        B[6] = B[0] = a2(3)
        B[7] = B[1] = s3(4)
        B[2] = s3(5)
        B[3] = s3(6)
        return B
    if mode == B_HU:
        B[0] = (L[0] + L[1] + 1) >> 1
        B[1] = (L[0] + 2 * L[1] + L[2] + 2) >> 2
        B[2] = B[4] = (L[1] + L[2] + 1) >> 1
        B[3] = B[5] = (L[1] + 2 * L[2] + L[3] + 2) >> 2
        B[6] = B[8] = (L[2] + L[3] + 1) >> 1
        B[7] = B[9] = (L[2] + 3 * L[3] + 2) >> 2
        B[10] = B[11] = B[12] = B[13] = B[14] = B[15] = L[3]
        return B
    raise ValueError(f"bad 4x4 mode {mode}")


def _pred_whole(plane, px: int, py: int, size: int, mode: int,
                have_above: bool, have_left: bool) -> np.ndarray:
    """16x16 / 8x8 whole-block intra prediction (RFC 6386 12.2) into an
    int32 array.  (px, py) index the block's top-left inside the padded
    plane (border row/col live at index-1 offsets)."""
    A = plane[py - 1, px : px + size].astype(np.int32)
    L = plane[py : py + size, px - 1].astype(np.int32)
    P = int(plane[py - 1, px - 1])
    if mode == DC_PRED:
        if have_above and have_left:
            dc = (int(A.sum()) + int(L.sum()) + size) >> (
                5 if size == 16 else 4
            )
        elif have_above:
            dc = (int(A.sum()) + (size >> 1)) >> (4 if size == 16 else 3)
        elif have_left:
            dc = (int(L.sum()) + (size >> 1)) >> (4 if size == 16 else 3)
        else:
            dc = 128
        return np.full((size, size), dc, np.int32)
    if mode == V_PRED:
        return np.tile(A, (size, 1))
    if mode == H_PRED:
        return np.tile(L[:, None], (1, size))
    if mode == TM_PRED:
        return np.clip(L[:, None] + A[None, :] - P, 0, 255)
    raise ValueError(f"bad whole-block mode {mode}")


def decode_vp8(data: bytes):
    """VP8 keyframe payload -> (y, u, v) uint8 planes (cropped).

    ``data`` is the raw contents of a WebP ``VP8 `` chunk.  Raises
    ValueError on malformed or non-keyframe input."""
    Y, U, V, _hdr, w, h = _decode_keyframe(data)
    y = Y[1 : h + 1, 1 : w + 1].copy()
    u = U[1 : (h + 1) // 2 + 1, 1 : (w + 1) // 2 + 1].copy()
    v = V[1 : (h + 1) // 2 + 1, 1 : (w + 1) // 2 + 1].copy()
    return y, u, v


def _decode_keyframe(data: bytes):
    """Keyframe decode returning the PADDED planes (1px prediction border,
    MB-aligned) plus header and frame dims — the form the interframe
    decoder (vp8p.py) needs for reference buffers."""
    if len(data) < 10:
        raise ValueError("VP8 payload too short")
    b0, b1, b2 = data[0], data[1], data[2]
    if b0 & 1:
        raise ValueError("not a keyframe (WebP stills must be keyframes)")
    part0_size = (b0 >> 5) | (b1 << 3) | (b2 << 11)
    if data[3:6] != b"\x9d\x01\x2a":
        raise ValueError("bad VP8 start code")
    w = (data[6] | (data[7] << 8)) & 0x3FFF
    h = (data[8] | (data[9] << 8)) & 0x3FFF
    if w == 0 or h == 0:
        raise ValueError("zero dimension")
    if 10 + part0_size > len(data):
        raise ValueError("truncated first partition")

    bd = BoolDecoder(data[10 : 10 + part0_size])
    hdr = _parse_header(bd)
    hdr.version = (b0 >> 1) & 7

    # Token partitions: (n-1) little-endian 3-byte sizes, then payloads.
    rest = data[10 + part0_size :]
    sizes_len = 3 * (hdr.n_parts - 1)
    if len(rest) < sizes_len:
        raise ValueError("truncated partition size table")
    offs = sizes_len
    parts = []
    for i in range(hdr.n_parts - 1):
        sz = rest[3 * i] | (rest[3 * i + 1] << 8) | (rest[3 * i + 2] << 16)
        parts.append(BoolDecoder(rest[offs : offs + sz]))
        offs += sz
    parts.append(BoolDecoder(rest[offs:]))

    mbw = (w + 15) >> 4
    mbh = (h + 15) >> 4
    quants = _dequant_factors(hdr)

    # --- pass 1: per-MB modes from partition 0 -------------------------
    # above/left 4x4-submode context rows for B_PRED decoding.
    above_sub = [[B_DC] * 4 for _ in range(mbw)]
    mbs = []
    for mb_y in range(mbh):
        left_sub = [B_DC] * 4
        for mb_x in range(mbw):
            seg = 0
            if hdr.update_map:
                p = hdr.seg_tree_probs
                if bd.get_bit(p[0]):
                    seg = 2 + bd.get_bit(p[2])
                else:
                    seg = bd.get_bit(p[1])
            skip = bd.get_bit(hdr.prob_skip_false) if hdr.mb_no_skip else 0
            ymode = bd.read_tree(_KF_YMODE_TREE, KF_YMODE_PROB)
            if ymode == B_PRED:
                sub = [0] * 16
                for r in range(4):
                    for c in range(4):
                        a = above_sub[mb_x][c] if r == 0 else sub[4 * (r - 1) + c]
                        l = left_sub[r] if c == 0 else sub[4 * r + c - 1]
                        m = bd.read_tree(_BMODE_TREE, KF_BMODE_PROB[a][l])
                        sub[4 * r + c] = m
                above_sub[mb_x] = sub[12:16]
                for r in range(4):
                    left_sub[r] = sub[4 * r + 3]
            else:
                m = _MODE_TO_BMODE[ymode]
                sub = [m] * 16
                above_sub[mb_x] = [m] * 4
                left_sub = [m] * 4
            uvmode = bd.read_tree(_UV_MODE_TREE, KF_UV_MODE_PROB)
            mbs.append((seg, skip, ymode, sub, uvmode))

    # --- pass 2: residuals from the token partitions --------------------
    # nonzero contexts: above per MB column, left per row.
    above_nz = [[0] * 9 for _ in range(mbw)]  # 4 Y, 2 U, 2 V, 1 Y2
    coeffs_all = []  # per MB: (y2 list|None, [16 x 16-list], [8 x 16-list])
    has_coeffs_all = []
    for mb_y in range(mbh):
        tbd = parts[mb_y % hdr.n_parts]
        left_nz = [0] * 9
        for mb_x in range(mbw):
            seg, skip, ymode, sub, uvmode = mbs[mb_y * mbw + mb_x]
            qy1, qy2, quv = quants[seg]
            anz = above_nz[mb_x]
            has_y2 = ymode != B_PRED
            if skip:
                coeffs_all.append(None)
                has_coeffs_all.append(False)
                for i in range(8):
                    anz[i] = 0
                    left_nz[i] = 0
                if has_y2:
                    anz[8] = 0
                    left_nz[8] = 0
                continue
            probs = hdr.coeff_probs
            any_nz = False
            y2 = None
            if has_y2:
                y2 = [0] * 16
                ctx = anz[8] + left_nz[8]
                n = _get_coeffs(tbd, probs[1], ctx, qy2, 0, y2)
                nz = 1 if n > 0 else 0
                anz[8] = left_nz[8] = nz
                any_nz = any_nz or nz
                first = 1
                ptbl = probs[0]
            else:
                first = 0
                ptbl = probs[3]
            yblocks = []
            for r in range(4):
                for c in range(4):
                    blk = [0] * 16
                    ctx = anz[c] + left_nz[r]
                    n = _get_coeffs(tbd, ptbl, ctx, qy1, first, blk)
                    nz = 1 if n > first else 0
                    anz[c] = left_nz[r] = nz
                    any_nz = any_nz or nz
                    yblocks.append(blk)
            uvblocks = []
            for pi in range(2):  # U then V
                for r in range(2):
                    for c in range(2):
                        blk = [0] * 16
                        ai = 4 + 2 * pi + c
                        li = 4 + 2 * pi + r
                        ctx = anz[ai] + left_nz[li]
                        n = _get_coeffs(tbd, probs[2], ctx, quv, 0, blk)
                        nz = 1 if n > 0 else 0
                        anz[ai] = left_nz[li] = nz
                        any_nz = any_nz or nz
                        uvblocks.append(blk)
            coeffs_all.append((y2, yblocks, uvblocks))
            has_coeffs_all.append(bool(any_nz))

    # --- pass 3: reconstruction -----------------------------------------
    W, H = mbw * 16, mbh * 16
    # planes padded: +1 border row/col (top=127, left=129), +4 right pad
    # on Y for the above-right samples.
    Y = np.empty((H + 1, W + 1 + 4), np.uint8)
    U = np.empty((H // 2 + 1, W // 2 + 1), np.uint8)
    V = np.empty_like(U)
    for pl in (Y, U, V):
        pl[0, :] = 127
        pl[1:, 0] = 129
    for mb_y in range(mbh):
        if mb_y > 0:
            # above-right pad for the rightmost MB: replicate above[15].
            Y[16 * mb_y, W + 1 :] = Y[16 * mb_y, W]
        for mb_x in range(mbw):
            idx = mb_y * mbw + mb_x
            seg, skip, ymode, sub, uvmode = mbs[idx]
            coeffs = coeffs_all[idx]
            px, py = 16 * mb_x + 1, 16 * mb_y + 1
            if ymode == B_PRED:
                above21 = Y[py - 1, px - 1 : px + 20].astype(np.int32)
                for r in range(4):
                    for c in range(4):
                        bx, by = px + 4 * c, py + 4 * r
                        if r == 0:
                            A = above21[1 + 4 * c : 5 + 4 * c].tolist()
                            P = int(above21[4 * c])
                            if c < 3:
                                AR = above21[5 + 4 * c : 9 + 4 * c].tolist()
                            else:
                                AR = above21[17:21].tolist()
                        else:
                            A = Y[by - 1, bx : bx + 4].astype(int).tolist()
                            P = int(Y[by - 1, bx - 1])
                            if c < 3:
                                AR = Y[by - 1, bx + 4 : bx + 8].astype(int).tolist()
                            else:
                                AR = above21[17:21].tolist()
                        L = Y[by : by + 4, bx - 1].astype(int).tolist()
                        pred = _pred_b(sub[4 * r + c], A, AR, L, P)
                        blk = np.array(pred, np.int32).reshape(4, 4)
                        if coeffs is not None:
                            res = coeffs[1][4 * r + c]
                            if any(res):
                                blk = blk + np.array(
                                    _idct4x4(res), np.int32
                                ).reshape(4, 4)
                        Y[by : by + 4, bx : bx + 4] = np.clip(blk, 0, 255)
            else:
                pred = _pred_whole(
                    Y, px, py, 16, ymode, mb_y > 0, mb_x > 0
                )
                if coeffs is not None:
                    y2, yblocks, _ = coeffs
                    dcs = _iwht4x4(y2)
                    out = pred
                    for r in range(4):
                        for c in range(4):
                            res = list(yblocks[4 * r + c])
                            res[0] = dcs[4 * r + c]
                            if any(res):
                                out[4 * r : 4 * r + 4, 4 * c : 4 * c + 4] += (
                                    np.array(_idct4x4(res), np.int32).reshape(4, 4)
                                )
                    Y[py : py + 16, px : px + 16] = np.clip(out, 0, 255)
                else:
                    Y[py : py + 16, px : px + 16] = pred
            # chroma
            cx, cy = 8 * mb_x + 1, 8 * mb_y + 1
            for pi, pl in enumerate((U, V)):
                pred = _pred_whole(pl, cx, cy, 8, uvmode, mb_y > 0, mb_x > 0)
                if coeffs is not None:
                    blocks = coeffs[2][4 * pi : 4 * pi + 4]
                    for r in range(2):
                        for c in range(2):
                            res = blocks[2 * r + c]
                            if any(res):
                                pred[4 * r : 4 * r + 4, 4 * c : 4 * c + 4] += (
                                    np.array(_idct4x4(res), np.int32).reshape(4, 4)
                                )
                pl[cy : cy + 8, cx : cx + 8] = np.clip(pred, 0, 255)

    # --- pass 4: loop filter ---------------------------------------------
    if hdr.filter_level > 0:
        _loop_filter(Y, U, V, hdr, mbs, has_coeffs_all, mbw, mbh)

    return Y, U, V, hdr, w, h


# --- loop filter (RFC 6386 sec 15) ---------------------------------------


def _c127(v: int) -> int:
    return -128 if v < -128 else (127 if v > 127 else v)


def _filter_levels(hdr: _Header):
    """Per-(segment, is_b_pred) -> (level, interior_limit, hev_thresh)."""
    out = {}
    for seg in range(4):
        if hdr.segmentation:
            lvl = hdr.seg_lf[seg] if hdr.seg_abs else (
                hdr.filter_level + hdr.seg_lf[seg]
            )
        else:
            lvl = hdr.filter_level
        for is_b in (False, True):
            f = lvl
            if hdr.lf_delta:
                f += hdr.ref_lf_deltas[0]  # keyframe: always intra
                if is_b:
                    f += hdr.mode_lf_deltas[0]
            f = 0 if f < 0 else (63 if f > 63 else f)
            il = f
            if hdr.sharpness:
                il >>= 2 if hdr.sharpness > 4 else 1
                if il > 9 - hdr.sharpness:
                    il = 9 - hdr.sharpness
            if il < 1:
                il = 1
            hev = 0
            if f >= 40:
                hev = 2
            elif f >= 15:
                hev = 1
            out[(seg, is_b)] = (f, il, hev)
    return out


def _normal_edge(plane, xs, ys, dx, dy, n, edge_limit, il, hev_t, mb_edge):
    """Filter one normal-filter edge of length n.  The edge separates
    pixel p0 at (ys+i*?? ) ... coordinates: for each i in range(n), the
    8 pixels are plane[ys + i*ty, xs + k*dx ...]."""
    for i in range(n):
        if dx:  # vertical edge: pixels along x, step across rows
            r, c = ys + i, xs
            px = [int(plane[r, c + k]) for k in range(-4, 4)]
        else:  # horizontal edge
            r, c = ys, xs + i
            px = [int(plane[r + k, c]) for k in range(-4, 4)]
        p3, p2, p1, p0, q0, q1, q2, q3 = px
        if (abs(p0 - q0) * 2 + (abs(p1 - q1) >> 1)) > edge_limit:
            continue
        if (
            abs(p3 - p2) > il or abs(p2 - p1) > il or abs(p1 - p0) > il
            or abs(q1 - q0) > il or abs(q2 - q1) > il or abs(q3 - q2) > il
        ):
            continue
        hev = abs(p1 - p0) > hev_t or abs(q1 - q0) > hev_t
        P2, P1, P0 = p2 - 128, p1 - 128, p0 - 128
        Q0, Q1, Q2 = q0 - 128, q1 - 128, q2 - 128
        if mb_edge and not hev:
            # wide 6-tap macroblock-edge filter (RFC 6386 15.3 filter_mb)
            wv = _c127(_c127(P1 - Q1) + 3 * (Q0 - P0))
            a = _c127((27 * wv + 63) >> 7)
            q0n, p0n = Q0 - a, P0 + a
            a = _c127((18 * wv + 63) >> 7)
            q1n, p1n = Q1 - a, P1 + a
            a = _c127((9 * wv + 63) >> 7)
            q2n, p2n = Q2 - a, P2 + a
            new = (p2n + 128, p1n + 128, p0n + 128,
                   q0n + 128, q1n + 128, q2n + 128)
            ks = (-3, -2, -1, 0, 1, 2)
        else:
            # common_adjust: outer tap (p1-q1) participates on hev (both
            # edge kinds; a hev mb-edge degrades to this narrow filter).
            a = _c127((_c127(P1 - Q1) if hev else 0) + 3 * (Q0 - P0))
            F1 = _c127(a + 4) >> 3
            F2 = _c127(a + 3) >> 3
            q0n, p0n = Q0 - F1, P0 + F2
            if not hev:  # subblock edge, low variance: spread to p1/q1
                F3 = (F1 + 1) >> 1
                q1n, p1n = Q1 - F3, P1 + F3
                new = (p1n + 128, p0n + 128, q0n + 128, q1n + 128)
                ks = (-2, -1, 0, 1)
            else:
                new = (p0n + 128, q0n + 128)
                ks = (-1, 0)
        for k, v in zip(ks, new):
            v = 0 if v < 0 else (255 if v > 255 else v)
            if dx:
                plane[ys + i, xs + k] = v
            else:
                plane[ys + k, xs + i] = v


def _simple_edge(plane, xs, ys, dx, n, limit):
    for i in range(n):
        if dx:
            r, c = ys + i, xs
            p1, p0, q0, q1 = (int(plane[r, c + k]) for k in range(-2, 2))
        else:
            r, c = ys, xs + i
            p1, p0, q0, q1 = (int(plane[r + k, c]) for k in range(-2, 2))
        if (abs(p0 - q0) * 2 + (abs(p1 - q1) >> 1)) > limit:
            continue
        P1, P0, Q0, Q1 = p1 - 128, p0 - 128, q0 - 128, q1 - 128
        a = _c127(_c127(P1 - Q1) + 3 * (Q0 - P0))
        F1 = _c127(a + 4) >> 3
        F2 = _c127(a + 3) >> 3
        p0n = _clamp_u8(P0 + F2 + 128)
        q0n = _clamp_u8(Q0 - F1 + 128)
        if dx:
            plane[r, c - 1] = p0n
            plane[r, c] = q0n
        else:
            plane[r - 1, c] = p0n
            plane[r, c] = q0n


def _loop_filter(Y, U, V, hdr, mbs, has_coeffs, mbw, mbh, mb_levels=None):
    """``mb_levels``: optional per-MB (f, il, hev, inner) list — the
    interframe decoder (vp8p.py) passes levels with reference-frame and
    mode loop-filter deltas applied; None = keyframe semantics from
    ``mbs``."""
    levels = _filter_levels(hdr) if mb_levels is None else None
    for mb_y in range(mbh):
        for mb_x in range(mbw):
            idx = mb_y * mbw + mb_x
            if mb_levels is None:
                seg, skip, ymode, sub, uvmode = mbs[idx]
                is_b = ymode == B_PRED
                f, il, hev = levels[(seg, is_b)]
                inner = has_coeffs[idx] or is_b
            else:
                f, il, hev, inner = mb_levels[idx]
            if f == 0:
                continue
            mb_lim = ((f + 2) * 2) + il
            sub_lim = (f * 2) + il
            px, py = 16 * mb_x + 1, 16 * mb_y + 1
            cx, cy = 8 * mb_x + 1, 8 * mb_y + 1
            if hdr.filter_type:  # simple: Y only
                if mb_x > 0:
                    _simple_edge(Y, px, py, 1, 16, mb_lim)
                if inner:
                    for c in (4, 8, 12):
                        _simple_edge(Y, px + c, py, 1, 16, sub_lim)
                if mb_y > 0:
                    _simple_edge(Y, px, py, 0, 16, mb_lim)
                if inner:
                    for r in (4, 8, 12):
                        _simple_edge(Y, px, py + r, 0, 16, sub_lim)
                continue
            if mb_x > 0:
                _normal_edge(Y, px, py, 1, 0, 16, mb_lim, il, hev, True)
                _normal_edge(U, cx, cy, 1, 0, 8, mb_lim, il, hev, True)
                _normal_edge(V, cx, cy, 1, 0, 8, mb_lim, il, hev, True)
            if inner:
                for c in (4, 8, 12):
                    _normal_edge(Y, px + c, py, 1, 0, 16, sub_lim, il, hev, False)
                _normal_edge(U, cx + 4, cy, 1, 0, 8, sub_lim, il, hev, False)
                _normal_edge(V, cx + 4, cy, 1, 0, 8, sub_lim, il, hev, False)
            if mb_y > 0:
                _normal_edge(Y, px, py, 0, 1, 16, mb_lim, il, hev, True)
                _normal_edge(U, cx, cy, 0, 1, 8, mb_lim, il, hev, True)
                _normal_edge(V, cx, cy, 0, 1, 8, mb_lim, il, hev, True)
            if inner:
                for r in (4, 8, 12):
                    _normal_edge(Y, px, py + r, 0, 1, 16, sub_lim, il, hev, False)
                _normal_edge(U, cx, cy + 4, 0, 1, 8, sub_lim, il, hev, False)
                _normal_edge(V, cx, cy + 4, 0, 1, 8, sub_lim, il, hev, False)


def _fancy_upsample(c: np.ndarray, h: int, w: int) -> np.ndarray:
    """libwebp's "fancy" chroma upsampler: each full-res sample is the
    9-3-3-1 weighted blend of its four nearest chroma samples
    ((9a + 3b + 3c + d + 8) >> 4), edges replicated.  Vectorized via a
    1-sample-padded plane and parity indexing."""
    ch, cw = c.shape
    p = np.empty((ch + 2, cw + 2), np.int32)
    p[1:-1, 1:-1] = c
    p[0, 1:-1] = c[0]
    p[-1, 1:-1] = c[-1]
    p[:, 0] = p[:, 1]
    p[:, -1] = p[:, -2]
    ys = np.arange(h)
    xs = np.arange(w)
    cy = (ys >> 1) + 1
    cx = (xs >> 1) + 1
    cy2 = cy + np.where(ys & 1, 1, -1)
    cx2 = cx + np.where(xs & 1, 1, -1)
    a = p[np.ix_(cy, cx)]
    b = p[np.ix_(cy, cx2)]
    cc = p[np.ix_(cy2, cx)]
    d = p[np.ix_(cy2, cx2)]
    return (9 * a + 3 * (b + cc) + d + 8) >> 4


def yuv420_to_rgb(y: np.ndarray, u: np.ndarray, v: np.ndarray) -> np.ndarray:
    """YUV 4:2:0 -> RGB with VP8's studio-swing BT.601 matrix in
    libwebp's exact fixed-point form (yuv.h: 14.2-precision products,
    >>6 final shift) over fancy-upsampled chroma — the same default
    pipeline libwebp's RGB output uses, so decoded RGB tracks the
    reference decoder to within rounding."""
    h, w = y.shape
    uu = _fancy_upsample(u, h, w)
    vv = _fancy_upsample(v, h, w)
    yy = (y.astype(np.int32) * 19077) >> 8
    r = (yy + ((vv * 26149) >> 8) - 14234) >> 6
    g = (yy - ((uu * 6419) >> 8) - ((vv * 13320) >> 8) + 8708) >> 6
    b = (yy + ((uu * 33050) >> 8) - 17685) >> 6
    return np.clip(np.stack([r, g, b], -1), 0, 255).astype(np.uint8)
