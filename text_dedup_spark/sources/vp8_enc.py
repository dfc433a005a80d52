"""Minimal pure-Python VP8 keyframe encoder (RFC 6386).

Writes conforming VP8 still-image bitstreams with explicit control over
every syntax element: intra modes per macroblock/subblock, quantizer
index, skip flags, and raw coefficient levels.  Primarily a test
instrument — streams it emits are decoded by BOTH the system libwebp
and sources/vp8.py, and the two reconstructions must agree bit-exactly,
which pins each decoder feature independently of libwebp's encoder-side
mode decisions.  It is also the deterministic lossy-WebP fixture
generator for environments without libwebp.

Only intra 4x4 (B_PRED) and the four 16x16 modes are emitted; the
boolean arithmetic encoder is the RFC 6386 section 7.2 reference
algorithm.
"""

from __future__ import annotations

import numpy as np

from .vp8 import (
    B_PRED,
    DC_PRED,
    _BMODE_TREE,
    _KF_YMODE_TREE,
    _MODE_TO_BMODE,
    _UV_MODE_TREE,
)
from .vp8_tables import (
    COEFF_BANDS,
    COEFF_PROBS,
    COEFF_UPDATE_PROBS,
    KF_BMODE_PROB,
    KF_UV_MODE_PROB,
    KF_YMODE_PROB,
    ZIGZAG,
)


class BoolEncoder:
    """RFC 6386 section 7.2 boolean arithmetic encoder."""

    def __init__(self):
        self.out = bytearray()
        self.range = 255
        self.bottom = 0
        self.bit_count = 24

    def _carry(self):
        i = len(self.out) - 1
        while self.out[i] == 255:
            self.out[i] = 0
            i -= 1
        self.out[i] += 1

    def put_bit(self, bit: int, prob: int) -> None:
        split = 1 + (((self.range - 1) * prob) >> 8)
        if bit:
            self.bottom += split
            self.range -= split
        else:
            self.range = split
        while self.range < 128:
            self.range <<= 1
            if self.bottom & (1 << 31):
                self._carry()
            self.bottom = (self.bottom << 1) & 0xFFFFFFFF
            self.bit_count -= 1
            if self.bit_count == 0:
                self.bit_count = 8
                self.out.append((self.bottom >> 24) & 0xFF)
                self.bottom &= (1 << 24) - 1

    def put_flag(self, bit: int) -> None:
        self.put_bit(bit, 128)

    def put_literal(self, value: int, n: int) -> None:
        for i in range(n - 1, -1, -1):
            self.put_bit((value >> i) & 1, 128)

    def put_tree(self, tree, probs, leaf: int) -> None:
        # Find the bit path to -leaf, then emit it.
        path = self._find(tree, 0, leaf)
        i = 0
        for b in path:
            self.put_bit(b, probs[i >> 1])
            i = tree[i + b]

    @staticmethod
    def _find(tree, i, leaf, path=()):
        for b in (0, 1):
            t = tree[i + b]
            if t <= 0:
                if -t == leaf:
                    return path + (b,)
            else:
                r = BoolEncoder._find(tree, t, leaf, path + (b,))
                if r is not None:
                    return r
        return None

    def flush(self) -> bytes:
        c = self.bit_count
        v = self.bottom
        if v & (1 << (32 - c)):
            self._carry()
        v = (v << (c & 7)) & 0xFFFFFFFF
        c >>= 3
        while c > 0:
            v = (v << 8) & 0xFFFFFFFF
            c -= 1
        for _ in range(4):
            self.out.append((v >> 24) & 0xFF)
            v = (v << 8) & 0xFFFFFFFF
        return bytes(self.out)


def _put_tokens(be: BoolEncoder, probs_by_band, ctx: int, first: int,
                levels) -> int:
    """Emit one 4x4 block's coefficient tokens.  ``levels`` are the raw
    (pre-dequant) levels in ZIGZAG order starting at ``first``; only
    values |v| <= 4 are supported (enough for test streams).  Returns
    the nonzero-context flag for the neighbor bookkeeping."""
    # trim trailing zeros
    last = -1
    for i, v in enumerate(levels):
        if v:
            last = i
    n = first
    p = probs_by_band[COEFF_BANDS[n]][ctx]
    i = 0
    prev_zero = False
    while n < 16 and i <= last:
        v = levels[i]
        if not prev_zero:
            be.put_bit(1, p[0])  # not EOB
        if v == 0:
            be.put_bit(0, p[1])
            nctx = 0
            prev_zero = True
        else:
            be.put_bit(1, p[1])
            prev_zero = False
            a = abs(v)
            if a == 1:
                be.put_bit(0, p[2])
                nctx = 1
            else:
                be.put_bit(1, p[2])
                be.put_bit(0, p[3])
                if a == 2:
                    be.put_bit(0, p[4])
                else:
                    be.put_bit(1, p[4])
                    be.put_bit(0 if a == 3 else 1, p[5])
                nctx = 2
            be.put_flag(1 if v < 0 else 0)
        n += 1
        i += 1
        if n < 16:
            p = probs_by_band[COEFF_BANDS[n]][nctx]
    if n < 16:
        # trailing zeros were trimmed, so we can never sit on a zero
        # token here (EOB directly after a zero is unrepresentable).
        assert not prev_zero
        be.put_bit(0, p[0])  # EOB
    return 1 if last >= 0 else 0


def encode_vp8_frame(w: int, h: int, mbs, y_ac_qi: int = 4,
                     filter_level: int = 0, filter_type: int = 0,
                     sharpness: int = 0) -> bytes:
    """Build a VP8 keyframe payload.

    ``mbs``: list of per-MB dicts in raster order, each with keys
      ymode: DC/V/H/TM_PRED or B_PRED
      sub:   16 B-modes (required when ymode == B_PRED)
      uvmode: DC/V/H/TM_PRED
      skip:  bool — if False, 'y2'/'y'/'uv' carry raw token levels
             (zigzag order): y2 16-list, y 16x16-list, uv 8x16-list.
    """
    mbw = (w + 15) >> 4
    mbh = (h + 15) >> 4
    assert len(mbs) == mbw * mbh

    be = BoolEncoder()
    be.put_flag(0)  # color space
    be.put_flag(0)  # clamping
    be.put_flag(0)  # segmentation
    be.put_flag(1 if filter_type else 0)
    be.put_literal(filter_level, 6)
    be.put_literal(sharpness, 3)
    be.put_flag(0)  # lf deltas
    be.put_literal(0, 2)  # log2(n_parts) = 0 -> 1 partition
    be.put_literal(y_ac_qi, 7)
    for _ in range(5):  # y1dc, y2dc, y2ac, uvdc, uvac deltas absent
        be.put_flag(0)
    be.put_flag(0)  # refresh entropy (still image: irrelevant)
    for t in range(4):  # no coeff prob updates
        for b in range(8):
            for c in range(3):
                for p in range(11):
                    be.put_bit(0, COEFF_UPDATE_PROBS[t][b][c][p])
    be.put_flag(1)  # mb_no_coeff_skip enabled
    be.put_literal(128, 8)  # prob_skip_false

    # per-MB modes
    above_sub = [[0] * 4 for _ in range(mbw)]
    for mb_y in range(mbh):
        left_sub = [0] * 4
        for mb_x in range(mbw):
            mb = mbs[mb_y * mbw + mb_x]
            be.put_bit(1 if mb.get("skip") else 0, 128)
            ymode = mb["ymode"]
            be.put_tree(_KF_YMODE_TREE, KF_YMODE_PROB, ymode)
            if ymode == B_PRED:
                sub = mb["sub"]
                for r in range(4):
                    for c in range(4):
                        a = above_sub[mb_x][c] if r == 0 else sub[4 * (r - 1) + c]
                        lft = left_sub[r] if c == 0 else sub[4 * r + c - 1]
                        be.put_tree(_BMODE_TREE, KF_BMODE_PROB[a][lft],
                                    sub[4 * r + c])
                above_sub[mb_x] = list(sub[12:16])
                for r in range(4):
                    left_sub[r] = sub[4 * r + 3]
            else:
                m = _MODE_TO_BMODE[ymode]
                above_sub[mb_x] = [m] * 4
                left_sub = [m] * 4
            be.put_tree(_UV_MODE_TREE, KF_UV_MODE_PROB, mb["uvmode"])
    part0 = be.flush()

    # token partition
    te = BoolEncoder()
    above_nz = [[0] * 9 for _ in range(mbw)]
    for mb_y in range(mbh):
        left_nz = [0] * 9
        for mb_x in range(mbw):
            mb = mbs[mb_y * mbw + mb_x]
            has_y2 = mb["ymode"] != B_PRED
            anz = above_nz[mb_x]
            if mb.get("skip"):
                for i in range(8):
                    anz[i] = 0
                    left_nz[i] = 0
                if has_y2:
                    anz[8] = 0
                    left_nz[8] = 0
                continue
            if has_y2:
                lv = mb.get("y2", [0] * 16)
                ctx = anz[8] + left_nz[8]
                _put_tokens(te, COEFF_PROBS[1], ctx, 0, lv)
                nz = 1 if any(lv) else 0
                anz[8] = left_nz[8] = nz
                first, ptbl = 1, COEFF_PROBS[0]
            else:
                first, ptbl = 0, COEFF_PROBS[3]
            yl = mb.get("y", [[0] * 16] * 16)
            for r in range(4):
                for c in range(4):
                    lv = yl[4 * r + c]
                    ctx = anz[c] + left_nz[r]
                    _put_tokens(te, ptbl, ctx, first, lv[first:])
                    nz = 1 if any(lv[first:]) else 0
                    anz[c] = left_nz[r] = nz
            uvl = mb.get("uv", [[0] * 16] * 8)
            for pi in range(2):
                for r in range(2):
                    for c in range(2):
                        lv = uvl[4 * pi + 2 * r + c]
                        ai = 4 + 2 * pi + c
                        li = 4 + 2 * pi + r
                        ctx = anz[ai] + left_nz[li]
                        _put_tokens(te, COEFF_PROBS[2], ctx, 0, lv)
                        nz = 1 if any(lv) else 0
                        anz[ai] = left_nz[li] = nz
    tokens = te.flush()

    part0_size = len(part0)
    tag = (part0_size << 5) | (1 << 4) | 0  # show_frame, version 0, keyframe
    head = bytes([tag & 0xFF, (tag >> 8) & 0xFF, (tag >> 16) & 0xFF])
    head += b"\x9d\x01\x2a"
    head += bytes([w & 0xFF, (w >> 8) & 0x3F, h & 0xFF, (h >> 8) & 0x3F])
    return head + part0 + tokens


def wrap_webp(vp8_payload: bytes) -> bytes:
    """RIFF/WEBP container around a raw VP8 chunk."""
    chunk = b"VP8 " + len(vp8_payload).to_bytes(4, "little") + vp8_payload
    if len(vp8_payload) & 1:
        chunk += b"\x00"
    return b"RIFF" + (len(chunk) + 4).to_bytes(4, "little") + b"WEBP" + chunk
