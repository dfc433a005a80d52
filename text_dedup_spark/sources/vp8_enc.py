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


# DCT value categories: (base, extra-bit probs) — base 5/7/11/19/35/67,
# covering |v| up to 2114 (RFC 6386 13.2).
_CATS = ((5, CAT1), (7, CAT2), (11, CAT3), (19, CAT4), (35, CAT5), (67, CAT6))


def _put_large(be: BoolEncoder, p, a: int) -> None:
    """Token-encode a magnitude a >= 5 via the DCT category trees."""
    for ci in range(len(_CATS) - 1, -1, -1):
        base, cat = _CATS[ci]
        top = base + (1 << len(cat)) - 1
        if a >= base and (ci == len(_CATS) - 1 or a <= top):
            break
    a = min(a, 67 + (1 << 11) - 1)
    # tree path to the category: p[6] splits {cat1,cat2} vs {cat3..6},
    # p[7] cat1|cat2, p[8] {cat3,cat4}|{cat5,cat6}, p[9]/p[10] leaves.
    if ci <= 1:
        be.put_bit(0, p[6])
        be.put_bit(ci, p[7])
    else:
        be.put_bit(1, p[6])
        hi = ci >= 4
        be.put_bit(1 if hi else 0, p[8])
        be.put_bit((ci - 2) & 1, p[9 + (1 if hi else 0)])
    base, cat = _CATS[ci]
    extra = a - base
    for i, cp in enumerate(cat):
        be.put_bit((extra >> (len(cat) - 1 - i)) & 1, cp)


def _put_tokens(be: BoolEncoder, probs_by_band, ctx: int, first: int,
                levels) -> int:
    """Emit one 4x4 block's coefficient tokens.  ``levels`` are the raw
    (pre-dequant) levels in ZIGZAG order starting at ``first``; any
    magnitude up to the cat6 ceiling (2114) is representable.  Returns
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
                if a <= 4:
                    be.put_bit(0, p[3])
                    if a == 2:
                        be.put_bit(0, p[4])
                    else:
                        be.put_bit(1, p[4])
                        be.put_bit(0 if a == 3 else 1, p[5])
                else:
                    be.put_bit(1, p[3])
                    _put_large(be, p, a)
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
                     sharpness: int = 0, n_parts: int = 1,
                     segments=None) -> bytes:
    """Build a VP8 keyframe payload.

    ``mbs``: list of per-MB dicts in raster order, each with keys
      ymode: DC/V/H/TM_PRED or B_PRED
      sub:   16 B-modes (required when ymode == B_PRED)
      uvmode: DC/V/H/TM_PRED
      skip:  bool — if False, 'y2'/'y'/'uv' carry raw token levels
             (zigzag order): y2 16-list, y 16x16-list, uv 8x16-list
      seg:   segment id 0-3 (only when ``segments`` is given).

    ``n_parts``: token partitions (1/2/4/8; MB row r goes to partition
    r % n_parts, sizes in the 3-byte LE table per RFC 6386 9.5).

    ``segments``: optional dict enabling per-MB segmentation —
      {'abs': bool, 'quant': [4 ints], 'lf': [4 ints]}; the segment map
      is always updated (tree probs fixed at 128).
    """
    mbw = (w + 15) >> 4
    mbh = (h + 15) >> 4
    assert len(mbs) == mbw * mbh
    assert n_parts in (1, 2, 4, 8)

    be = BoolEncoder()
    be.put_flag(0)  # color space
    be.put_flag(0)  # clamping
    if segments is None:
        be.put_flag(0)  # segmentation disabled
    else:
        be.put_flag(1)
        be.put_flag(1)  # update map
        be.put_flag(1)  # update data
        be.put_flag(1 if segments.get("abs") else 0)
        for qv in segments["quant"]:
            if qv or segments.get("abs"):
                be.put_flag(1)
                be.put_literal(abs(qv), 7)
                be.put_flag(1 if qv < 0 else 0)
            else:
                be.put_flag(0)
        for lv in segments["lf"]:
            if lv or segments.get("abs"):
                be.put_flag(1)
                be.put_literal(abs(lv), 6)
                be.put_flag(1 if lv < 0 else 0)
            else:
                be.put_flag(0)
        for _ in range(3):  # tree probs: keep the 255 default? use 128
            be.put_flag(1)
            be.put_literal(128, 8)
    be.put_flag(1 if filter_type else 0)
    be.put_literal(filter_level, 6)
    be.put_literal(sharpness, 3)
    be.put_flag(0)  # lf deltas
    be.put_literal({1: 0, 2: 1, 4: 2, 8: 3}[n_parts], 2)
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
            if segments is not None:
                sid = mb.get("seg", 0)
                # segment tree {2,4,-0,-1,-2,-3}, probs fixed at 128
                be.put_bit(1 if sid >= 2 else 0, 128)
                be.put_bit(sid & 1, 128)
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

    # token partitions (MB row r -> encoder r % n_parts)
    tes = [BoolEncoder() for _ in range(n_parts)]
    above_nz = [[0] * 9 for _ in range(mbw)]
    for mb_y in range(mbh):
        te = tes[mb_y % n_parts]
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
    parts = [t.flush() for t in tes]
    sizes = b"".join(
        len(p).to_bytes(3, "little") for p in parts[:-1]
    )
    tokens = sizes + b"".join(parts)

    part0_size = len(part0)
    tag = (part0_size << 5) | (1 << 4) | 0  # show_frame, version 0, keyframe
    head = bytes([tag & 0xFF, (tag >> 8) & 0xFF, (tag >> 16) & 0xFF])
    head += b"\x9d\x01\x2a"
    head += bytes([w & 0xFF, (w >> 8) & 0x3F, h & 0xFF, (h >> 8) & 0x3F])
    return head + part0 + tokens


def _fdct4x4(block) -> list:
    """VP8 forward 4x4 DCT (the analysis transform matching the
    decoder's _idct4x4 scaling; libvpx vp8_short_fdct4x4_c)."""
    tmp = [0] * 16
    for i in range(4):
        r = 4 * i
        a1 = (block[r] + block[r + 3]) * 8
        b1 = (block[r + 1] + block[r + 2]) * 8
        c1 = (block[r + 1] - block[r + 2]) * 8
        d1 = (block[r] - block[r + 3]) * 8
        tmp[r] = a1 + b1
        tmp[r + 2] = a1 - b1
        tmp[r + 1] = (c1 * 2217 + d1 * 5352 + 14500) >> 12
        tmp[r + 3] = (d1 * 2217 - c1 * 5352 + 7500) >> 12
    out = [0] * 16
    for i in range(4):
        a1 = tmp[i] + tmp[12 + i]
        b1 = tmp[4 + i] + tmp[8 + i]
        c1 = tmp[4 + i] - tmp[8 + i]
        d1 = tmp[i] - tmp[12 + i]
        out[i] = (a1 + b1 + 7) >> 4
        out[8 + i] = (a1 - b1 + 7) >> 4
        out[4 + i] = ((c1 * 2217 + d1 * 5352 + 12000) >> 16) + (1 if d1 else 0)
        out[12 + i] = (d1 * 2217 - c1 * 5352 + 51000) >> 16
    return out


def _quantize(coeffs, qdc: int, qac: int):
    """Round-to-nearest quantization, levels in ZIGZAG order, clamped to
    the cat6 ceiling."""
    zz = []
    for n in range(16):
        c = coeffs[ZIGZAG[n]]
        q = qdc if n == 0 else qac
        a = abs(c)
        lv = (2 * a + q) // (2 * q)
        if lv > 2114:
            lv = 2114
        zz.append(-lv if c < 0 else lv)
    return zz


def _rgb_to_yuv420(rgb: np.ndarray):
    """Studio-swing BT.601 RGB -> YUV 4:2:0 (integer, 2x2 mean chroma)."""
    r = rgb[..., 0].astype(np.int32)
    g = rgb[..., 1].astype(np.int32)
    b = rgb[..., 2].astype(np.int32)
    y = ((66 * r + 129 * g + 25 * b + 128) >> 8) + 16
    u = ((-38 * r - 74 * g + 112 * b + 128) >> 8) + 128
    v = ((112 * r - 94 * g - 18 * b + 128) >> 8) + 128
    h, w = y.shape
    he, we = (h + 1) & ~1, (w + 1) & ~1
    def pad(p):
        out = np.empty((he, we), np.int32)
        out[:h, :w] = p
        out[h:, :w] = p[h - 1 : h, :]
        out[:he, w:] = out[:he, w - 1 : w]
        return out
    u, v = pad(u), pad(v)
    u = (u[0::2, 0::2] + u[0::2, 1::2] + u[1::2, 0::2] + u[1::2, 1::2] + 2) >> 2
    v = (v[0::2, 0::2] + v[0::2, 1::2] + v[1::2, 0::2] + v[1::2, 1::2] + 2) >> 2
    return (
        np.clip(y, 0, 255).astype(np.uint8),
        np.clip(u, 0, 255).astype(np.uint8),
        np.clip(v, 0, 255).astype(np.uint8),
    )


def encode_webp_lossy(rgb: np.ndarray, y_ac_qi: int = 24,
                      filter_level: int = 0) -> bytes:
    """RGB (h, w, 3) uint8 -> lossy WebP bytes, fully pure-Python.

    A real (if deliberately simple) VP8 intra encoder: every macroblock
    is coded B_PRED with B_DC subblock prediction from the evolving
    reconstruction, residuals go through the forward DCT and
    round-to-nearest quantization at ``y_ac_qi``, and the encoder-side
    reconstruction replays the decoder's exact integer ops — so
    decode(encode(x)) is deterministic and libwebp-conformant (the
    parity tests decode these streams through the reference decoder).
    Deterministic lossy fixture generator for environments without
    libwebp; quality is controlled by the quantizer index (0..127)."""
    if rgb.ndim != 3 or rgb.shape[2] != 3:
        raise ValueError("expected (h, w, 3) RGB")
    h, w = rgb.shape[:2]
    yq, uq, vq = _rgb_to_yuv420(rgb)
    mbw, mbh = (w + 15) >> 4, (h + 15) >> 4
    W, H = mbw * 16, mbh * 16

    def padded(plane, ph, pw):
        out = np.empty((ph + 1, pw + 1), np.int32)
        sh, sw = plane.shape
        out[1 : sh + 1, 1 : sw + 1] = plane
        out[sh + 1 :, 1:] = out[sh : sh + 1, 1:]
        out[1:, sw + 1 :] = out[1:, sw : sw + 1]
        out[0, :] = 127
        out[1:, 0] = 129
        return out

    orig_y = padded(yq, H, W)
    orig_u = padded(uq, H // 2, W // 2)
    orig_v = padded(vq, H // 2, W // 2)
    # reconstruction planes, decoder border conventions
    rec_y = orig_y.copy()
    rec_u = orig_u.copy()
    rec_v = orig_v.copy()
    for pl in (rec_y, rec_u, rec_v):
        pl[0, :] = 127
        pl[1:, 0] = 129

    qi = max(0, min(127, y_ac_qi))
    qy = (DC_QLOOKUP[qi], AC_QLOOKUP[qi])
    quv = (min(DC_QLOOKUP[qi], 132), AC_QLOOKUP[qi])

    def code_block(orig, rec, bx, by, quant):
        """DC-predict one 4x4 from rec, transform/quantize the residual,
        reconstruct, return zigzag levels."""
        A = rec[by - 1, bx : bx + 4]
        L = rec[by : by + 4, bx - 1]
        dc = (int(A.sum()) + int(L.sum()) + 4) >> 3
        resid = (orig[by : by + 4, bx : bx + 4] - dc).ravel().tolist()
        zz = _quantize(_fdct4x4(resid), *quant)
        deq = [0] * 16
        for n in range(16):
            deq[ZIGZAG[n]] = zz[n] * (quant[0] if n == 0 else quant[1])
        from .vp8 import _idct4x4

        out = np.array(_idct4x4(deq), np.int32).reshape(4, 4) + dc
        rec[by : by + 4, bx : bx + 4] = np.clip(out, 0, 255)
        return zz

    mbs = []
    for mb_y in range(mbh):
        for mb_x in range(mbw):
            px, py = 16 * mb_x + 1, 16 * mb_y + 1
            ylv = []
            for r in range(4):
                for c in range(4):
                    ylv.append(
                        code_block(orig_y, rec_y, px + 4 * c, py + 4 * r, qy)
                    )
            cx, cy = 8 * mb_x + 1, 8 * mb_y + 1
            uvlv = []
            for op, rp in ((orig_u, rec_u), (orig_v, rec_v)):
                # whole-8x8 DC prediction, decoder availability rules
                if mb_y > 0 and mb_x > 0:
                    dc = (
                        int(rp[cy - 1, cx : cx + 8].sum())
                        + int(rp[cy : cy + 8, cx - 1].sum())
                        + 8
                    ) >> 4
                elif mb_y > 0:
                    dc = (int(rp[cy - 1, cx : cx + 8].sum()) + 4) >> 3
                elif mb_x > 0:
                    dc = (int(rp[cy : cy + 8, cx - 1].sum()) + 4) >> 3
                else:
                    dc = 128
                for r in range(2):
                    for c in range(2):
                        bx, by = cx + 4 * c, cy + 4 * r
                        resid = (op[by : by + 4, bx : bx + 4] - dc).ravel().tolist()
                        zz = _quantize(_fdct4x4(resid), *quv)
                        deq = [0] * 16
                        for n in range(16):
                            deq[ZIGZAG[n]] = zz[n] * (quv[0] if n == 0 else quv[1])
                        from .vp8 import _idct4x4

                        out = np.array(_idct4x4(deq), np.int32).reshape(4, 4) + dc
                        rp[by : by + 4, bx : bx + 4] = np.clip(out, 0, 255)
                        uvlv.append(zz)
            mb = {
                "ymode": B_PRED,
                "sub": [B_DC_MODE] * 16,
                "uvmode": DC_PRED,
            }
            if any(any(b) for b in ylv) or any(any(b) for b in uvlv):
                mb["y"] = ylv
                mb["uv"] = uvlv
            else:
                mb["skip"] = True
            mbs.append(mb)

    payload = encode_vp8_frame(w, h, mbs, y_ac_qi=qi,
                               filter_level=filter_level)
    return wrap_webp(payload)


B_DC_MODE = 0


def wrap_webp(vp8_payload: bytes) -> bytes:
    """RIFF/WEBP container around a raw VP8 chunk."""
    chunk = b"VP8 " + len(vp8_payload).to_bytes(4, "little") + vp8_payload
    if len(vp8_payload) & 1:
        chunk += b"\x00"
    return b"RIFF" + (len(chunk) + 4).to_bytes(4, "little") + b"WEBP" + chunk


# --- interframe (P-frame) writer (RFC 6386 secs 9.7/9.11/16/17) -------------
#
# Counterpart of sources/vp8p.py: emits inter-coded frames bit-by-bit per
# the spec text. The encoder runs the SAME near-MV survey contract as the
# decoder (imported from vp8p — it is the bitstream contract, not shared
# reconstruction code); pixel-level ground truth in tests/test_vp8p.py is
# independent of both sides (numpy roll / direct 6-tap convolution).


def _put_mv_component(be: BoolEncoder, p, v8: int) -> None:
    """One MV component delta, ``v8`` in eighth-pel (must be even — VP8
    transmits quarter-pel units and the decoder doubles them)."""
    assert v8 % 2 == 0
    x = v8 // 2
    a = abs(x)
    if a < 8:
        be.put_bit(0, p[0])
        be.put_tree(_SMALL_MV_TREE_E, p[2:9], a)
    else:
        be.put_bit(1, p[0])
        for i in range(3):
            be.put_bit((a >> i) & 1, p[9 + i])
        for i in range(9, 3, -1):
            be.put_bit((a >> i) & 1, p[9 + i])
        if a & 0xFFF0:
            be.put_bit((a >> 3) & 1, p[9 + 3])
        else:
            # values < 8 take the short form, so bit 3 is implicitly set
            assert (a >> 3) & 1
    if a:
        be.put_bit(1 if x < 0 else 0, p[1])


def encode_vp8_pframe(
    mbw: int,
    mbh: int,
    mbs,
    y_ac_qi: int = 4,
    filter_level: int = 0,
    filter_type: int = 0,
    sharpness: int = 0,
    refresh_golden: bool = False,
    refresh_alt: bool = False,
    refresh_last: bool = True,
    copy_golden: int = 0,
    copy_alt: int = 0,
    prob_intra: int = 64,
    prob_last: int = 64,
    prob_gf: int = 128,
    show: bool = True,
):
    """Build a VP8 interframe payload; returns (payload, resolved) where
    ``resolved`` lists each MB's (ref, mode, submvs) as the decoder will
    reconstruct them (the caller's ground-truth oracle needs the survey
    outcome for nearest/near modes).

    ``mbs``: per-MB dicts in raster order:
      inter: mode: 'zero'|'nearest'|'near'|'new'|'split';
             ref: 'last'|'golden'|'altref' (default last);
             mv: (row, col) eighth-pel TOTAL motion for 'new';
             split: list of 16 (row, col) per-subblock MVs (encoded with
             partition type 3 = sixteen, submode new/zero/left/above
             chosen automatically);
             skip: bool (default True); y/y2/uv: raw token levels
             (zigzag) when not skipped, as in encode_vp8_frame.
      intra: intra: True; ymode/sub/uvmode as in encode_vp8_frame.
    """
    from .vp8p import (
        ALTREF,
        GOLDEN,
        INTRA,
        LAST,
        MODE_CONTEXT_PROBS,
        MBSPLIT_MAPS,
        MBSPLIT_PROBS,
        NEARESTMV,
        NEARMV,
        NEWMV,
        SPLITMV,
        SUB_MV_REF_PROBS,
        ZEROMV,
        _MBInfo,
        _MV_REF_TREE,
        _SUB_MV_REF_TREE,
        _YMODE_TREE,
        B_MODE_PROB,
        UV_MODE_PROB,
        YMODE_PROB,
        DEFAULT_MV_CONTEXT,
        _above_block_mv,
        _find_near_mvs,
        _left_block_mv,
        _sub_mv_context,
    )

    assert len(mbs) == mbw * mbh
    ref_code = {"last": LAST, None: LAST, "golden": GOLDEN, "altref": ALTREF}
    mv_probs = (list(DEFAULT_MV_CONTEXT[0]), list(DEFAULT_MV_CONTEXT[1]))
    sign_bias = {LAST: 0, GOLDEN: 0, ALTREF: 0}

    be = BoolEncoder()
    be.put_flag(0)  # segmentation
    be.put_flag(1 if filter_type else 0)
    be.put_literal(filter_level, 6)
    be.put_literal(sharpness, 3)
    be.put_flag(0)  # lf deltas
    be.put_literal(0, 2)  # one token partition
    be.put_literal(y_ac_qi, 7)
    for _ in range(5):
        be.put_flag(0)  # quant deltas
    be.put_flag(1 if refresh_golden else 0)
    be.put_flag(1 if refresh_alt else 0)
    if not refresh_golden:
        be.put_literal(copy_golden, 2)
    if not refresh_alt:
        be.put_literal(copy_alt, 2)
    be.put_flag(0)  # sign bias golden
    be.put_flag(0)  # sign bias altref
    be.put_flag(0)  # refresh entropy: frame-local
    be.put_flag(1 if refresh_last else 0)
    for t in range(4):  # no coeff prob updates
        for b in range(8):
            for c in range(3):
                for p in range(11):
                    be.put_bit(0, COEFF_UPDATE_PROBS[t][b][c][p])
    be.put_flag(1)  # mb_no_coeff_skip
    be.put_literal(128, 8)  # prob_skip_false
    be.put_literal(prob_intra, 8)
    be.put_literal(prob_last, 8)
    be.put_literal(prob_gf, 8)
    be.put_flag(0)  # no ymode prob update
    be.put_flag(0)  # no uv prob update
    from .vp8p import MV_UPDATE_PROBS

    for comp in range(2):
        for i in range(19):
            be.put_bit(0, MV_UPDATE_PROBS[comp][i])

    # per-MB modes — decoder-contract survey runs alongside
    infos: list[_MBInfo] = []
    resolved = []
    for mb_y in range(mbh):
        for mb_x in range(mbw):
            idx = mb_y * mbw + mb_x
            spec = mbs[idx]
            info = _MBInfo()
            be.put_bit(1 if spec.get("skip", True) else 0, 128)
            info.skip = 1 if spec.get("skip", True) else 0
            if spec.get("intra"):
                be.put_bit(0, prob_intra)
                info.ref = INTRA
                info.ymode = spec["ymode"]
                info.mode = info.ymode
                be.put_tree(_YMODE_TREE, YMODE_PROB, info.ymode)
                if info.ymode == B_PRED:
                    info.sub = list(spec["sub"])
                    for m in info.sub:
                        be.put_tree(_BMODE_TREE, B_MODE_PROB, m)
                else:
                    info.sub = [_MODE_TO_BMODE[info.ymode]] * 16
                info.uvmode = spec["uvmode"]
                be.put_tree(_UV_MODE_TREE, UV_MODE_PROB, info.uvmode)
                infos.append(info)
                resolved.append((INTRA, info.ymode, None))
                continue
            be.put_bit(1, prob_intra)
            info.ref = ref_code[spec.get("ref")]
            if info.ref == LAST:
                be.put_bit(0, prob_last)
            else:
                be.put_bit(1, prob_last)
                be.put_bit(0 if info.ref == GOLDEN else 1, prob_gf)
            best, nearest, near, cnt = _find_near_mvs(
                infos, idx, mb_x, mb_y, mbw, mbh, info.ref, sign_bias
            )
            probs = [MODE_CONTEXT_PROBS[min(cnt[j], 5)][j] for j in range(4)]
            want = spec["mode"]
            if want == "zero":
                info.mode, info.mv = ZEROMV, (0, 0)
                info.submvs = [(0, 0)] * 16
            elif want == "nearest":
                info.mode, info.mv = NEARESTMV, nearest
                info.submvs = [nearest] * 16
            elif want == "near":
                info.mode, info.mv = NEARMV, near
                info.submvs = [near] * 16
            elif want == "new":
                info.mode, info.mv = NEWMV, tuple(spec["mv"])
                info.submvs = [info.mv] * 16
            else:
                info.mode = SPLITMV
                info.submvs = [tuple(m) for m in spec["split"]]
                info.mv = info.submvs[15]
            be.put_tree(_MV_REF_TREE, probs, info.mode)
            if info.mode == NEWMV:
                _put_mv_component(be, mv_probs[0], info.mv[0] - best[0])
                _put_mv_component(be, mv_probs[1], info.mv[1] - best[1])
            elif info.mode == SPLITMV:
                be.put_tree(_MBSPLIT_TREE_E, MBSPLIT_PROBS, 3)  # sixteen
                filled = [None] * 16
                for b in range(16):
                    mv = info.submvs[b]
                    l = _left_block_mv(infos, idx, mb_x, mbw, filled, b)
                    a = _above_block_mv(infos, idx, mb_y, mbw, filled, b)
                    ctx = _sub_mv_context(l, a)
                    sp = SUB_MV_REF_PROBS[ctx]
                    if mv == l:
                        be.put_tree(_SUB_MV_REF_TREE, sp, 0)  # LEFT4X4
                    elif mv == a:
                        be.put_tree(_SUB_MV_REF_TREE, sp, 1)  # ABOVE4X4
                    elif mv == (0, 0):
                        be.put_tree(_SUB_MV_REF_TREE, sp, 2)  # ZERO4X4
                    else:
                        be.put_tree(_SUB_MV_REF_TREE, sp, 3)  # NEW4X4
                        _put_mv_component(be, mv_probs[0], mv[0] - best[0])
                        _put_mv_component(be, mv_probs[1], mv[1] - best[1])
                    filled[b] = mv
            infos.append(info)
            resolved.append((info.ref, info.mode, list(info.submvs)))
    part0 = be.flush()

    # tokens (single partition)
    te = BoolEncoder()
    above_nz = [[0] * 9 for _ in range(mbw)]
    for mb_y in range(mbh):
        left_nz = [0] * 9
        for mb_x in range(mbw):
            idx = mb_y * mbw + mb_x
            spec = mbs[idx]
            info = infos[idx]
            has_y2 = info.mode not in (B_PRED, SPLITMV)
            anz = above_nz[mb_x]
            if info.skip:
                for i in range(8):
                    anz[i] = 0
                    left_nz[i] = 0
                if has_y2:
                    anz[8] = 0
                    left_nz[8] = 0
                continue
            if has_y2:
                lv = spec.get("y2", [0] * 16)
                ctx = anz[8] + left_nz[8]
                _put_tokens(te, COEFF_PROBS[1], ctx, 0, lv)
                nz = 1 if any(lv) else 0
                anz[8] = left_nz[8] = nz
                first, ptbl = 1, COEFF_PROBS[0]
            else:
                first, ptbl = 0, COEFF_PROBS[3]
            yl = spec.get("y", [[0] * 16] * 16)
            for r in range(4):
                for c in range(4):
                    lv = yl[4 * r + c]
                    ctx = anz[c] + left_nz[r]
                    _put_tokens(te, ptbl, ctx, first, lv[first:])
                    nz = 1 if any(lv[first:]) else 0
                    anz[c] = left_nz[r] = nz
            uvl = spec.get("uv", [[0] * 16] * 8)
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
    tag = (part0_size << 5) | ((1 if show else 0) << 4) | (0 << 1) | 1
    head = bytes([tag & 0xFF, (tag >> 8) & 0xFF, (tag >> 16) & 0xFF])
    return head + part0 + tokens, resolved


# tree aliases used by the P-frame writer (imported lazily above to keep
# vp8p optional for still-image users)
from .vp8p import _MBSPLIT_TREE as _MBSPLIT_TREE_E  # noqa: E402
from .vp8p import _SMALL_MV_TREE as _SMALL_MV_TREE_E  # noqa: E402
