"""Pure-Python VP8 interframe (P-frame) decoder — RFC 6386 sections 9.7,
9.11, 16 (interframe modes), 17 (motion vector decoding), 18 (interframe
prediction), on top of the keyframe machinery in ``vp8.py``.

Closes the round-3 README limitation "non-keyframe VP8": real-world VP8
video streams (IVF / WebM payloads) are golden-frame + P-frame chains, so
fingerprinting from more than frame 0 needs inter decode: reference
buffers (last / golden / altref) with refresh + copy + sign-bias
semantics, the near-MV survey, mv_ref entropy coding, the 6-tap subpel
motion-compensation filters, SPLITMV partitions, and the interframe loop
filter deltas (reference- and mode-indexed).

Evidence class (documented honestly in README): every table here is a
spec constant from RFC 6386 (the reference C code embedded in the RFC and
shipped in every conforming decoder); the keyframe-shared machinery
(boolean decoder, token trees, coefficient probabilities, IDCT/IWHT,
loop-filter kernels) is already pinned byte-exact against libwebp
goldens. The interframe-only tables cannot be cross-checked against a
real decoder in this sandbox — libwebp decodes stills only and libvpx is
not installed — so validation is (a) structural round-trip against this
repo's own independent bitstream WRITER (vp8_enc.py emits P-frames
bit-by-bit per the spec text; a table disagreement between the two would
desynchronize the boolean decoder, not cancel out), and (b) pixel-level
ground truth independent of both: an integer-MV P-frame with no residual
must decode to an exact numpy roll of the reference frame, and subpel MVs
to an independently-computed 6-tap convolution (tests/test_vp8p.py).
Env-gated libvpx conformance hooks stay ready for an environment that has
a real interframe decoder.
"""

from __future__ import annotations

import numpy as np

from .vp8 import (
    BoolDecoder,
    B_PRED,
    DC_PRED,
    H_PRED,
    TM_PRED,
    V_PRED,
    _BMODE_TREE,
    _MODE_TO_BMODE,
    _UV_MODE_TREE,
    _decode_keyframe,
    _dequant_factors,
    _get_coeffs,
    _idct4x4,
    _iwht4x4,
    _loop_filter,
    _pred_b,
    _pred_whole,
)
from .vp8_tables import COEFF_PROBS, COEFF_UPDATE_PROBS

# --- interframe constants (RFC 6386 reference code) -------------------------

# reference frames
INTRA, LAST, GOLDEN, ALTREF = 0, 1, 2, 3

# inter MB modes (continuing the intra enum DC..B_PRED = 0..4)
NEARESTMV, NEARMV, ZEROMV, NEWMV, SPLITMV = 5, 6, 7, 8, 9

# non-keyframe intra mode trees/probs (RFC 6386 11.3; modes.c)
_YMODE_TREE = (-DC_PRED, 2, 4, 6, -V_PRED, -H_PRED, -TM_PRED, -B_PRED)
YMODE_PROB = (112, 86, 140, 37)
UV_MODE_PROB = (162, 101, 204)
# interframe 4x4 submodes use ONE fixed prob row (no above/left context),
# positional on the same 9-node bmode tree (sub_bmode_prob)
B_MODE_PROB = (120, 90, 79, 133, 87, 85, 80, 111, 151)

# mv_ref tree (16.2): leaves are inter modes
_MV_REF_TREE = (-ZEROMV, 2, -NEARESTMV, 4, -NEARMV, 6, -NEWMV, -SPLITMV)
# probabilities for the mv_ref tree, each indexed by its own neighbor-MV
# count 0..5 (vp8_mode_contexts / mv_counts_to_probs). The reference
# declares the table as int but assigns entries into uint8 Prob fields
# (vp8_mv_ref_probs), so >255 entries take effect mod 256 — the truncated
# table below is what both coder sides must use.
MODE_CONTEXTS = (
    (7, 1, 1, 143),
    (14, 18, 14, 107),
    (135, 64, 57, 68),
    (60, 56, 128, 65),
    (234, 160, 1, 1),
    (257, 336, 1, 1),
)
MODE_CONTEXT_PROBS = tuple(
    tuple(v & 0xFF for v in row) for row in MODE_CONTEXTS
)

# SPLITMV partition tree (16.2): 2 horizontal halves, 2 vertical halves,
# 4 quarters, 16 singles — probs vp8_mbsplit_probs
_MBSPLIT_TREE = (-3, 2, -2, 4, -0, -1)
MBSPLIT_PROBS = (110, 111, 150)
MBSPLIT_COUNTS = (2, 2, 4, 16)
MBSPLIT_MAPS = (
    (0, 0, 0, 0, 0, 0, 0, 0, 1, 1, 1, 1, 1, 1, 1, 1),  # two rows
    (0, 0, 1, 1, 0, 0, 1, 1, 0, 0, 1, 1, 0, 0, 1, 1),  # two cols
    (0, 0, 1, 1, 0, 0, 1, 1, 2, 2, 3, 3, 2, 2, 3, 3),  # four quarters
    tuple(range(16)),                                   # sixteen
)

# sub-MV reference tree + context probs (16.2: sub_mv_ref)
LEFT4X4, ABOVE4X4, ZERO4X4, NEW4X4 = 0, 1, 2, 3
_SUB_MV_REF_TREE = (-LEFT4X4, 2, -ABOVE4X4, 4, -ZERO4X4, -NEW4X4)
SUB_MV_REF_PROBS = (  # context: normal, left-zed, above-zed, same, both-zed
    (147, 136, 18),
    (106, 145, 1),
    (179, 121, 1),
    (223, 1, 34),
    (208, 1, 1),
)

# MV component probabilities (17.2): layout [is_short, sign, short[7],
# bits[10]] per component (row then column)
MV_UPDATE_PROBS = (
    (237, 246, 253, 253, 254, 254, 254, 254, 254,
     254, 254, 254, 254, 254, 250, 250, 252, 254, 254),
    (231, 243, 245, 253, 254, 254, 254, 254, 254,
     254, 254, 254, 254, 254, 251, 251, 254, 254, 254),
)
DEFAULT_MV_CONTEXT = (
    (162, 128, 225, 146, 172, 147, 214, 39, 156,
     128, 129, 132, 75, 145, 178, 206, 239, 254, 254),
    (164, 128, 204, 170, 119, 235, 140, 230, 228,
     128, 130, 130, 74, 148, 180, 203, 236, 254, 254),
)
_SMALL_MV_TREE = (2, 8, 4, 6, -0, -1, -2, -3, 10, 12, -4, -5, -6, -7)
_MVLONG_WIDTH = 10

# 6-tap subpel filters (18.3), one row per eighth-pel phase
SUBPEL_FILTERS = (
    (0, 0, 128, 0, 0, 0),
    (0, -6, 123, 12, -1, 0),
    (2, -11, 108, 36, -8, 1),
    (0, -9, 93, 50, -6, 0),
    (3, -16, 77, 77, -16, 3),
    (0, -6, 50, 93, -9, 0),
    (1, -8, 36, 108, -11, 2),
    (0, -1, 12, 123, -6, 0),
)

_BORDER = 32  # reference-plane edge extension (MVs may reach 16px + taps)

# loop-filter mode delta index (15.2): B_PRED->0, ZEROMV->1,
# NEAREST/NEAR/NEWMV->2, SPLITMV->3; other intra modes take no mode delta
_MODE_LF_LUT = {B_PRED: 0, ZEROMV: 1, NEARESTMV: 2, NEARMV: 2, NEWMV: 2,
                SPLITMV: 3}


def _default_mv_probs():
    return [list(DEFAULT_MV_CONTEXT[0]), list(DEFAULT_MV_CONTEXT[1])]


def _default_coeff_probs():
    return [
        [[list(COEFF_PROBS[t][b][c]) for c in range(3)] for b in range(8)]
        for t in range(4)
    ]


# --- motion vector decoding (17.1) ------------------------------------------


def _read_mv_component(bd: BoolDecoder, p) -> int:
    """One MV component in quarter-pel units; the caller doubles it."""
    if bd.get_bit(p[0]):  # long vector
        x = 0
        for i in range(3):
            x += bd.get_bit(p[9 + i]) << i
        for i in range(_MVLONG_WIDTH - 1, 3, -1):
            x += bd.get_bit(p[9 + i]) << i
        # bit 3 is implicit (set) unless the higher bits are all zero
        if not (x & 0xFFF0) or bd.get_bit(p[9 + 3]):
            x += 8
    else:
        x = bd.read_tree(_SMALL_MV_TREE, p[2:9])
    if x and bd.get_bit(p[1]):
        x = -x
    return x


def _read_mv(bd: BoolDecoder, mv_probs):
    r = _read_mv_component(bd, mv_probs[0]) * 2
    c = _read_mv_component(bd, mv_probs[1]) * 2
    return (r, c)


def _clamp_mv(mv, mb_x, mb_y, mbw, mbh):
    """vp8_clamp_mv2: keep the (max 16px-beyond-edge) reference reachable."""
    lo_c = -((mb_x * 16) << 3) - (16 << 3)
    hi_c = (((mbw - 1 - mb_x) * 16) << 3) + (16 << 3)
    lo_r = -((mb_y * 16) << 3) - (16 << 3)
    hi_r = (((mbh - 1 - mb_y) * 16) << 3) + (16 << 3)
    r, c = mv
    r = lo_r if r < lo_r else (hi_r if r > hi_r else r)
    c = lo_c if c < lo_c else (hi_c if c > hi_c else c)
    return (r, c)


# --- per-frame MB info ------------------------------------------------------


class _MBInfo:
    __slots__ = ("seg", "skip", "ref", "mode", "mv", "submvs", "ymode",
                 "sub", "uvmode")

    def __init__(self):
        self.seg = 0
        self.skip = 0
        self.ref = INTRA
        self.mode = DC_PRED
        self.mv = (0, 0)
        self.submvs = None  # 16 x (row, col) for inter MBs
        self.ymode = DC_PRED
        self.sub = None
        self.uvmode = DC_PRED


def _find_near_mvs(mbs, idx, mb_x, mb_y, mbw, mbh, ref, sign_bias):
    """vp8_find_near_mvs: survey above/left/above-left coded neighbors,
    weights 2/2/1; returns (best, nearest, near, cnt[4])."""
    near_mvs = [(0, 0), (0, 0), (0, 0), (0, 0)]
    cnt = [0, 0, 0, 0]
    n_entries = 0
    neighbors = []
    if mb_y > 0:
        neighbors.append((mbs[idx - mbw], 2))
    if mb_x > 0:
        neighbors.append((mbs[idx - 1], 2))
    if mb_y > 0 and mb_x > 0:
        neighbors.append((mbs[idx - mbw - 1], 1))

    for nb, weight in neighbors:
        if nb.ref == INTRA:
            continue
        if nb.mv != (0, 0):
            mv = nb.mv
            if sign_bias[nb.ref] != sign_bias[ref]:
                mv = (-mv[0], -mv[1])
            k = 0
            for k in range(1, n_entries + 1):
                if near_mvs[k] == mv:
                    break
            else:
                k = n_entries + 1
            if k > n_entries:
                n_entries = k
                near_mvs[k] = mv
            cnt[k] += weight
        else:
            cnt[0] += weight

    cnt[3] = (
        2 * (mb_y > 0 and mbs[idx - mbw].mode == SPLITMV)
        + 2 * (mb_x > 0 and mbs[idx - 1].mode == SPLITMV)
        + (mb_y > 0 and mb_x > 0 and mbs[idx - mbw - 1].mode == SPLITMV)
    )

    if cnt[2] > cnt[1]:
        cnt[1], cnt[2] = cnt[2], cnt[1]
        near_mvs[1], near_mvs[2] = near_mvs[2], near_mvs[1]
    if cnt[1] >= cnt[0]:
        near_mvs[0] = near_mvs[1]

    best = _clamp_mv(near_mvs[0], mb_x, mb_y, mbw, mbh)
    nearest = _clamp_mv(near_mvs[1], mb_x, mb_y, mbw, mbh)
    near = _clamp_mv(near_mvs[2], mb_x, mb_y, mbw, mbh)
    return best, nearest, near, cnt


def _left_block_mv(mbs, idx, mb_x, mbw, cur_submvs, b):
    """MV of the 4x4 block left of subblock ``b`` (libvpx left_block_mv:
    an intra neighbor contributes the zero MV)."""
    if b & 3:
        return cur_submvs[b - 1]
    if mb_x == 0:
        return (0, 0)
    nb = mbs[idx - 1]
    if nb.ref == INTRA:
        return (0, 0)
    return nb.submvs[b + 3]


def _above_block_mv(mbs, idx, mb_y, mbw, cur_submvs, b):
    if b >> 2:
        return cur_submvs[b - 4]
    if mb_y == 0:
        return (0, 0)
    nb = mbs[idx - mbw]
    if nb.ref == INTRA:
        return (0, 0)
    return nb.submvs[b + 12]


def _sub_mv_context(l, a):
    if l == a:
        return 4 if l == (0, 0) else 3
    if a == (0, 0):
        return 2
    if l == (0, 0):
        return 1
    return 0


# --- motion compensation (18.3) ---------------------------------------------


def _mc_block(ref, x0, y0, bw, bh, mv):
    """Predict a (bh, bw) block at plane position (x0, y0) displaced by
    eighth-pel ``mv`` = (row, col) from the _BORDER-padded ``ref``."""
    mr, mc = mv
    iy, fy = (mr >> 3), mr & 7
    ix, fx = (mc >> 3), mc & 7
    sy = y0 + iy + _BORDER
    sx = x0 + ix + _BORDER
    # defensive clamp: spec streams are in range after clamp_mv2, but an
    # unclamped NEWMV in a corrupt stream must not slice out of bounds
    sy = max(2, min(sy, ref.shape[0] - bh - 3))
    sx = max(2, min(sx, ref.shape[1] - bw - 3))
    if not fx and not fy:
        return ref[sy : sy + bh, sx : sx + bw].astype(np.int32)
    if fx and fy:
        win = ref[sy - 2 : sy + bh + 3, sx - 2 : sx + bw + 3].astype(np.int32)
        tmp = _sixtap_h(win, fx, bw)          # (bh + 5, bw)
        return _sixtap_v(tmp, fy, bh)
    if fx:
        win = ref[sy : sy + bh, sx - 2 : sx + bw + 3].astype(np.int32)
        return _sixtap_h(win, fx, bw)
    win = ref[sy - 2 : sy + bh + 3, sx : sx + bw].astype(np.int32)
    return _sixtap_v(win, fy, bh)


def _sixtap_h(win, phase, bw):
    f = SUBPEL_FILTERS[phase]
    acc = np.zeros((win.shape[0], bw), np.int32)
    for k in range(6):
        if f[k]:
            acc += f[k] * win[:, k : k + bw]
    return np.clip((acc + 64) >> 7, 0, 255)


def _sixtap_v(win, phase, bh):
    f = SUBPEL_FILTERS[phase]
    acc = np.zeros((bh, win.shape[1]), np.int32)
    for k in range(6):
        if f[k]:
            acc += f[k] * win[k : k + bh, :]
    return np.clip((acc + 64) >> 7, 0, 255)


def _chroma_mv(submvs, r, c):
    """Chroma subblock MV = 1/8-rounded sum of the 4 covering luma MVs
    (round half away from zero), applied at chroma resolution."""
    blocks = (8 * r + 2 * c, 8 * r + 2 * c + 1,
              8 * r + 2 * c + 4, 8 * r + 2 * c + 5)
    out = []
    for comp in (0, 1):
        s = sum(submvs[b][comp] for b in blocks)
        out.append((s + 4) >> 3 if s >= 0 else -((-s + 4) >> 3))
    return (out[0], out[1])


def _pad_ref(plane):
    return np.pad(plane, _BORDER, mode="edge")


# --- the sequence decoder ---------------------------------------------------


class VP8SequenceDecoder:
    """Stateful decoder for a VP8 frame sequence (IVF / WebM payloads).

    ``decode(payload)`` returns (y, u, v) cropped planes for shown frames,
    None for non-shown (altref-update) frames. The first frame must be a
    keyframe. Raises ValueError on malformed input (flag-policy
    compatible: one bad stream cannot kill a task)."""

    def __init__(self):
        self.w = self.h = 0
        self.mbw = self.mbh = 0
        self.refs = {LAST: None, GOLDEN: None, ALTREF: None}
        self.sign_bias = {LAST: 0, GOLDEN: 0, ALTREF: 0}
        self._reset_entropy()

    def _reset_entropy(self):
        self.coeff_probs = _default_coeff_probs()
        self.mv_probs = _default_mv_probs()
        self.ymode_probs = list(YMODE_PROB)
        self.uv_probs = list(UV_MODE_PROB)

    # -- public ---------------------------------------------------------

    def decode(self, payload: bytes):
        if len(payload) < 3:
            raise ValueError("VP8 frame too short")
        b0 = payload[0]
        is_key = not (b0 & 1)
        version = (b0 >> 1) & 7
        show = (b0 >> 4) & 1
        if is_key:
            return self._decode_key(payload, show)
        if self.refs[LAST] is None:
            raise ValueError("interframe before any keyframe")
        if version != 0:
            raise ValueError(f"unsupported VP8 profile {version} for interframes")
        return self._decode_inter(payload, show)

    # -- keyframe -------------------------------------------------------

    def _decode_key(self, payload: bytes, show: int):
        Y, U, V, hdr, w, h = _decode_keyframe(payload)
        self.w, self.h = w, h
        self.mbw, self.mbh = (w + 15) >> 4, (h + 15) >> 4
        # strip the 1px prediction border; keep the MB-aligned plane
        planes = (
            Y[1 : self.mbh * 16 + 1, 1 : self.mbw * 16 + 1].copy(),
            U[1 : self.mbh * 8 + 1, 1 : self.mbw * 8 + 1].copy(),
            V[1 : self.mbh * 8 + 1, 1 : self.mbw * 8 + 1].copy(),
        )
        self.refs = {LAST: planes, GOLDEN: planes, ALTREF: planes}
        self.sign_bias = {LAST: 0, GOLDEN: 0, ALTREF: 0}
        # keyframes reset, then optionally persist their header updates
        self._reset_entropy()
        if hdr.refresh_entropy:
            self.coeff_probs = hdr.coeff_probs
        if not show:
            return None
        return self._crop(planes)

    def _crop(self, planes):
        y, u, v = planes
        return (
            y[: self.h, : self.w].copy(),
            u[: (self.h + 1) // 2, : (self.w + 1) // 2].copy(),
            v[: (self.h + 1) // 2, : (self.w + 1) // 2].copy(),
        )

    # -- interframe -----------------------------------------------------

    def _parse_inter_header(self, bd: BoolDecoder):
        from .vp8 import _Header

        h = _Header()
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

        h.filter_type = bd.get_flag()
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

        h.refresh_golden = bd.get_flag()
        h.refresh_alt = bd.get_flag()
        h.copy_golden = 0 if h.refresh_golden else bd.get_literal(2)
        h.copy_alt = 0 if h.refresh_alt else bd.get_literal(2)
        h.sign_bias_golden = bd.get_flag()
        h.sign_bias_alt = bd.get_flag()
        h.refresh_entropy = bd.get_flag()
        h.refresh_last = bd.get_flag()

        # coefficient updates start from the PERSISTENT probabilities
        probs = [
            [[list(self.coeff_probs[t][b][c]) for c in range(3)]
             for b in range(8)]
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
        h.prob_intra = bd.get_literal(8)
        h.prob_last = bd.get_literal(8)
        h.prob_gf = bd.get_literal(8)

        ymode = list(self.ymode_probs)
        if bd.get_flag():
            ymode = [bd.get_literal(8) for _ in range(4)]
        h.ymode_probs = ymode
        uv = list(self.uv_probs)
        if bd.get_flag():
            uv = [bd.get_literal(8) for _ in range(3)]
        h.uv_probs = uv

        mv_probs = [list(self.mv_probs[0]), list(self.mv_probs[1])]
        for comp in range(2):
            for i in range(19):
                if bd.get_bit(MV_UPDATE_PROBS[comp][i]):
                    x = bd.get_literal(7)
                    mv_probs[comp][i] = (x << 1) if x else 1
        h.mv_probs = mv_probs
        return h

    def _read_mb_modes(self, bd, h):
        mbw, mbh = self.mbw, self.mbh
        mbs: list[_MBInfo] = []
        for mb_y in range(mbh):
            for mb_x in range(mbw):
                idx = mb_y * mbw + mb_x
                mb = _MBInfo()
                if h.update_map:
                    p = h.seg_tree_probs
                    if bd.get_bit(p[0]):
                        mb.seg = 2 + bd.get_bit(p[2])
                    else:
                        mb.seg = bd.get_bit(p[1])
                if h.mb_no_skip:
                    mb.skip = bd.get_bit(h.prob_skip_false)
                if bd.get_bit(h.prob_intra):  # inter-coded
                    if bd.get_bit(h.prob_last):
                        mb.ref = GOLDEN if not bd.get_bit(h.prob_gf) else ALTREF
                    else:
                        mb.ref = LAST
                    best, nearest, near, cnt = _find_near_mvs(
                        mbs, idx, mb_x, mb_y, mbw, mbh, mb.ref,
                        self.sign_bias,
                    )
                    probs = [
                        MODE_CONTEXT_PROBS[min(cnt[j], 5)][j] for j in range(4)
                    ]
                    mb.mode = bd.read_tree(_MV_REF_TREE, probs)
                    if mb.mode == ZEROMV:
                        mb.mv = (0, 0)
                        mb.submvs = [(0, 0)] * 16
                    elif mb.mode == NEARESTMV:
                        mb.mv = nearest
                        mb.submvs = [nearest] * 16
                    elif mb.mode == NEARMV:
                        mb.mv = near
                        mb.submvs = [near] * 16
                    elif mb.mode == NEWMV:
                        dr, dc = _read_mv(bd, h.mv_probs)
                        mb.mv = (best[0] + dr, best[1] + dc)
                        mb.submvs = [mb.mv] * 16
                    else:  # SPLITMV
                        part = bd.read_tree(_MBSPLIT_TREE, MBSPLIT_PROBS)
                        pmap = MBSPLIT_MAPS[part]
                        submvs = [None] * 16
                        for p_i in range(MBSPLIT_COUNTS[part]):
                            b = pmap.index(p_i)  # first subblock of part
                            l = _left_block_mv(mbs, idx, mb_x, mbw, submvs, b)
                            a = _above_block_mv(mbs, idx, mb_y, mbw, submvs, b)
                            ctx = _sub_mv_context(l, a)
                            sm = bd.read_tree(
                                _SUB_MV_REF_TREE, SUB_MV_REF_PROBS[ctx]
                            )
                            if sm == LEFT4X4:
                                mv = l
                            elif sm == ABOVE4X4:
                                mv = a
                            elif sm == ZERO4X4:
                                mv = (0, 0)
                            else:
                                dr, dc = _read_mv(bd, h.mv_probs)
                                mv = (best[0] + dr, best[1] + dc)
                            for bi in range(16):
                                if pmap[bi] == p_i:
                                    submvs[bi] = mv
                        mb.submvs = submvs
                        mb.mv = submvs[15]
                else:  # intra-coded
                    mb.ref = INTRA
                    mb.ymode = bd.read_tree(_YMODE_TREE, h.ymode_probs)
                    mb.mode = mb.ymode
                    if mb.ymode == B_PRED:
                        mb.sub = [
                            bd.read_tree(_BMODE_TREE, B_MODE_PROB)
                            for _ in range(16)
                        ]
                    else:
                        mb.sub = [_MODE_TO_BMODE[mb.ymode]] * 16
                    mb.uvmode = bd.read_tree(_UV_MODE_TREE, h.uv_probs)
                mbs.append(mb)
        return mbs

    def _decode_inter(self, payload: bytes, show: int):
        b0, b1, b2 = payload[0], payload[1], payload[2]
        part0_size = (b0 >> 5) | (b1 << 3) | (b2 << 11)
        if 3 + part0_size > len(payload):
            raise ValueError("truncated first partition")
        bd = BoolDecoder(payload[3 : 3 + part0_size])
        h = self._parse_inter_header(bd)

        rest = payload[3 + part0_size :]
        sizes_len = 3 * (h.n_parts - 1)
        if len(rest) < sizes_len:
            raise ValueError("truncated partition size table")
        offs = sizes_len
        parts = []
        for i in range(h.n_parts - 1):
            sz = rest[3 * i] | (rest[3 * i + 1] << 8) | (rest[3 * i + 2] << 16)
            parts.append(BoolDecoder(rest[offs : offs + sz]))
            offs += sz
        parts.append(BoolDecoder(rest[offs:]))

        mbw, mbh = self.mbw, self.mbh
        quants = _dequant_factors(h)
        # sign biases are reference-buffer state, transmitted absolutely in
        # every interframe header (not entropy state — no revert)
        self.sign_bias[GOLDEN] = h.sign_bias_golden
        self.sign_bias[ALTREF] = h.sign_bias_alt

        mbs = self._read_mb_modes(bd, h)

        # --- residual tokens (same contexts as the keyframe pass) -------
        above_nz = [[0] * 9 for _ in range(mbw)]
        coeffs_all = []
        has_coeffs_all = []
        for mb_y in range(mbh):
            tbd = parts[mb_y % h.n_parts]
            left_nz = [0] * 9
            for mb_x in range(mbw):
                mb = mbs[mb_y * mbw + mb_x]
                qy1, qy2, quv = quants[mb.seg]
                anz = above_nz[mb_x]
                has_y2 = mb.mode not in (B_PRED, SPLITMV)
                if mb.skip:
                    coeffs_all.append(None)
                    has_coeffs_all.append(False)
                    for i in range(8):
                        anz[i] = 0
                        left_nz[i] = 0
                    if has_y2:
                        anz[8] = 0
                        left_nz[8] = 0
                    continue
                probs = h.coeff_probs
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
                for pi in range(2):
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

        # --- reconstruction ---------------------------------------------
        W, H = mbw * 16, mbh * 16
        Y = np.empty((H + 1, W + 1 + 4), np.uint8)
        U = np.empty((H // 2 + 1, W // 2 + 1), np.uint8)
        V = np.empty_like(U)
        for pl in (Y, U, V):
            pl[0, :] = 127
            pl[1:, 0] = 129
        padded = {}  # ref id -> (Ypad, Upad, Vpad), built lazily per frame

        def get_padded(ref_id):
            if ref_id not in padded:
                ry, ru, rv = self.refs[ref_id]
                padded[ref_id] = (_pad_ref(ry), _pad_ref(ru), _pad_ref(rv))
            return padded[ref_id]

        for mb_y in range(mbh):
            if mb_y > 0:
                Y[16 * mb_y, W + 1 :] = Y[16 * mb_y, W]
            for mb_x in range(mbw):
                idx = mb_y * mbw + mb_x
                mb = mbs[idx]
                coeffs = coeffs_all[idx]
                px, py = 16 * mb_x + 1, 16 * mb_y + 1
                cx, cy = 8 * mb_x + 1, 8 * mb_y + 1
                if mb.ref == INTRA:
                    self._recon_intra(Y, U, V, mb, coeffs, px, py, cx, cy,
                                      mb_x, mb_y)
                    continue
                ry, ru, rv = get_padded(mb.ref)
                x0, y0 = 16 * mb_x, 16 * mb_y
                if mb.mode == SPLITMV:
                    pred = np.empty((16, 16), np.int32)
                    for b in range(16):
                        br, bc = b >> 2, b & 3
                        pred[4 * br : 4 * br + 4, 4 * bc : 4 * bc + 4] = (
                            _mc_block(ry, x0 + 4 * bc, y0 + 4 * br, 4, 4,
                                      mb.submvs[b])
                        )
                else:
                    pred = _mc_block(ry, x0, y0, 16, 16, mb.mv)
                if coeffs is not None:
                    y2, yblocks, _uv = coeffs
                    if y2 is not None:
                        dcs = _iwht4x4(y2)
                    for r in range(4):
                        for c in range(4):
                            res = list(yblocks[4 * r + c])
                            if y2 is not None:
                                res[0] = dcs[4 * r + c]
                            if any(res):
                                pred[4 * r : 4 * r + 4, 4 * c : 4 * c + 4] += (
                                    np.array(_idct4x4(res), np.int32)
                                    .reshape(4, 4)
                                )
                Y[py : py + 16, px : px + 16] = np.clip(pred, 0, 255)

                cx0, cy0 = 8 * mb_x, 8 * mb_y
                for pi, (pl, ref_pl) in enumerate(((U, ru), (V, rv))):
                    cpred = np.empty((8, 8), np.int32)
                    for r in range(2):
                        for c in range(2):
                            cmv = _chroma_mv(mb.submvs, r, c)
                            cpred[4 * r : 4 * r + 4, 4 * c : 4 * c + 4] = (
                                _mc_block(ref_pl, cx0 + 4 * c, cy0 + 4 * r,
                                          4, 4, cmv)
                            )
                    if coeffs is not None:
                        blocks = coeffs[2][4 * pi : 4 * pi + 4]
                        for r in range(2):
                            for c in range(2):
                                res = blocks[2 * r + c]
                                if any(res):
                                    cpred[4 * r : 4 * r + 4, 4 * c : 4 * c + 4] += (
                                        np.array(_idct4x4(res), np.int32)
                                        .reshape(4, 4)
                                    )
                    pl[cy : cy + 8, cx : cx + 8] = np.clip(cpred, 0, 255)

        # --- loop filter -------------------------------------------------
        if h.filter_level > 0:
            mb_levels = self._inter_filter_levels(h, mbs, has_coeffs_all)
            _loop_filter(Y, U, V, h, None, has_coeffs_all, mbw, mbh,
                         mb_levels=mb_levels)

        new = (
            Y[1 : H + 1, 1 : W + 1].copy(),
            U[1 : H // 2 + 1, 1 : W // 2 + 1].copy(),
            V[1 : H // 2 + 1, 1 : W // 2 + 1].copy(),
        )

        # --- reference refresh / copies (libvpx swap order: arf copy,
        # then gf copy, then refreshes) ----------------------------------
        if h.copy_alt == 1:
            self.refs[ALTREF] = self.refs[LAST]
        elif h.copy_alt == 2:
            self.refs[ALTREF] = self.refs[GOLDEN]
        if h.copy_golden == 1:
            self.refs[GOLDEN] = self.refs[LAST]
        elif h.copy_golden == 2:
            self.refs[GOLDEN] = self.refs[ALTREF]
        if h.refresh_golden:
            self.refs[GOLDEN] = new
        if h.refresh_alt:
            self.refs[ALTREF] = new
        if h.refresh_last:
            self.refs[LAST] = new

        # --- entropy persistence ----------------------------------------
        if h.refresh_entropy:
            self.coeff_probs = h.coeff_probs
            self.mv_probs = h.mv_probs
            self.ymode_probs = h.ymode_probs
            self.uv_probs = h.uv_probs

        if not show:
            return None
        return self._crop(new)

    def _recon_intra(self, Y, U, V, mb, coeffs, px, py, cx, cy, mb_x, mb_y):
        if mb.ymode == B_PRED:
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
                    pred = _pred_b(mb.sub[4 * r + c], A, AR, L, P)
                    blk = np.array(pred, np.int32).reshape(4, 4)
                    if coeffs is not None:
                        res = coeffs[1][4 * r + c]
                        if any(res):
                            blk = blk + np.array(
                                _idct4x4(res), np.int32
                            ).reshape(4, 4)
                    Y[by : by + 4, bx : bx + 4] = np.clip(blk, 0, 255)
        else:
            pred = _pred_whole(Y, px, py, 16, mb.ymode, mb_y > 0, mb_x > 0)
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
        for pi, pl in enumerate((U, V)):
            pred = _pred_whole(pl, cx, cy, 8, mb.uvmode, mb_y > 0, mb_x > 0)
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

    def _inter_filter_levels(self, h, mbs, has_coeffs):
        out = []
        for idx, mb in enumerate(mbs):
            if h.segmentation:
                lvl = h.seg_lf[mb.seg] if h.seg_abs else (
                    h.filter_level + h.seg_lf[mb.seg]
                )
            else:
                lvl = h.filter_level
            f = lvl
            if h.lf_delta:
                f += h.ref_lf_deltas[mb.ref]
                mi = _MODE_LF_LUT.get(mb.mode)
                if mi is not None:
                    f += h.mode_lf_deltas[mi]
            f = 0 if f < 0 else (63 if f > 63 else f)
            il = f
            if h.sharpness:
                il >>= 2 if h.sharpness > 4 else 1
                if il > 9 - h.sharpness:
                    il = 9 - h.sharpness
            if il < 1:
                il = 1
            hev = 0
            if f >= 40:
                hev = 2
            elif f >= 15:
                hev = 1
            inner = has_coeffs[idx] or mb.mode in (B_PRED, SPLITMV)
            out.append((f, il, hev, inner))
        return out


# --- IVF container (the libvpx raw-VP8 test container) ----------------------


def parse_ivf(data: bytes):
    """IVF (DKIF) container -> (fourcc, w, h, [frame payload bytes]).

    32-byte file header: 'DKIF', version u16, header size u16, fourcc,
    w u16, h u16, timebase den/num u32, frame count u32, unused; then per
    frame: size u32, pts u64, payload."""
    if len(data) < 32 or data[:4] != b"DKIF":
        raise ValueError("not an IVF file")
    hdr_size = int.from_bytes(data[6:8], "little")
    fourcc = data[8:12]
    w = int.from_bytes(data[12:14], "little")
    h = int.from_bytes(data[14:16], "little")
    frames = []
    pos = hdr_size
    while pos + 12 <= len(data):
        sz = int.from_bytes(data[pos : pos + 4], "little")
        pos += 12
        if pos + sz > len(data):
            raise ValueError("truncated IVF frame")
        frames.append(data[pos : pos + sz])
        pos += sz
    return fourcc, w, h, frames


def decode_ivf_vp8(data: bytes, max_frames: int | None = None):
    """Decode an IVF-contained VP8 stream -> list of (y, u, v) shown
    frames (keyframes AND interframes)."""
    fourcc, _w, _h, payloads = parse_ivf(data)
    if fourcc != b"VP80":
        raise ValueError(f"unsupported IVF fourcc {fourcc!r}")
    dec = VP8SequenceDecoder()
    out = []
    for p in payloads:
        f = dec.decode(p)
        if f is not None:
            out.append(f)
            if max_frames is not None and len(out) >= max_frames:
                break
    return out


def write_ivf(w: int, h: int, payloads) -> bytes:
    """Assemble an IVF file from raw VP8 frame payloads (test/fixture
    helper; also lets users hand streams to decode_ivf_vp8 directly)."""
    out = bytearray()
    out += b"DKIF"
    out += (0).to_bytes(2, "little")
    out += (32).to_bytes(2, "little")
    out += b"VP80"
    out += w.to_bytes(2, "little")
    out += h.to_bytes(2, "little")
    out += (30).to_bytes(4, "little")  # timebase den
    out += (1).to_bytes(4, "little")   # timebase num
    out += len(payloads).to_bytes(4, "little")
    out += (0).to_bytes(4, "little")
    for i, p in enumerate(payloads):
        out += len(p).to_bytes(4, "little")
        out += i.to_bytes(8, "little")
        out += p
    return bytes(out)
