"""Pure-numpy JPEG codec (ITU-T T.81 / ISO 10918-1, public spec).

No image library exists in this container, so — like the PNG codec in
sources/png.py — the format is implemented directly from the public
specification. Scope: baseline sequential DCT (SOF0/SOF1) AND progressive
DCT (SOF2, spectral selection + successive approximation per Annex G),
8-bit, grayscale or YCbCr with arbitrary sampling factors (4:4:4, 4:2:2,
4:2:0), DQT/DHT/SOS/DRI/RSTn markers. Arithmetic coding and the
lossless/hierarchical SOF modes raise NotImplementedError (the operator
seam flags those rows instead of failing the task).

The decoder is fully general baseline (tables come from the file's DHT/DQT
segments). The encoder exists so tests can produce REAL JPEG bytes without
external deps; it emits 4:4:4 with flat quantization tables (scale 1 =
near-lossless: the only loss is DCT rounding, keeping the input_hint
PSNR >= 40 dB fidelity invariant checkable end-to-end). Any spec-compliant
decoder reads its output; the choice of Huffman tables is embedded in DHT
per the spec, so no Annex-K tables are required.

Entropy decoding is an inherently sequential bit stream — this is the slow
path and fine for fixtures; production corpora would decode via a native
library behind the same ``decode_image`` seam.
"""

from __future__ import annotations

import struct

import numpy as np

# zigzag: index i of the scan -> (row, col) flat index in the 8x8 block
_ZIGZAG = np.array([
     0,  1,  8, 16,  9,  2,  3, 10,
    17, 24, 32, 25, 18, 11,  4,  5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13,  6,  7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63,
], dtype=np.int64)

_C = np.zeros((8, 8))
for _k in range(8):
    for _n in range(8):
        _C[_k, _n] = np.cos(np.pi * (2 * _n + 1) * _k / 16.0)
_C *= np.sqrt(2.0 / 8.0)
_C[0] *= np.sqrt(0.5)


def _fdct(block: np.ndarray) -> np.ndarray:
    return _C @ block @ _C.T


def _idct(coef: np.ndarray) -> np.ndarray:
    return _C.T @ coef @ _C


def _build_huffman(counts, symbols):
    """(counts[1..16], symbols) -> dict[(length, code)] = symbol, per the
    canonical code construction of T.81 Annex C."""
    table = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(counts[length - 1]):
            table[(length, code)] = symbols[k]
            code += 1
            k += 1
        code <<= 1
    return table


def _encode_lengths(counts, symbols):
    """Same walk, but symbol -> (length, code) for the encoder."""
    out = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(counts[length - 1]):
            out[symbols[k]] = (length, code)
            code += 1
            k += 1
        code <<= 1
    return out


class _BitWriter:
    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, length: int) -> None:
        self.acc = (self.acc << length) | (value & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            byte = (self.acc >> (self.nbits - 8)) & 0xFF
            self.buf.append(byte)
            if byte == 0xFF:  # byte stuffing
                self.buf.append(0x00)
            self.nbits -= 8
        self.acc &= (1 << self.nbits) - 1

    def flush(self) -> bytes:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # pad with 1-bits per spec
        return bytes(self.buf)


class _BitReader:
    def __init__(self, data: bytes, start: int):
        self.data = data
        self.pos = start
        self.acc = 0
        self.nbits = 0

    def _fill(self) -> None:
        b = self.data[self.pos]
        self.pos += 1
        if b == 0xFF:
            nxt = self.data[self.pos]
            if nxt == 0x00:
                self.pos += 1  # stuffed byte
            else:  # a marker: behave as if padded (the scan loop handles it)
                self.pos -= 1
                b = 0
                self.acc = (self.acc << 8)
                self.nbits += 8
                return
        self.acc = (self.acc << 8) | b
        self.nbits += 8

    def read_bit(self) -> int:
        if self.nbits == 0:
            self._fill()
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def align_to_marker(self) -> None:
        self.acc = 0
        self.nbits = 0


def _decode_huffman_symbol(reader: _BitReader, table) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | reader.read_bit()
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("invalid Huffman code in JPEG stream")


def _extend(value: int, size: int) -> int:
    if size == 0:
        return 0
    if value < (1 << (size - 1)):
        return value - (1 << size) + 1
    return value


# --- decoder -----------------------------------------------------------------


def decode_jpeg_baseline(data: bytes) -> np.ndarray:
    """JPEG bytes -> uint8 array (h, w) grayscale or (h, w, 3) RGB.

    Handles baseline sequential (SOF0/SOF1) and progressive (SOF2)
    streams; the historical name is kept for API compatibility
    (``decode_jpeg`` is an alias)."""
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    pos = 2
    qt = {}
    huff_dc = {}
    huff_ac = {}
    frame = None
    restart_interval = 0
    out = None
    progressive = False
    arithmetic = False
    dc_cond = {}  # DAC Tc=0: table id -> (L, U) conditioning bounds
    ac_cond = {}  # DAC Tc=1: table id -> Kx
    coefs = None  # per-component (blocks_y, blocks_x, 64) zigzag coefficients

    while pos < len(data) - 1:
        if data[pos] != 0xFF:
            pos += 1
            continue
        marker = data[pos + 1]
        pos += 2
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            continue
        if marker == 0xD9:  # EOI
            break
        seglen = struct.unpack(">H", data[pos : pos + 2])[0]
        seg = data[pos + 2 : pos + seglen]
        if marker == 0xDB:  # DQT
            p = 0
            while p < len(seg):
                pq, tq = seg[p] >> 4, seg[p] & 0xF
                p += 1
                if pq == 0:
                    tbl = np.frombuffer(seg[p : p + 64], dtype=np.uint8).astype(np.int32)
                    p += 64
                else:
                    tbl = np.frombuffer(seg[p : p + 128], dtype=">u2").astype(np.int32)
                    p += 128
                qt[tq] = tbl
        elif marker in (0xC0, 0xC1, 0xC2, 0xC9):
            # SOF0/SOF1 baseline, SOF2 progressive, SOF9 sequential arithmetic
            progressive = marker == 0xC2
            arithmetic = marker == 0xC9
            precision = seg[0]
            if precision != 8:
                raise ValueError(f"unsupported precision {precision}")
            h, w, ncomp = struct.unpack(">HHB", seg[1:6])
            comps = []
            for c in range(ncomp):
                cid, hv, tq = seg[6 + 3 * c : 9 + 3 * c]
                hs, vs = hv >> 4, hv & 0xF
                # T.81 B.2.2: Hi/Vi are 1..4 — 0 divides later (upsample
                # ratios), >4 overflows MCU geometry; both mean corruption
                if not (1 <= hs <= 4 and 1 <= vs <= 4):
                    raise ValueError(f"invalid sampling factors {hs}x{vs}")
                comps.append({"id": cid, "h": hs, "v": vs, "tq": tq})
            frame = {"h": h, "w": w, "comps": comps}
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                "only DCT sequential (Huffman/arithmetic) and progressive "
                f"Huffman JPEG are supported (SOF marker 0x{marker:02X})"
            )
        elif marker == 0xCC:  # DAC: arithmetic conditioning (T.81 B.2.4.3)
            p = 0
            while p + 1 < len(seg):
                tc, tb = seg[p] >> 4, seg[p] & 0xF
                val = seg[p + 1]
                if tc == 0:
                    dc_cond[tb] = (val & 0xF, val >> 4)  # (L, U)
                else:
                    ac_cond[tb] = val  # Kx
                p += 2
        elif marker == 0xC4:  # DHT
            p = 0
            while p < len(seg):
                tc, th = seg[p] >> 4, seg[p] & 0xF
                counts = list(seg[p + 1 : p + 17])
                n = sum(counts)
                symbols = list(seg[p + 17 : p + 17 + n])
                table = _build_huffman(counts, symbols)
                if tc == 0:
                    huff_dc[th] = table
                else:
                    huff_ac[th] = table
                p += 17 + n
        elif marker == 0xDD:  # DRI
            restart_interval = struct.unpack(">H", seg[:2])[0]
        elif marker == 0xDA:  # SOS
            if frame is None:
                raise ValueError("SOS before SOF")
            ns = seg[0]
            scan = []
            for c in range(ns):
                cs, tables = seg[1 + 2 * c], seg[2 + 2 * c]
                hit = next(
                    ((i, x) for i, x in enumerate(frame["comps"]) if x["id"] == cs),
                    None,
                )
                if hit is None:
                    raise ValueError(f"SOS references unknown component {cs}")
                ci, comp = hit
                scan.append({**comp, "ci": ci, "dc": tables >> 4, "ac": tables & 0xF})
            ss, se, ahal = seg[1 + 2 * ns], seg[2 + 2 * ns], seg[3 + 2 * ns]
            ah, al = ahal >> 4, ahal & 0xF
            if not progressive:
                if arithmetic:
                    out = _decode_scan_arith(
                        data, pos + seglen, frame, scan, qt, dc_cond,
                        ac_cond, restart_interval,
                    )
                else:
                    out = _decode_scan(
                        data, pos + seglen, frame, scan, qt, huff_dc,
                        huff_ac, restart_interval,
                    )
                break
            if coefs is None:
                coefs = _alloc_coefs(frame)
            pos = _decode_scan_progressive(
                data, pos + seglen, frame, scan, ss, se, ah, al,
                coefs, huff_dc, huff_ac, restart_interval,
            )
            continue
        pos += seglen

    if progressive and coefs is not None:
        out = _reconstruct_progressive(frame, coefs, qt)
    if out is None:
        raise ValueError("no SOS scan found")
    return out


decode_jpeg = decode_jpeg_baseline


def _decode_scan(data, start, frame, scan, qt, huff_dc, huff_ac, restart_interval):
    h, w = frame["h"], frame["w"]
    hmax = max(c["h"] for c in scan)
    vmax = max(c["v"] for c in scan)
    mcu_w, mcu_h = 8 * hmax, 8 * vmax
    mcus_x = (w + mcu_w - 1) // mcu_w
    mcus_y = (h + mcu_h - 1) // mcu_h

    planes = [
        np.zeros((mcus_y * c["v"] * 8, mcus_x * c["h"] * 8), dtype=np.float64)
        for c in scan
    ]
    reader = _BitReader(data, start)
    pred = [0] * len(scan)
    mcu_count = 0

    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                reader.align_to_marker()
                # skip the RSTn marker
                while data[reader.pos] != 0xFF or not (0xD0 <= data[reader.pos + 1] <= 0xD7):
                    reader.pos += 1
                reader.pos += 2
                pred = [0] * len(scan)
            for ci, comp in enumerate(scan):
                q = qt[comp["tq"]]
                for by in range(comp["v"]):
                    for bx in range(comp["h"]):
                        coeffs = np.zeros(64, dtype=np.int64)
                        t = _decode_huffman_symbol(reader, huff_dc[comp["dc"]])
                        diff = _extend(reader.read_bits(t), t)
                        pred[ci] += diff
                        coeffs[0] = pred[ci]
                        k = 1
                        while k < 64:
                            rs = _decode_huffman_symbol(reader, huff_ac[comp["ac"]])
                            r, s = rs >> 4, rs & 0xF
                            if s == 0:
                                if r == 15:  # ZRL
                                    k += 16
                                    continue
                                break  # EOB
                            k += r
                            coeffs[k] = _extend(reader.read_bits(s), s)
                            k += 1
                        block = np.zeros(64, dtype=np.float64)
                        block[_ZIGZAG] = coeffs * q[np.arange(64)]
                        spatial = _idct(block.reshape(8, 8)) + 128.0
                        y0 = (my * comp["v"] + by) * 8
                        x0 = (mx * comp["h"] + bx) * 8
                        planes[ci][y0 : y0 + 8, x0 : x0 + 8] = spatial
            mcu_count += 1

    return _assemble_planes(planes, scan, hmax, vmax, h, w)


def _arith_decode_dc(dec, st, ctx, cond):
    """One DC difference (T.81 F.2.4.1; bin layout of Table F.4: S0 = the
    conditioning context, SS = S0+1, SP/SN = S0+2/3, X1 = 20, magnitude
    bits at the stopped X bin + 14). Returns (diff, new_context)."""
    L, U = cond
    if dec.decode(st, ctx) == 0:
        return 0, 0
    sign = dec.decode(st, ctx + 1)
    idx = ctx + 2 + sign
    m = dec.decode(st, idx)
    if m:
        idx = 20
        while dec.decode(st, idx):
            m <<= 1
            if m == 0x8000:
                raise ValueError("corrupt arithmetic DC magnitude")
            idx += 1
    # conditioning category for the NEXT block (F.1.4.4.1.2)
    if m < (1 << L) >> 1:
        new_ctx = 0
    elif m > (1 << U) >> 1:
        new_ctx = 12 + 4 * sign
    else:
        new_ctx = 4 + 4 * sign
    v = m
    idx += 14
    mm = m
    while mm := mm >> 1:
        if dec.decode(st, idx):
            v |= mm
    v += 1
    return (-v if sign else v), new_ctx


def _arith_decode_block_ac(dec, st, fixed, kx, coeffs):
    """AC coefficients 1..63 into zigzag ``coeffs`` (T.81 F.2.4.2; bins
    3*(k-1)+{0:EOB, 1:nonzero, 2:size}, high-magnitude trees at 189/217
    split on k <= Kx, magnitude bits at the stopped bin + 14)."""
    k = 1
    while k <= 63:
        base = 3 * (k - 1)
        if dec.decode(st, base):
            break  # EOB
        while dec.decode(st, base + 1) == 0:
            base += 3
            k += 1
            if k > 63:
                raise ValueError("corrupt arithmetic AC run")
        sign = dec.decode(fixed, 0)
        idx = base + 2
        m = dec.decode(st, idx)
        if m:
            if dec.decode(st, idx):
                m = 2
                idx = 189 if k <= kx else 217
                while dec.decode(st, idx):
                    m <<= 1
                    if m == 0x8000:
                        raise ValueError("corrupt arithmetic AC magnitude")
                    idx += 1
        v = m
        idx += 14
        mm = m
        while mm := mm >> 1:
            if dec.decode(st, idx):
                v |= mm
        v += 1
        coeffs[k] = -v if sign else v
        k += 1


def _decode_scan_arith(data, start, frame, scan, qt, dc_cond, ac_cond,
                       restart_interval):
    """Sequential arithmetic-coded scan (SOF9): same MCU walk as
    ``_decode_scan``, entropy layer swapped for the T.81 QM coder with
    the DC/AC statistics models of §F.2.4 (jdarith-compatible bin
    layout). Restart markers re-initialize the coder AND all statistics."""
    from .jpeg_arith import FIXED_BIN, ArithDecoder

    h, w = frame["h"], frame["w"]
    hmax = max(c["h"] for c in scan)
    vmax = max(c["v"] for c in scan)
    mcus_x = (w + 8 * hmax - 1) // (8 * hmax)
    mcus_y = (h + 8 * vmax - 1) // (8 * vmax)
    planes = [
        np.zeros((mcus_y * c["v"] * 8, mcus_x * c["h"] * 8), dtype=np.float64)
        for c in scan
    ]

    def fresh_stats():
        return (
            {c["dc"]: bytearray(64) for c in scan},
            {c["ac"]: bytearray(256) for c in scan},
            bytearray([FIXED_BIN]),
            [0] * len(scan),  # dc_context per component
            [0] * len(scan),  # last dc value per component
        )

    dec = ArithDecoder(data, start)
    dc_st, ac_st, fixed, dc_ctx, last_dc = fresh_stats()
    mcu_count = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                p = dec.bp
                while p + 1 < len(data) and not (
                    data[p] == 0xFF and 0xD0 <= data[p + 1] <= 0xD7
                ):
                    p += 1
                if p + 1 >= len(data):
                    raise ValueError("missing restart marker")
                dec = ArithDecoder(data, p + 2)
                dc_st, ac_st, fixed, dc_ctx, last_dc = fresh_stats()
            for ci, comp in enumerate(scan):
                q = qt[comp["tq"]]
                for by in range(comp["v"]):
                    for bx in range(comp["h"]):
                        coeffs = np.zeros(64, dtype=np.int64)
                        diff, dc_ctx[ci] = _arith_decode_dc(
                            dec, dc_st[comp["dc"]], dc_ctx[ci],
                            dc_cond.get(comp["dc"], (0, 1)))
                        last_dc[ci] += diff
                        coeffs[0] = last_dc[ci]
                        _arith_decode_block_ac(
                            dec, ac_st[comp["ac"]], fixed,
                            ac_cond.get(comp["ac"], 5), coeffs)
                        block = np.zeros(64, dtype=np.float64)
                        block[_ZIGZAG] = coeffs * q[np.arange(64)]
                        spatial = _idct(block.reshape(8, 8)) + 128.0
                        y0 = (my * comp["v"] + by) * 8
                        x0 = (mx * comp["h"] + bx) * 8
                        planes[ci][y0 : y0 + 8, x0 : x0 + 8] = spatial
            mcu_count += 1

    return _assemble_planes(planes, scan, hmax, vmax, h, w)


def _assemble_planes(planes, comps, hmax, vmax, h, w):
    """Upsample spatial component planes to full size, crop, color-convert."""
    full = []
    for ci, comp in enumerate(comps):
        p = planes[ci]
        ry, rx = vmax // comp["v"], hmax // comp["h"]
        if ry > 1 or rx > 1:
            p = np.repeat(np.repeat(p, ry, axis=0), rx, axis=1)
        full.append(p[:h, :w])

    if len(full) == 1:
        return np.clip(np.round(full[0]), 0, 255).astype(np.uint8)
    y, cb, cr = full[0], full[1] - 128.0, full[2] - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    return np.clip(np.round(np.stack([r, g, b], axis=-1)), 0, 255).astype(np.uint8)


# --- progressive decoder (T.81 Annex G: spectral selection + successive
#     approximation; Huffman coding) -----------------------------------------


def _frame_geometry(frame):
    comps = frame["comps"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcus_x = (frame["w"] + 8 * hmax - 1) // (8 * hmax)
    mcus_y = (frame["h"] + 8 * vmax - 1) // (8 * vmax)
    return hmax, vmax, mcus_x, mcus_y


def _alloc_coefs(frame):
    """One int64 (blocks_y, blocks_x, 64) array per frame component,
    coefficients in zigzag order, sized to the MCU-padded grid."""
    _, _, mcus_x, mcus_y = _frame_geometry(frame)
    return [
        np.zeros((mcus_y * c["v"], mcus_x * c["h"], 64), dtype=np.int64)
        for c in frame["comps"]
    ]


def _dc_first(reader, block, dc_table, pred, ci, al):
    t = _decode_huffman_symbol(reader, dc_table)
    diff = _extend(reader.read_bits(t), t)
    pred[ci] += diff
    block[0] = pred[ci] << al


def _dc_refine(reader, block, al):
    if reader.read_bit():
        block[0] |= 1 << al


def _ac_first(reader, block, ac_table, ss, se, al, eobrun):
    """First scan of an AC band: Huffman (run, size) with EOBn run codes,
    new coefficients arrive at magnitude << Al (T.81 G.1.2.2)."""
    if eobrun[0] > 0:
        eobrun[0] -= 1
        return
    k = ss
    while k <= se:
        rs = _decode_huffman_symbol(reader, ac_table)
        r, s = rs >> 4, rs & 0xF
        if s == 0:
            if r != 15:
                eobrun[0] = (1 << r) - 1
                if r:
                    eobrun[0] += reader.read_bits(r)
                break
            k += 16  # ZRL
            continue
        k += r
        if k > se:
            raise ValueError("AC coefficient index beyond band end")
        block[k] = _extend(reader.read_bits(s), s) << al
        k += 1


def _ac_refine(reader, block, ac_table, ss, se, al, eobrun):
    """Refinement scan of an AC band (T.81 G.1.2.3): one correction bit per
    already-nonzero coefficient crossed, new coefficients appear at +-1<<Al."""
    p1 = 1 << al
    m1 = -1 << al
    k = ss
    if eobrun[0] == 0:
        while k <= se:
            rs = _decode_huffman_symbol(reader, ac_table)
            r, s = rs >> 4, rs & 0xF
            sgn = 0
            if s:
                if s != 1:
                    raise ValueError("invalid magnitude in AC refinement scan")
                sgn = p1 if reader.read_bit() else m1
            elif r != 15:
                eobrun[0] = 1 << r
                if r:
                    eobrun[0] += reader.read_bits(r)
                break  # remaining coefficients handled by the EOB-run path
            # advance past r zero-history positions, refining nonzero history
            while k <= se:
                if block[k] != 0:
                    if reader.read_bit() and (block[k] & p1) == 0:
                        block[k] += p1 if block[k] >= 0 else m1
                else:
                    if r == 0:
                        break
                    r -= 1
                k += 1
            if sgn and k <= se:
                block[k] = sgn
            k += 1
    if eobrun[0] > 0:
        while k <= se:
            if block[k] != 0 and reader.read_bit() and (block[k] & p1) == 0:
                block[k] += p1 if block[k] >= 0 else m1
            k += 1
        eobrun[0] -= 1


def _decode_scan_progressive(
    data, start, frame, scan, ss, se, ah, al, coefs, huff_dc, huff_ac,
    restart_interval,
):
    """Decode one progressive SOS into the frame coefficient buffers;
    returns the stream position just past the consumed entropy data."""
    if ss == 0 and se != 0:
        raise ValueError("progressive DC scan must have Se=0")
    if se > 63 or ss > se:
        raise ValueError(f"invalid progressive spectral band {ss}..{se}")
    if ss != 0 and len(scan) != 1:
        raise ValueError("progressive AC scans are single-component")
    h, w = frame["h"], frame["w"]
    hmax, vmax, mcus_x, mcus_y = _frame_geometry(frame)

    # block visit order: interleaved MCU order for multi-component (DC)
    # scans, the component's own non-interleaved block grid otherwise
    units = []
    if len(scan) > 1:
        for my in range(mcus_y):
            for mx in range(mcus_x):
                mcu = []
                for s in scan:
                    for by in range(s["v"]):
                        for bx in range(s["h"]):
                            mcu.append((s, my * s["v"] + by, mx * s["h"] + bx))
                units.append(mcu)
    else:
        s = scan[0]
        nbx = (-(-(w * s["h"]) // hmax) + 7) // 8
        nby = (-(-(h * s["v"]) // vmax) + 7) // 8
        units = [[(s, by, bx)] for by in range(nby) for bx in range(nbx)]

    reader = _BitReader(data, start)
    pred = [0] * len(frame["comps"])
    eobrun = [0]
    count = 0
    for unit in units:
        if restart_interval and count and count % restart_interval == 0:
            reader.align_to_marker()
            while data[reader.pos] != 0xFF or not (
                0xD0 <= data[reader.pos + 1] <= 0xD7
            ):
                reader.pos += 1
            reader.pos += 2
            pred = [0] * len(frame["comps"])
            eobrun[0] = 0
        for s, by, bx in unit:
            block = coefs[s["ci"]][by, bx]
            if ss == 0:
                if ah == 0:
                    _dc_first(reader, block, huff_dc[s["dc"]], pred, s["ci"], al)
                else:
                    _dc_refine(reader, block, al)
            else:
                if ah == 0:
                    _ac_first(reader, block, huff_ac[s["ac"]], ss, se, al, eobrun)
                else:
                    _ac_refine(reader, block, huff_ac[s["ac"]], ss, se, al, eobrun)
        count += 1
    return reader.pos


def _reconstruct_progressive(frame, coefs, qt):
    """Dequantize + IDCT the accumulated coefficient buffers."""
    h, w = frame["h"], frame["w"]
    hmax, vmax, _, _ = _frame_geometry(frame)
    planes = []
    for ci, comp in enumerate(frame["comps"]):
        arr = coefs[ci]
        nby, nbx, _ = arr.shape
        q = qt[comp["tq"]]
        plane = np.zeros((nby * 8, nbx * 8), dtype=np.float64)
        for by in range(nby):
            for bx in range(nbx):
                block = np.zeros(64, dtype=np.float64)
                block[_ZIGZAG] = arr[by, bx] * q
                plane[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = (
                    _idct(block.reshape(8, 8)) + 128.0
                )
        planes.append(plane)
    return _assemble_planes(planes, frame["comps"], hmax, vmax, h, w)


# --- encoder (4:4:4, flat quant, embedded simple Huffman tables) -------------

# encoder-side canonical tables: 12 DC size symbols at 4 bits; all 256 AC
# (run, size) symbols at 9 bits except the last at 10 (a DHT count byte caps
# at 255) — valid prefix codes, declared in DHT so any spec-compliant
# decoder reads them. Simplicity over compression ratio.
_ENC_DC_COUNTS = [0, 0, 0, 12, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0]
_ENC_DC_SYMBOLS = list(range(12))
_ENC_AC_COUNTS = [0, 0, 0, 0, 0, 0, 0, 0, 255, 1, 0, 0, 0, 0, 0, 0]
_ENC_AC_SYMBOLS = list(range(256))
_ENC_DC = _encode_lengths(_ENC_DC_COUNTS, _ENC_DC_SYMBOLS)
_ENC_AC = _encode_lengths(_ENC_AC_COUNTS, _ENC_AC_SYMBOLS)


def _size_of(v: int) -> int:
    return 0 if v == 0 else int(abs(v)).bit_length()


def _write_block(writer: _BitWriter, coeffs: np.ndarray, pred: int) -> int:
    dc = int(coeffs[0])
    diff = dc - pred
    s = _size_of(diff)
    length, code = _ENC_DC[s]
    writer.write(code, length)
    if s:
        writer.write(diff if diff >= 0 else diff + (1 << s) - 1, s)
    run = 0
    last_nz = int(np.nonzero(coeffs)[0].max()) if np.any(coeffs) else 0
    for k in range(1, 64):
        v = int(coeffs[k])
        if k > last_nz:
            length, code = _ENC_AC[0x00]  # EOB
            writer.write(code, length)
            break
        if v == 0:
            run += 1
            if run == 16:
                length, code = _ENC_AC[0xF0]  # ZRL
                writer.write(code, length)
                run = 0
            continue
        s = _size_of(v)
        length, code = _ENC_AC[(run << 4) | s]
        writer.write(code, length)
        writer.write(v if v >= 0 else v + (1 << s) - 1, s)
        run = 0
    return dc


def _seg(marker: int, payload: bytes) -> bytes:
    return bytes([0xFF, marker]) + struct.pack(">H", len(payload) + 2) + payload


def encode_jpeg_baseline(
    arr: np.ndarray,
    quant_scale: int = 1,
    subsampling: str = "444",
    restart_interval: int = 0,
) -> bytes:
    """uint8 (h, w) or (h, w, 3) -> baseline JFIF bytes. Flat quantization =
    ``quant_scale`` at every coefficient (1 = near-lossless, larger =
    lossier); ``subsampling``: '444' or '420' (2x2 box-filtered chroma);
    ``restart_interval``: emit DRI + RSTn every N MCUs when > 0."""
    arr = np.asarray(arr, dtype=np.uint8)
    h, w = arr.shape[:2]
    planes, factors = _split_planes(arr, subsampling)

    hmax = max(f[0] for f in factors)
    vmax = max(f[1] for f in factors)
    # flat table: identical value at every position, so zigzag serialization
    # order (which DQT requires) is trivially satisfied
    q = np.full(64, int(quant_scale), dtype=np.int32)
    out = bytearray(b"\xff\xd8")  # SOI
    out += _seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += _seg(0xDB, bytes([0x00]) + bytes(q.astype(np.uint8)))
    ncomp = len(planes)
    sof = struct.pack(">BHHB", 8, h, w, ncomp)
    for c in range(ncomp):
        sof += bytes([c + 1, (factors[c][0] << 4) | factors[c][1], 0])
    out += _seg(0xC0, sof)
    dht = bytes([0x00]) + bytes(_ENC_DC_COUNTS) + bytes(_ENC_DC_SYMBOLS)
    dht += bytes([0x10]) + bytes(_ENC_AC_COUNTS) + bytes(_ENC_AC_SYMBOLS)
    out += _seg(0xC4, dht)
    if restart_interval:
        out += _seg(0xDD, struct.pack(">H", restart_interval))
    sos = bytes([ncomp])
    for c in range(ncomp):
        sos += bytes([c + 1, 0x00])  # DC table 0, AC table 0
    sos += bytes([0, 63, 0])
    out += _seg(0xDA, sos)

    mcus_x = (w + 8 * hmax - 1) // (8 * hmax)
    mcus_y = (h + 8 * vmax - 1) // (8 * vmax)
    padded = []
    for p, (fh, fv) in zip(planes, factors):
        th, tw = mcus_y * fv * 8, mcus_x * fh * 8
        padded.append(
            np.pad(p, ((0, th - p.shape[0]), (0, tw - p.shape[1])), mode="edge")
        )

    writer = _BitWriter()
    pred = [0] * ncomp
    mcu_count = 0
    rst = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                out += writer.flush()
                out += bytes([0xFF, 0xD0 + rst])
                rst = (rst + 1) & 7
                writer = _BitWriter()
                pred = [0] * ncomp
            for ci, p in enumerate(padded):
                fh, fv = factors[ci]
                for by in range(fv):
                    for bx in range(fh):
                        y0 = (my * fv + by) * 8
                        x0 = (mx * fh + bx) * 8
                        block = p[y0 : y0 + 8, x0 : x0 + 8] - 128.0
                        coef = np.round(
                            _fdct(block) / float(quant_scale)
                        ).astype(np.int64)
                        pred[ci] = _write_block(
                            writer, coef.ravel()[_ZIGZAG], pred[ci]
                        )
            mcu_count += 1
    out += writer.flush()
    out += b"\xff\xd9"  # EOI
    return bytes(out)


def _arith_encode_dc(enc, st, ctx, cond, diff):
    """Encode one DC difference (mirror of ``_arith_decode_dc``); returns
    the next conditioning context."""
    L, U = cond
    if diff == 0:
        enc.encode(st, ctx, 0)
        return 0
    enc.encode(st, ctx, 1)
    sign = 1 if diff < 0 else 0
    enc.encode(st, ctx + 1, sign)
    sz = abs(diff) - 1
    idx = ctx + 2 + sign
    if sz == 0:
        enc.encode(st, idx, 0)
        m = 0
    else:
        enc.encode(st, idx, 1)
        m = 1
        idx = 20
        while sz >= (m << 1):
            enc.encode(st, idx, 1)
            m <<= 1
            idx += 1
        enc.encode(st, idx, 0)
    if m < (1 << L) >> 1:
        new_ctx = 0
    elif m > (1 << U) >> 1:
        new_ctx = 12 + 4 * sign
    else:
        new_ctx = 4 + 4 * sign
    idx += 14
    mm = m
    while mm := mm >> 1:
        enc.encode(st, idx, 1 if (sz & mm) else 0)
    return new_ctx


def _arith_encode_block_ac(enc, st, fixed, kx, zz):
    """Encode AC coefficients (mirror of ``_arith_decode_block_ac``)."""
    nz = [k for k in range(1, 64) if zz[k] != 0]
    last = nz[-1] if nz else 0
    k = 1
    while k <= last:
        base = 3 * (k - 1)
        enc.encode(st, base, 0)  # not EOB at this position
        while zz[k] == 0:
            enc.encode(st, base + 1, 0)
            k += 1
            base += 3
        enc.encode(st, base + 1, 1)
        v = int(zz[k])
        sign = 1 if v < 0 else 0
        enc.encode(fixed, 0, sign)
        sz = abs(v) - 1
        idx = base + 2
        if sz == 0:
            enc.encode(st, idx, 0)
            m = 0
        else:
            enc.encode(st, idx, 1)
            if sz == 1:
                enc.encode(st, idx, 0)
                m = 1
            else:
                enc.encode(st, idx, 1)
                m = 2
                idx = 189 if k <= kx else 217
                while sz >= (m << 1):
                    enc.encode(st, idx, 1)
                    m <<= 1
                    idx += 1
                enc.encode(st, idx, 0)
        idx += 14
        mm = m
        while mm := mm >> 1:
            enc.encode(st, idx, 1 if (sz & mm) else 0)
        k += 1
    if last < 63:
        enc.encode(st, 3 * last, 1)  # EOB


def encode_jpeg_arith(
    arr: np.ndarray,
    quant_scale: int = 1,
    subsampling: str = "444",
    restart_interval: int = 0,
) -> bytes:
    """uint8 (h, w) or (h, w, 3) -> SOF9 arithmetic-coded JFIF bytes —
    the independent forward path for the arithmetic decoder (same flat
    quantization / subsampling surface as ``encode_jpeg_baseline``; DAC
    carries the default conditioning (L=0, U=1, Kx=5) explicitly)."""
    from .jpeg_arith import FIXED_BIN, ArithEncoder

    arr = np.asarray(arr, dtype=np.uint8)
    h, w = arr.shape[:2]
    planes, factors = _split_planes(arr, subsampling)
    hmax = max(f[0] for f in factors)
    vmax = max(f[1] for f in factors)
    q = np.full(64, int(quant_scale), dtype=np.int32)
    out = bytearray(b"\xff\xd8")
    out += _seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += _seg(0xDB, bytes([0x00]) + bytes(q.astype(np.uint8)))
    ncomp = len(planes)
    sof = struct.pack(">BHHB", 8, h, w, ncomp)
    for c in range(ncomp):
        sof += bytes([c + 1, (factors[c][0] << 4) | factors[c][1], 0])
    out += _seg(0xC9, sof)  # SOF9: extended sequential, arithmetic coding
    out += _seg(0xCC, bytes([0x00, 0x10, 0x10, 5]))  # DAC: L=0 U=1; Kx=5
    if restart_interval:
        out += _seg(0xDD, struct.pack(">H", restart_interval))
    sos = bytes([ncomp])
    for c in range(ncomp):
        sos += bytes([c + 1, 0x00])
    sos += bytes([0, 63, 0])
    out += _seg(0xDA, sos)

    mcus_x = (w + 8 * hmax - 1) // (8 * hmax)
    mcus_y = (h + 8 * vmax - 1) // (8 * vmax)
    padded = []
    for p, (fh, fv) in zip(planes, factors):
        th, tw = mcus_y * fv * 8, mcus_x * fh * 8
        padded.append(
            np.pad(p, ((0, th - p.shape[0]), (0, tw - p.shape[1])), mode="edge")
        )

    def fresh():
        return (
            ArithEncoder(), bytearray(64), bytearray(256),
            bytearray([FIXED_BIN]), [0] * ncomp, [0] * ncomp,
        )

    enc, dc_st, ac_st, fixed, dc_ctx, pred = fresh()
    mcu_count = 0
    rst = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                out += enc.flush()
                out += bytes([0xFF, 0xD0 + rst])
                rst = (rst + 1) & 7
                enc, dc_st, ac_st, fixed, dc_ctx, pred = fresh()
            for ci, p in enumerate(padded):
                fh, fv = factors[ci]
                for by in range(fv):
                    for bx in range(fh):
                        y0 = (my * fv + by) * 8
                        x0 = (mx * fh + bx) * 8
                        block = p[y0 : y0 + 8, x0 : x0 + 8] - 128.0
                        coef = np.round(
                            _fdct(block) / float(quant_scale)
                        ).astype(np.int64)
                        zz = coef.ravel()[_ZIGZAG]
                        diff = int(zz[0]) - pred[ci]
                        pred[ci] = int(zz[0])
                        dc_ctx[ci] = _arith_encode_dc(
                            enc, dc_st, dc_ctx[ci], (0, 1), diff)
                        _arith_encode_block_ac(enc, ac_st, fixed, 5, zz)
            mcu_count += 1
    out += enc.flush()
    out += b"\xff\xd9"
    return bytes(out)


# --- progressive encoder (fixture generator: spectral selection +
#     successive approximation, the scan script libjpeg calls "simple
#     progression") ------------------------------------------------------------


def _emit_eobrun(writer: _BitWriter, state: dict) -> None:
    """Close a pending EOB run: EOBn symbol + length bits, then the
    correction bits buffered while the run was open (T.81 G.1.2.2-3)."""
    if state["eobrun"] > 0:
        n = state["eobrun"].bit_length() - 1
        length, code = _ENC_AC[n << 4]
        writer.write(code, length)
        if n:
            writer.write(state["eobrun"] - (1 << n), n)
        state["eobrun"] = 0
        for b in state["be_bits"]:
            writer.write(b, 1)
        state["be_bits"] = []


def _enc_dc_first(writer, block, al, pred, ci):
    t = int(block[0]) >> al  # arithmetic shift: the DC point transform
    diff = t - pred[ci]
    pred[ci] = t
    s = _size_of(diff)
    length, code = _ENC_DC[s]
    writer.write(code, length)
    if s:
        writer.write(diff if diff >= 0 else diff + (1 << s) - 1, s)


def _enc_dc_refine(writer, block, al):
    writer.write((int(block[0]) >> al) & 1, 1)


def _enc_ac_first(writer, block, ss, se, al, state):
    r = 0
    for k in range(ss, se + 1):
        t = int(block[k])
        a = abs(t) >> al  # AC point transform truncates toward zero
        if a == 0:
            r += 1
            continue
        _emit_eobrun(writer, state)
        while r > 15:
            length, code = _ENC_AC[0xF0]
            writer.write(code, length)
            r -= 16
        s = a.bit_length()
        length, code = _ENC_AC[(r << 4) | s]
        writer.write(code, length)
        writer.write(a if t >= 0 else -a + (1 << s) - 1, s)
        r = 0
    if r > 0:
        state["eobrun"] += 1
        if state["eobrun"] == 0x7FFF:
            _emit_eobrun(writer, state)


def _enc_ac_refine(writer, block, ss, se, al, state):
    # scaled magnitudes; EOB = last position that becomes NEWLY significant
    absval = [0] * (se + 1)
    eob = ss - 1
    for k in range(ss, se + 1):
        a = abs(int(block[k])) >> al
        absval[k] = a
        if a == 1:
            eob = k
    r = 0
    br: list[int] = []  # correction bits pending within this block
    for k in range(ss, se + 1):
        a = absval[k]
        if a == 0:
            r += 1
            continue
        while r > 15 and k <= eob:
            _emit_eobrun(writer, state)
            length, code = _ENC_AC[0xF0]
            writer.write(code, length)
            r -= 16
            for b in br:
                writer.write(b, 1)
            br = []
        if a > 1:  # significant in an earlier scan: one correction bit
            br.append(a & 1)
            continue
        _emit_eobrun(writer, state)
        length, code = _ENC_AC[(r << 4) | 1]
        writer.write(code, length)
        writer.write(1 if int(block[k]) >= 0 else 0, 1)
        for b in br:
            writer.write(b, 1)
        br = []
        r = 0
    if r > 0 or br:
        state["eobrun"] += 1
        state["be_bits"].extend(br)
        if state["eobrun"] == 0x7FFF or len(state["be_bits"]) > 937:
            _emit_eobrun(writer, state)


def _split_planes(arr: np.ndarray, subsampling: str):
    """uint8 image -> (planes, factors): grayscale passthrough or YCbCr
    split with optional 2x2 box-filtered chroma — the exact math of
    ``encode_jpeg_baseline``, shared so both encoders quantize identical
    plane bytes (the identity tests depend on it)."""
    gray = arr.ndim == 2
    h, w = arr.shape[:2]
    if gray:
        return [arr.astype(np.float64)], [(1, 1)]
    rf, gf, bf = (arr[..., i].astype(np.float64) for i in range(3))
    y = 0.299 * rf + 0.587 * gf + 0.114 * bf
    cb = -0.168736 * rf - 0.331264 * gf + 0.5 * bf + 128.0
    cr = 0.5 * rf - 0.418688 * gf - 0.081312 * bf + 128.0
    if subsampling == "420":
        he, we = h + (h & 1), w + (w & 1)
        cbp = np.pad(cb, ((0, he - h), (0, we - w)), mode="edge")
        crp = np.pad(cr, ((0, he - h), (0, we - w)), mode="edge")
        cb = cbp.reshape(he // 2, 2, we // 2, 2).mean(axis=(1, 3))
        cr = crp.reshape(he // 2, 2, we // 2, 2).mean(axis=(1, 3))
        return [y, cb, cr], [(2, 2), (1, 1), (1, 1)]
    if subsampling == "444":
        return [y, cb, cr], [(1, 1), (1, 1), (1, 1)]
    raise ValueError(f"unsupported subsampling {subsampling!r}")


def encode_jpeg_progressive(
    arr: np.ndarray, quant_scale: int = 1, subsampling: str = "444"
) -> bytes:
    """uint8 (h, w) or (h, w, 3) -> progressive (SOF2) JFIF bytes,
    4:4:4 or 4:2:0 (the layout most real web progressive JPEGs use).

    Same flat quantization as ``encode_jpeg_baseline``, so after every scan
    is applied the reconstructed coefficients are EXACTLY the baseline
    encoder's coefficients — decode(progressive) == decode(baseline) byte
    for byte, which the tests assert (for 4:2:0 the AC of MCU-padding
    blocks outside a component's non-interleaved grid stays zero, which
    only ever touches cropped pixels). The scan script exercises all four
    progressive block-coder paths: interleaved DC first (Al=1), split AC
    bands first (Al=2), two AC refinements (2->1, 1->0), DC refinement."""
    arr = np.asarray(arr, dtype=np.uint8)
    h, w = arr.shape[:2]
    planes, factors = _split_planes(arr, subsampling)
    ncomp = len(planes)
    hmax = max(f[0] for f in factors)
    vmax = max(f[1] for f in factors)
    mcus_x = (w + 8 * hmax - 1) // (8 * hmax)
    mcus_y = (h + 8 * vmax - 1) // (8 * vmax)

    coefs = []
    ni_grid = []  # per component: its non-interleaved (blocks_y, blocks_x)
    for p, (fh, fv) in zip(planes, factors):
        nbx_p, nby_p = mcus_x * fh, mcus_y * fv
        padded = np.pad(
            p, ((0, nby_p * 8 - p.shape[0]), (0, nbx_p * 8 - p.shape[1])),
            mode="edge",
        )
        blk = np.zeros((nby_p, nbx_p, 64), dtype=np.int64)
        for by in range(nby_p):
            for bx in range(nbx_p):
                block = padded[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] - 128.0
                c = np.round(_fdct(block) / float(quant_scale)).astype(np.int64)
                blk[by, bx] = c.ravel()[_ZIGZAG]
        coefs.append(blk)
        cw = -(-(w * fh) // hmax)
        ch = -(-(h * fv) // vmax)
        ni_grid.append(((ch + 7) // 8, (cw + 7) // 8))

    q = np.full(64, int(quant_scale), dtype=np.int32)
    out = bytearray(b"\xff\xd8")
    out += _seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += _seg(0xDB, bytes([0x00]) + bytes(q.astype(np.uint8)))
    sof = struct.pack(">BHHB", 8, h, w, ncomp)
    for c in range(ncomp):
        sof += bytes([c + 1, (factors[c][0] << 4) | factors[c][1], 0])
    out += _seg(0xC2, sof)  # SOF2: progressive DCT, Huffman
    dht = bytes([0x00]) + bytes(_ENC_DC_COUNTS) + bytes(_ENC_DC_SYMBOLS)
    dht += bytes([0x10]) + bytes(_ENC_AC_COUNTS) + bytes(_ENC_AC_SYMBOLS)
    out += _seg(0xC4, dht)

    all_comps = list(range(ncomp))
    scans = [(all_comps, 0, 0, 0, 1)]
    scans += [([c], 1, 5, 0, 2) for c in all_comps]
    scans += [([c], 6, 63, 0, 2) for c in all_comps]
    scans += [([c], 1, 63, 2, 1) for c in all_comps]
    scans += [(all_comps, 0, 0, 1, 0)]
    scans += [([c], 1, 63, 1, 0) for c in all_comps]

    for comp_idx, ss, se, ah, al in scans:
        sos = bytes([len(comp_idx)])
        for c in comp_idx:
            sos += bytes([c + 1, 0x00])
        sos += bytes([ss, se, (ah << 4) | al])
        out += _seg(0xDA, sos)
        writer = _BitWriter()
        state = {"eobrun": 0, "be_bits": []}
        pred = [0] * ncomp
        # block visit order must mirror the decoder's: interleaved MCU
        # order (all sampling-factor blocks, padding included) for
        # multi-component DC scans; the component's own non-interleaved
        # grid otherwise
        if len(comp_idx) > 1:
            blocks = [
                (ci, my * factors[ci][1] + by, mx * factors[ci][0] + bx)
                for my in range(mcus_y)
                for mx in range(mcus_x)
                for ci in comp_idx
                for by in range(factors[ci][1])
                for bx in range(factors[ci][0])
            ]
        else:
            ci = comp_idx[0]
            nby_ni, nbx_ni = ni_grid[ci]
            blocks = [
                (ci, by, bx) for by in range(nby_ni) for bx in range(nbx_ni)
            ]
        for ci, by, bx in blocks:
            block = coefs[ci][by, bx]
            if ss == 0:
                if ah == 0:
                    _enc_dc_first(writer, block, al, pred, ci)
                else:
                    _enc_dc_refine(writer, block, al)
            elif ah == 0:
                _enc_ac_first(writer, block, ss, se, al, state)
            else:
                _enc_ac_refine(writer, block, ss, se, al, state)
        if ss != 0:
            _emit_eobrun(writer, state)
        out += writer.flush()
    out += b"\xff\xd9"
    return bytes(out)
