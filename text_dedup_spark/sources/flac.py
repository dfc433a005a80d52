"""Pure-Python FLAC codec — the public FLAC format specification (RFC 9639).

FLAC is the dominant lossless ARCHIVAL audio format; this closes the
"compressed audio" gap left after WAV (functions/media_udf.decode_wav):
a real compressed stream now decodes natively, with no external backend.

decode — the full fixed-blocksize subset surface:
- STREAMINFO + skipped metadata blocks (padding/comments/seektables);
- frame headers: sync + blocking strategy, all blocksize/sample-rate/
  sample-size codes (incl. the 8/16-bit explicit forms), the UTF-8-style
  coded frame/sample number, CRC-8 (poly 0x07) verified per header;
- subframes: CONSTANT, VERBATIM, FIXED orders 0-4 (restored with
  repeated cumulative sums, vectorized), LPC orders 1-32 (quantized
  integer coefficients + arithmetic-shift feedback);
- Rice-coded residuals (both 4- and 5-bit parameter widths), all
  partition orders, and the escape-to-raw partition form;
- stereo decorrelation: independent, left/side, right/side, mid/side
  (side channel carries the +1-bit sample size);
- wasted-bits shifting, CRC-16 (poly 0x8005) verified per frame;
- the stream's own STREAMINFO MD5 as an intrinsic oracle: decoding is
  only reported clean if the MD5 of the reconstructed PCM matches the
  checksum the ENCODER embedded — a decoder bug cannot pass silently.

encode — a real encoder for fixtures and as an output path: per-block
best-of fixed predictors (orders 0-4), optional integer-quantized LPC
(autocorrelation + Levinson-Durbin), per-partition Rice parameter
search with escape-to-raw, constant/verbatim forms, wasted-bits
detection, left/side / right/side / mid/side stereo decisions, correct
CRC-8/CRC-16/MD5. Round-trips are bit-exact by construction (lossless);
tests additionally pin hand-assembled bitstreams so a matched
encoder/decoder bug cannot hide (the lesson the VP8L golden taught).

No system flac/ffmpeg/soundfile exists in this environment, so the
embedded-MD5 check is the reference oracle here: it is produced by the
writer from the raw PCM *before* encoding and verified by the reader
from the decoded PCM *after* — the two sides share no code path.

Scale note: decoding runs inside Arrow-batched pandas UDFs
(functions/media_udf.decode_audio dispatches on the fLaC magic), one
clip per row — embarrassingly parallel across executors, no shuffle.
"""

from __future__ import annotations

import hashlib
import struct

import numpy as np

_CRC8_POLY = 0x07
_CRC16_POLY = 0x8005


def _make_crc8_table() -> np.ndarray:
    t = np.zeros(256, dtype=np.uint8)
    for i in range(256):
        c = i
        for _ in range(8):
            c = ((c << 1) ^ _CRC8_POLY) & 0xFF if c & 0x80 else (c << 1) & 0xFF
        t[i] = c
    return t


def _make_crc16_table() -> np.ndarray:
    t = np.zeros(256, dtype=np.uint16)
    for i in range(256):
        c = i << 8
        for _ in range(8):
            c = ((c << 1) ^ _CRC16_POLY) & 0xFFFF if c & 0x8000 else (c << 1) & 0xFFFF
        t[i] = c
    return t


_CRC8_TABLE = _make_crc8_table()
_CRC16_TABLE = _make_crc16_table()


def crc8(data: bytes) -> int:
    c = 0
    for b in data:
        c = int(_CRC8_TABLE[c ^ b])
    return c


def crc16(data: bytes) -> int:
    c = 0
    for b in data:
        c = int(_CRC16_TABLE[((c >> 8) ^ b) & 0xFF]) ^ ((c << 8) & 0xFFFF)
    return c


# ---------------------------------------------------------------- bit I/O
# FLAC is MSB-first (unlike VP8L's LSB-first DEFLATE convention). The
# reader unpacks the whole stream to a bit array once; unary runs (the
# Rice quotients, the hot loop) resolve via a precomputed one-positions
# index + searchsorted instead of a per-bit Python loop.


class _BitReader:
    __slots__ = ("data", "bits", "ones", "p", "_pow2")

    def __init__(self, data: bytes):
        self.data = data
        self.bits = np.unpackbits(np.frombuffer(data, dtype=np.uint8))
        self.ones = np.flatnonzero(self.bits)
        self.p = 0
        self._pow2 = 1 << np.arange(62, -1, -1, dtype=np.int64)

    def read(self, n: int) -> int:
        """n-bit MSB-first unsigned read (n <= 62)."""
        q = self.p + n
        if q > self.bits.size:
            raise ValueError("FLAC stream truncated")
        v = int(self.bits[self.p : q].astype(np.int64) @ self._pow2[63 - n :])
        self.p = q
        return v

    def read_signed(self, n: int) -> int:
        v = self.read(n)
        return v - (1 << n) if v >= (1 << (n - 1)) else v

    def read_unary(self) -> int:
        """Count of 0 bits before the next 1 bit (consumes the 1)."""
        i = int(np.searchsorted(self.ones, self.p))
        if i >= self.ones.size:
            raise ValueError("FLAC stream truncated in unary run")
        one = int(self.ones[i])
        q = one - self.p
        self.p = one + 1
        return q

    def align(self) -> None:
        self.p = (self.p + 7) & ~7

    def byte_pos(self) -> int:
        return self.p >> 3

    def at_end(self) -> bool:
        return self.p >= self.bits.size


class _BitWriter:
    __slots__ = ("buf", "acc", "n")

    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, v: int, n: int) -> None:
        self.acc = (self.acc << n) | (v & ((1 << n) - 1))
        self.n += n
        while self.n >= 8:
            self.n -= 8
            self.buf.append((self.acc >> self.n) & 0xFF)
        self.acc &= (1 << self.n) - 1

    def write_signed(self, v: int, n: int) -> None:
        self.write(v & ((1 << n) - 1), n)

    def write_unary(self, q: int) -> None:
        while q >= 32:
            self.write(0, 32)
            q -= 32
        self.write(1, q + 1)

    def align(self) -> None:
        if self.n:
            self.write(0, 8 - self.n)

    def bytes(self) -> bytes:
        assert self.n == 0
        return bytes(self.buf)


# ------------------------------------------------------------- coded number


def _read_coded_number(br: _BitReader) -> int:
    """UTF-8-style variable-length number (RFC 9639 frame/sample number)."""
    b0 = br.read(8)
    if b0 < 0x80:
        return b0
    n_cont = 0
    mask = 0x40
    while b0 & mask:
        n_cont += 1
        mask >>= 1
    if n_cont < 1 or n_cont > 6:
        raise ValueError("invalid FLAC coded number lead byte")
    v = b0 & (mask - 1)
    for _ in range(n_cont):
        b = br.read(8)
        if b & 0xC0 != 0x80:
            raise ValueError("invalid FLAC coded number continuation")
        v = (v << 6) | (b & 0x3F)
    return v


def _write_coded_number(bw: _BitWriter, v: int) -> None:
    if v < 0x80:
        bw.write(v, 8)
        return
    for n_cont in range(1, 7):
        if v < (1 << (6 * n_cont + 6 - n_cont)):
            break
    lead = (0xFF << (7 - n_cont)) & 0xFF
    bw.write(lead | (v >> (6 * n_cont)), 8)
    for i in range(n_cont - 1, -1, -1):
        bw.write(0x80 | ((v >> (6 * i)) & 0x3F), 8)


# ------------------------------------------------------------------ tables

_BLOCKSIZE_CODES = {192: 1, 576: 2, 1152: 3, 2304: 4, 4608: 5,
                    256: 8, 512: 9, 1024: 10, 2048: 11, 4096: 12,
                    8192: 13, 16384: 14, 32768: 15}
_RATE_CODES = {88200: 1, 176400: 2, 192000: 3, 8000: 4, 16000: 5, 22050: 6,
               24000: 7, 32000: 8, 44100: 9, 48000: 10, 96000: 11}
_RATE_BY_CODE = {v: k for k, v in _RATE_CODES.items()}
_BPS_CODES = {8: 1, 12: 2, 16: 4, 20: 5, 24: 6, 32: 7}
_BPS_BY_CODE = {v: k for k, v in _BPS_CODES.items()}


# ---------------------------------------------------------------- residuals


def _zigzag(v: np.ndarray) -> np.ndarray:
    v = v.astype(np.int64)
    return np.where(v >= 0, v << 1, (-v << 1) - 1)


def _read_residual(br: _BitReader, blocksize: int, order: int) -> np.ndarray:
    method = br.read(2)
    if method > 1:
        raise ValueError("reserved FLAC residual coding method")
    pbits = 4 if method == 0 else 5
    escape = (1 << pbits) - 1
    part_order = br.read(4)
    n_parts = 1 << part_order
    if blocksize % n_parts or (blocksize >> part_order) <= order:
        raise ValueError("invalid FLAC partition order")
    out = np.empty(blocksize - order, dtype=np.int64)
    w = 0
    for part in range(n_parts):
        cnt = (blocksize >> part_order) - (order if part == 0 else 0)
        param = br.read(pbits)
        if param == escape:
            raw_bits = br.read(5)
            if raw_bits == 0:
                out[w : w + cnt] = 0
            else:
                for i in range(cnt):
                    out[w + i] = br.read_signed(raw_bits)
        else:
            for i in range(cnt):
                q = br.read_unary()
                u = (q << param) | br.read(param)
                out[w + i] = (u >> 1) ^ -(u & 1)
        w += cnt
    return out


def _write_rice_partition(bw: _BitWriter, res: np.ndarray, param: int) -> None:
    for u in _zigzag(res):
        u = int(u)
        bw.write_unary(u >> param)
        if param:
            bw.write(u & ((1 << param) - 1), param)


def _best_rice_param(res: np.ndarray, pbits: int) -> tuple[int, int]:
    """(param, cost_bits) minimizing the Rice cost; param == escape means raw."""
    u = _zigzag(res)
    escape = (1 << pbits) - 1
    best_p, best_cost = 0, None
    for p in range(escape):
        cost = int(np.sum(u >> p)) + len(u) * (p + 1)
        if best_cost is None or cost < best_cost:
            best_p, best_cost = p, cost
    raw_bits = max(1, int(np.max(np.abs(u) >> 1)).bit_length() + 1) if len(u) else 1
    raw_cost = 5 + raw_bits * len(u)
    if raw_cost < best_cost:
        return escape, raw_cost
    return best_p, best_cost


def _write_residual(bw: _BitWriter, res: np.ndarray, blocksize: int,
                    order: int, part_order: int = 0) -> None:
    pbits = 4
    escape = (1 << pbits) - 1
    bw.write(0, 2)  # method 0: 4-bit Rice params
    bw.write(part_order, 4)
    n_parts = 1 << part_order
    w = 0
    for part in range(n_parts):
        cnt = (blocksize >> part_order) - (order if part == 0 else 0)
        chunk = res[w : w + cnt]
        param, _ = _best_rice_param(chunk, pbits)
        bw.write(param, pbits)
        if param == escape:
            raw_bits = max(1, int(np.max(np.abs(_zigzag(chunk)) >> 1)).bit_length() + 1) \
                if len(chunk) else 1
            bw.write(raw_bits, 5)
            for v in chunk:
                bw.write_signed(int(v), raw_bits)
        else:
            _write_rice_partition(bw, chunk, param)
        w += cnt


# ----------------------------------------------------------- fixed / LPC


def _restore_fixed(warm: np.ndarray, res: np.ndarray, order: int) -> np.ndarray:
    """Invert the order-k difference predictor with k cumulative sums."""
    if order == 0:
        return res.copy()
    diffs = [warm.astype(np.int64)]
    for _ in range(order):
        diffs.append(np.diff(diffs[-1]))
    cur = res.astype(np.int64)
    for k in range(order, 0, -1):
        cur = int(diffs[k - 1][-1]) + np.cumsum(cur)
    return np.concatenate([warm.astype(np.int64), cur])


def _fixed_residual(s: np.ndarray, order: int) -> np.ndarray:
    r = s.astype(np.int64)
    for _ in range(order):
        r = np.diff(r)
    return r


def _restore_lpc(warm: np.ndarray, res: np.ndarray, coefs: list[int],
                 shift: int) -> np.ndarray:
    order = len(coefs)
    out = [int(v) for v in warm]
    rev = coefs  # coefs[0] applies to the most recent sample
    for r in res:
        acc = 0
        for j in range(order):
            acc += rev[j] * out[-1 - j]
        out.append(int(r) + (acc >> shift))
    return np.asarray(out, dtype=np.int64)


def _lpc_residual(s: np.ndarray, coefs: list[int], shift: int) -> np.ndarray:
    """Vectorized integer LPC residual (exact match of the decoder loop)."""
    order = len(coefs)
    s64 = s.astype(np.int64)
    acc = np.zeros(len(s) - order, dtype=np.int64)
    for j, c in enumerate(coefs):
        acc += c * s64[order - 1 - j : len(s) - 1 - j]
    return s64[order:] - (acc >> shift)


def _levinson_durbin(autoc: np.ndarray, order: int) -> np.ndarray:
    err = autoc[0]
    coefs = np.zeros(order)
    for i in range(order):
        acc = autoc[i + 1]
        for j in range(i):
            acc -= coefs[j] * autoc[i - j]
        k = acc / err if err > 0 else 0.0
        new = coefs.copy()
        new[i] = k
        for j in range(i):
            new[j] = coefs[j] - k * coefs[i - 1 - j]
        coefs = new
        err *= 1 - k * k
        if err <= 0:
            break
    return coefs


def _quantize_lpc(coefs: np.ndarray, precision: int = 12) -> tuple[list[int], int]:
    cmax = float(np.max(np.abs(coefs))) if len(coefs) else 0.0
    if cmax <= 0:
        return [0] * len(coefs), 0
    shift = precision - 1 - int(np.floor(np.log2(cmax))) - 1
    shift = max(0, min(15, shift))
    lim = 1 << (precision - 1)
    q = np.clip(np.rint(coefs * (1 << shift)), -lim, lim - 1).astype(np.int64)
    return [int(v) for v in q], shift


# ------------------------------------------------------------------ decode


def _parse_streaminfo(body: bytes) -> dict:
    if len(body) < 34:
        raise ValueError("FLAC STREAMINFO too short")
    min_bs, max_bs = struct.unpack(">HH", body[0:4])
    packed = int.from_bytes(body[10:18], "big")
    rate = packed >> 44
    n_ch = ((packed >> 41) & 0x7) + 1
    bps = ((packed >> 36) & 0x1F) + 1
    total = packed & ((1 << 36) - 1)
    return {
        "min_blocksize": min_bs, "max_blocksize": max_bs,
        "sample_rate": rate, "channels": n_ch, "bps": bps,
        "total_samples": total, "md5": body[18:34],
    }


def _read_subframe(br: _BitReader, blocksize: int, bps: int) -> np.ndarray:
    if br.read(1) != 0:
        raise ValueError("FLAC subframe padding bit set")
    sf_type = br.read(6)
    wasted = 0
    if br.read(1):
        wasted = br.read_unary() + 1
    eff = bps - wasted
    if sf_type == 0:  # CONSTANT
        out = np.full(blocksize, br.read_signed(eff), dtype=np.int64)
    elif sf_type == 1:  # VERBATIM
        out = np.array([br.read_signed(eff) for _ in range(blocksize)], dtype=np.int64)
    elif 8 <= sf_type <= 12:  # FIXED
        order = sf_type - 8
        warm = np.array([br.read_signed(eff) for _ in range(order)], dtype=np.int64)
        res = _read_residual(br, blocksize, order)
        out = _restore_fixed(warm, res, order)
    elif sf_type >= 32:  # LPC
        order = (sf_type & 31) + 1
        warm = np.array([br.read_signed(eff) for _ in range(order)], dtype=np.int64)
        prec = br.read(4)
        if prec == 15:
            raise ValueError("invalid FLAC LPC precision")
        prec += 1
        shift = br.read_signed(5)
        if shift < 0:
            raise ValueError("negative FLAC LPC shift")
        coefs = [br.read_signed(prec) for _ in range(order)]
        res = _read_residual(br, blocksize, order)
        out = _restore_lpc(warm, res, coefs, shift)
    else:
        raise ValueError(f"reserved FLAC subframe type {sf_type}")
    if wasted:
        out = out << wasted
    return out


def _decode_frame(br: _BitReader, info: dict) -> tuple[np.ndarray, int]:
    start = br.byte_pos()
    sync = br.read(14)
    if sync != 0x3FFE:
        raise ValueError("bad FLAC frame sync")
    if br.read(1):
        raise ValueError("reserved FLAC frame bit set")
    br.read(1)  # blocking strategy (0 fixed / 1 variable)
    bs_code = br.read(4)
    rate_code = br.read(4)
    ch_code = br.read(4)
    bps_code = br.read(3)
    if br.read(1):
        raise ValueError("reserved FLAC frame bit set")
    _read_coded_number(br)
    if bs_code == 0:
        raise ValueError("reserved FLAC blocksize code")
    elif bs_code == 6:
        blocksize = br.read(8) + 1
    elif bs_code == 7:
        blocksize = br.read(16) + 1
    else:
        blocksize = {1: 192}.get(bs_code) or (
            576 << (bs_code - 2) if bs_code <= 5 else 256 << (bs_code - 8))
    if rate_code == 0:
        rate = info["sample_rate"]
    elif rate_code in _RATE_BY_CODE:
        rate = _RATE_BY_CODE[rate_code]
    elif rate_code == 12:
        rate = br.read(8) * 1000
    elif rate_code == 13:
        rate = br.read(16)
    elif rate_code == 14:
        rate = br.read(16) * 10
    else:
        raise ValueError("invalid FLAC sample-rate code")
    bps = info["bps"] if bps_code == 0 else _BPS_BY_CODE.get(bps_code)
    if bps is None:
        raise ValueError("reserved FLAC sample-size code")
    hdr_end = br.byte_pos()
    if crc8(br.data[start:hdr_end]) != br.read(8):
        raise ValueError("FLAC frame header CRC-8 mismatch")

    if ch_code < 8:
        n_ch = ch_code + 1
        chans = [_read_subframe(br, blocksize, bps) for _ in range(n_ch)]
    elif ch_code in (8, 9, 10):
        # left/side, right/side, mid/side — side channel gets +1 bit
        side_idx = 1 if ch_code in (8, 10) else 0
        chans = [
            _read_subframe(br, blocksize, bps + (1 if i == side_idx else 0))
            for i in range(2)
        ]
        if ch_code == 8:  # left/side: right = left - side
            chans = [chans[0], chans[0] - chans[1]]
        elif ch_code == 9:  # right/side: left = right + side
            chans = [chans[1] + chans[0], chans[1]]
        else:  # mid/side
            mid, side = chans
            mid = (mid << 1) | (side & 1)
            chans = [(mid + side) >> 1, (mid - side) >> 1]
    else:
        raise ValueError("reserved FLAC channel assignment")
    br.align()
    if crc16(br.data[start : br.byte_pos()]) != br.read(16):
        raise ValueError("FLAC frame CRC-16 mismatch")
    return np.stack(chans, axis=1), rate


def decode_flac_pcm(data: bytes) -> tuple[np.ndarray, int, int]:
    """FLAC bytes -> (int32 samples [n, channels], sample_rate, bps).

    Verifies every frame's CRC-8/CRC-16 and — when STREAMINFO carries a
    non-zero MD5 and bps is byte-aligned — the whole-stream PCM MD5."""
    if len(data) < 8 or data[:4] != b"fLaC":
        raise ValueError("not a FLAC stream")
    pos = 4
    info = None
    while True:
        if pos + 4 > len(data):
            raise ValueError("FLAC metadata truncated")
        hdr = data[pos]
        length = int.from_bytes(data[pos + 1 : pos + 4], "big")
        body = data[pos + 4 : pos + 4 + length]
        if len(body) < length:
            raise ValueError("FLAC metadata truncated")
        if hdr & 0x7F == 0:
            info = _parse_streaminfo(body)
        pos += 4 + length
        if hdr & 0x80:
            break
    if info is None:
        raise ValueError("FLAC stream missing STREAMINFO")
    br = _BitReader(data[pos:])
    frames = []
    rate = info["sample_rate"]
    total = 0
    while not br.at_end():
        # tolerate zero-padding after the last frame only
        if info["total_samples"] and total >= info["total_samples"]:
            break
        block, rate = _decode_frame(br, info)
        frames.append(block)
        total += block.shape[0]
    if not frames:
        raise ValueError("FLAC stream has no frames")
    pcm = np.concatenate(frames, axis=0)
    if info["total_samples"]:
        pcm = pcm[: info["total_samples"]]
    bps = info["bps"]
    if info["md5"] != b"\x00" * 16 and bps % 8 == 0:
        width = bps // 8
        le = np.zeros((pcm.size, width), dtype=np.uint8)
        flat = pcm.reshape(-1).astype(np.int64)
        for i in range(width):
            le[:, i] = (flat >> (8 * i)) & 0xFF
        if hashlib.md5(le.tobytes()).digest() != info["md5"]:
            raise ValueError("FLAC PCM MD5 mismatch (decode error or corrupt stream)")
    return pcm.astype(np.int32), rate, bps


def decode_flac(data: bytes) -> tuple[np.ndarray, int]:
    """FLAC bytes -> (int16 mono samples, rate) — the decode_audio contract."""
    pcm, rate, bps = decode_flac_pcm(data)
    x = pcm.astype(np.float64)
    if bps < 16:
        x *= float(1 << (16 - bps))
    elif bps > 16:
        x /= float(1 << (bps - 16))
    if x.shape[1] > 1:
        x = x.mean(axis=1)
    else:
        x = x[:, 0]
    return np.clip(np.rint(x), -32768, 32767).astype(np.int16), rate


# ------------------------------------------------------------------ encode


def _encode_subframe(bw: _BitWriter, s: np.ndarray, bps: int,
                     lpc_order: int, part_order: int,
                     force_verbatim: bool) -> None:
    s = s.astype(np.int64)
    blocksize = len(s)
    wasted = 0
    if np.any(s):
        tz = min((int(v) & -int(v)).bit_length() - 1 for v in s if v)
        wasted = tz if 0 < tz < bps - 1 else 0
    if wasted:
        s = s >> wasted
    eff = bps - wasted

    def _header(sf_type: int) -> None:
        bw.write(0, 1)
        bw.write(sf_type, 6)
        if wasted:
            bw.write(1, 1)
            bw.write_unary(wasted - 1)
        else:
            bw.write(0, 1)

    if not force_verbatim and np.all(s == s[0]):
        _header(0)
        bw.write_signed(int(s[0]), eff)
        return
    if force_verbatim or blocksize <= 4:
        _header(1)
        for v in s:
            bw.write_signed(int(v), eff)
        return

    best = None  # (cost, kind, payload)
    max_fixed = min(4, blocksize - 1)
    for order in range(0, max_fixed + 1):
        if (blocksize >> part_order) <= order:
            continue
        res = _fixed_residual(s, order)
        # partition 0 holds blocksize/2^po - order samples; others full
        cost = order * eff + 6
        ok = True
        n_parts = 1 << part_order
        w = 0
        for part in range(n_parts):
            cnt = (blocksize >> part_order) - (order if part == 0 else 0)
            if cnt < 0:
                ok = False
                break
            _, c = _best_rice_param(res[w : w + cnt], 4)
            cost += 4 + c
            w += cnt
        if ok and (best is None or cost < best[0]):
            best = (cost, "fixed", order, res)
    if lpc_order and blocksize > lpc_order * 2:
        sf = s.astype(np.float64)
        autoc = np.array(
            [float(sf[: len(sf) - k] @ sf[k:]) for k in range(lpc_order + 1)])
        if autoc[0] > 0:
            coefs, shift = _quantize_lpc(_levinson_durbin(autoc, lpc_order))
            if any(coefs):
                res = _lpc_residual(s, coefs, shift)
                cost = lpc_order * eff + 4 + 5 + 12 * lpc_order + 6
                _, c = _best_rice_param(res, 4)
                cost += 4 + c
                if best is None or cost < best[0]:
                    best = (cost, "lpc", (coefs, shift), res)

    if best is None:
        _header(1)
        for v in s:
            bw.write_signed(int(v), eff)
        return
    if best[1] == "fixed":
        order, res = best[2], best[3]
        _header(8 + order)
        for v in s[:order]:
            bw.write_signed(int(v), eff)
        _write_residual(bw, res, blocksize, order, part_order)
    else:
        (coefs, shift), res = best[2], best[3]
        order = len(coefs)
        _header(32 + order - 1)
        for v in s[:order]:
            bw.write_signed(int(v), eff)
        bw.write(12 - 1, 4)
        bw.write(shift, 5)
        for c in coefs:
            bw.write_signed(c, 12)
        _write_residual(bw, res, blocksize, order, 0)


def encode_flac(samples: np.ndarray, rate: int = 16000, bps: int = 16,
                block_size: int = 4096, stereo_mode: str = "auto",
                lpc_order: int = 8, part_order: int = 0,
                force_verbatim: bool = False) -> bytes:
    """PCM -> FLAC bytes. `samples`: int array [n] (mono) or [n, ch];
    bps in {8, 16, 24}; stereo_mode in auto|independent|left_side|
    right_side|mid_side (2-channel input only)."""
    s = np.asarray(samples, dtype=np.int64)
    if s.ndim == 1:
        s = s[:, None]
    n, n_ch = s.shape
    if n == 0:
        raise ValueError("cannot encode empty FLAC stream")
    if bps not in (8, 16, 24):
        raise ValueError("encoder supports bps 8/16/24")
    lim = 1 << (bps - 1)
    if np.any(s < -lim) or np.any(s >= lim):
        raise ValueError("samples exceed bps range")

    width = bps // 8
    le = np.zeros((s.size, width), dtype=np.uint8)
    flat = s.reshape(-1)
    for i in range(width):
        le[:, i] = (flat >> (8 * i)) & 0xFF
    md5 = hashlib.md5(le.tobytes()).digest()

    out = bytearray(b"fLaC")
    sinfo = struct.pack(">HH", block_size, block_size)
    sinfo += b"\x00\x00\x00" * 2  # min/max frame size unknown
    packed = (rate << 44) | ((n_ch - 1) << 41) | ((bps - 1) << 36) | n
    sinfo += packed.to_bytes(8, "big") + md5
    out += bytes([0x80]) + len(sinfo).to_bytes(3, "big") + sinfo

    for frame_no, start in enumerate(range(0, n, block_size)):
        blk = s[start : start + block_size]
        bs = blk.shape[0]
        bw = _BitWriter()
        bw.write(0x3FFE, 14)
        bw.write(0, 1)
        bw.write(0, 1)  # fixed blocksize strategy
        bw.write(7, 4)  # 16-bit explicit blocksize-1
        bw.write(0, 4)  # rate from STREAMINFO
        mode = stereo_mode
        if n_ch == 2 and mode == "auto":
            mode = "left_side"
        ch_code = {1: 0, 2: 1}.get(n_ch, n_ch - 1)
        if n_ch == 2 and mode != "independent":
            ch_code = {"left_side": 8, "right_side": 9, "mid_side": 10}[mode]
        bw.write(ch_code, 4)
        bw.write(_BPS_CODES[bps], 3)
        bw.write(0, 1)
        _write_coded_number(bw, frame_no)
        bw.write(bs - 1, 16)
        bw.align()
        hdr = bw.bytes()
        bw2 = _BitWriter()
        if n_ch == 2 and ch_code in (8, 9, 10):
            left = blk[:, 0]
            right = blk[:, 1]
            side = left - right
            if ch_code == 8:
                subs = [(left, bps), (side, bps + 1)]
            elif ch_code == 9:
                subs = [(side, bps + 1), (right, bps)]
            else:
                mid = (left + right) >> 1
                subs = [(mid, bps), (side, bps + 1)]
            for sub, sbps in subs:
                _encode_subframe(bw2, sub, sbps, lpc_order, part_order,
                                 force_verbatim)
        else:
            for c in range(n_ch):
                _encode_subframe(bw2, blk[:, c], bps, lpc_order, part_order,
                                 force_verbatim)
        bw2.align()
        frame = bytearray(hdr)  # header CRC-8 goes right after the header bytes
        frame.append(crc8(bytes(hdr)))
        frame += bw2.bytes()
        frame += crc16(bytes(frame)).to_bytes(2, "big")
        out += frame
    return bytes(out)
