"""Pure-Python XXH64 (the public xxHash algorithm, https://xxhash.com).

The reference uses the ``xxhash`` C package (simhash.py:197-230); that
package is not available in this environment, so we implement the public
XXH64 spec directly. ``xxh64_int(data) == xxhash.xxh64(data).intdigest()``
(digest() is the big-endian serialization of that integer, which is also how
the reference's bitarray ``frombytes`` interprets it — MSB-first).

Cross-checked two ways in tests:
- the published test vector XXH64("", seed=0) = 0xEF46DB3751D8E999;
- against Spark's built-in ``xxhash64`` (seed 42) on binary columns.
"""

from __future__ import annotations

_P1 = 0x9E3779B185EBCA87
_P2 = 0xC2B2AE3D27D4EB4F
_P3 = 0x165667B19E3779F9
_P4 = 0x85EBCA77C2B2AE63
_P5 = 0x27D4EB2F165667C5
_M64 = 0xFFFFFFFFFFFFFFFF


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _M64


def _round(acc: int, lane: int) -> int:
    return (_rotl((acc + lane * _P2) & _M64, 31) * _P1) & _M64


def xxh64_int(data: bytes, seed: int = 0) -> int:
    n = len(data)
    i = 0
    if n >= 32:
        a1 = (seed + _P1 + _P2) & _M64
        a2 = (seed + _P2) & _M64
        a3 = seed & _M64
        a4 = (seed - _P1) & _M64
        while i + 32 <= n:
            a1 = _round(a1, int.from_bytes(data[i : i + 8], "little"))
            a2 = _round(a2, int.from_bytes(data[i + 8 : i + 16], "little"))
            a3 = _round(a3, int.from_bytes(data[i + 16 : i + 24], "little"))
            a4 = _round(a4, int.from_bytes(data[i + 24 : i + 32], "little"))
            i += 32
        acc = (_rotl(a1, 1) + _rotl(a2, 7) + _rotl(a3, 12) + _rotl(a4, 18)) & _M64
        for a in (a1, a2, a3, a4):
            acc = ((acc ^ _round(0, a)) * _P1 + _P4) & _M64
    else:
        acc = (seed + _P5) & _M64

    acc = (acc + n) & _M64

    while i + 8 <= n:
        lane = int.from_bytes(data[i : i + 8], "little")
        acc = (_rotl(acc ^ _round(0, lane), 27) * _P1 + _P4) & _M64
        i += 8
    if i + 4 <= n:
        lane = int.from_bytes(data[i : i + 4], "little")
        acc = (_rotl(acc ^ ((lane * _P1) & _M64), 23) * _P2 + _P3) & _M64
        i += 4
    while i < n:
        acc = (_rotl(acc ^ ((data[i] * _P5) & _M64), 11) * _P1) & _M64
        i += 1

    acc ^= acc >> 33
    acc = (acc * _P2) & _M64
    acc ^= acc >> 29
    acc = (acc * _P3) & _M64
    acc ^= acc >> 32
    return acc


def xxh64_digest(data: bytes, seed: int = 0) -> bytes:
    """Big-endian 8-byte digest, matching ``xxhash.xxh64(data).digest()``."""
    return xxh64_int(data, seed).to_bytes(8, "big")


def xxh64_batch(datas, seed: int = 0):
    """Vectorized XXH64 over many byte strings at once — bit-exact vs
    ``xxh64_int`` (property-tested across lengths 0..40).

    Inputs shorter than 32 bytes (the common case for char n-grams) take the
    numpy tail-only path: all rows share the same 8-byte-lane schedule, so
    the per-lane rounds apply with masks; inputs >= 32 bytes fall back to
    the scalar implementation (they need the 4-accumulator stripe loop).
    """
    import numpy as np

    n = len(datas)
    out = np.empty(n, dtype=np.uint64)
    lens = np.fromiter((len(d) for d in datas), dtype=np.int64, count=n)
    big_idx = np.nonzero(lens >= 32)[0]
    for i in big_idx:
        out[i] = xxh64_int(datas[i], seed)
    idx = np.nonzero(lens < 32)[0]
    m = len(idx)
    if m == 0:
        return out

    L = lens[idx].astype(np.uint64)
    buf = np.zeros((m, 32), dtype=np.uint8)
    for r in range(m):
        d = datas[idx[r]]
        if d:
            buf[r, : len(d)] = np.frombuffer(d, dtype=np.uint8)
    lanes8 = buf.view("<u8")   # (m, 4) little-endian u64 lanes
    lanes4 = buf.view("<u4")   # (m, 8) little-endian u32 lanes

    P1, P2, P3, P4, P5 = (np.uint64(p) for p in (_P1, _P2, _P3, _P4, _P5))

    def rotl(x, r):
        r = np.uint64(r)
        return (x << r) | (x >> (np.uint64(64) - r))

    acc = np.full(m, np.uint64((seed + _P5) & _M64), dtype=np.uint64) + L

    nb8 = (lens[idx] >> 3).astype(np.int64)          # 0..3 full 8-byte lanes
    for k in range(3):
        active = nb8 > k
        if not active.any():
            break
        lane = lanes8[:, k]
        r0 = rotl(lane * P2, 31) * P1                 # _round(0, lane)
        upd = rotl(acc ^ r0, 27) * P1 + P4
        acc = np.where(active, upd, acc)

    rem = lens[idx] & 7
    has4 = rem >= 4
    if has4.any():
        lane4 = lanes4[np.arange(m), nb8 * 2].astype(np.uint64)
        upd = rotl(acc ^ (lane4 * P1), 23) * P2 + P3
        acc = np.where(has4, upd, acc)

    start = nb8 * 8 + np.where(has4, 4, 0)
    nbytes = rem - np.where(has4, 4, 0)               # 0..3 trailing bytes
    rows = np.arange(m)
    for j in range(3):
        active = nbytes > j
        if not active.any():
            break
        b = buf[rows, np.minimum(start + j, 31)].astype(np.uint64)
        upd = rotl(acc ^ (b * P5), 11) * P1
        acc = np.where(active, upd, acc)

    acc ^= acc >> np.uint64(33)
    acc *= P2
    acc ^= acc >> np.uint64(29)
    acc *= P3
    acc ^= acc >> np.uint64(32)
    out[idx] = acc
    return out
