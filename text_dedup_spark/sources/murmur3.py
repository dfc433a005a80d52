"""Murmur3 x86 32-bit — the hash behind Iceberg's bucket[N] transform.

Public algorithm (Austin Appleby, public domain; Iceberg spec Appendix B
pins the variant and the per-type input serialization):

- int and long both hash their value as EIGHT little-endian bytes (so
  bucket(34::int) == bucket(34::long), which the spec's cross-type
  bucketing guarantee requires);
- string hashes its UTF-8 bytes, binary its raw bytes;
- bucket[N](v) = (murmur3(serialize(v)) & Int.MaxValue) % N.

The long path is fully vectorized in numpy (fixed 8-byte input = two
4-byte blocks, no tail) so Arrow batches of ids bucket at C speed; the
variable-length bytes path is the scalar reference implementation.

Spec test vectors pinned in tests/test_iceberg_native.py:
hash(34 as int/long) = 2017239379, hash('iceberg') = 1210000089.
"""

from __future__ import annotations

import struct

import numpy as np

_C1 = 0xCC9E2D51
_C2 = 0x1B873593
_M32 = 0xFFFFFFFF


def _rotl32(x: int, r: int) -> int:
    return ((x << r) | (x >> (32 - r))) & _M32


def murmur3_32(data: bytes, seed: int = 0) -> int:
    """Scalar murmur3_x86_32 over bytes (reference path, variable length)."""
    h = seed & _M32
    n = len(data)
    n4 = n & ~3
    for i in range(0, n4, 4):
        k = struct.unpack_from("<I", data, i)[0]
        k = (k * _C1) & _M32
        k = _rotl32(k, 15)
        k = (k * _C2) & _M32
        h ^= k
        h = _rotl32(h, 13)
        h = (h * 5 + 0xE6546B64) & _M32
    k = 0
    tail = n - n4
    if tail >= 3:
        k ^= data[n4 + 2] << 16
    if tail >= 2:
        k ^= data[n4 + 1] << 8
    if tail >= 1:
        k ^= data[n4]
        k = (k * _C1) & _M32
        k = _rotl32(k, 15)
        k = (k * _C2) & _M32
        h ^= k
    h ^= n
    h ^= h >> 16
    h = (h * 0x85EBCA6B) & _M32
    h ^= h >> 13
    h = (h * 0xC2B2AE35) & _M32
    h ^= h >> 16
    return h


def murmur3_32_long(values: np.ndarray) -> np.ndarray:
    """Vectorized murmur3_x86_32 of int64 values serialized as 8 LE bytes
    (Iceberg's int/long hash input): exactly two 4-byte blocks, no tail."""
    v = np.asarray(values, dtype=np.int64).view(np.uint64)
    lo = (v & 0xFFFFFFFF).astype(np.uint32)
    hi = (v >> 32).astype(np.uint32)
    h = np.zeros(len(v), dtype=np.uint32)
    for block in (lo, hi):
        k = (block * np.uint32(_C1)).astype(np.uint32)
        k = (k << np.uint32(15)) | (k >> np.uint32(17))
        k = (k * np.uint32(_C2)).astype(np.uint32)
        h ^= k
        h = (h << np.uint32(13)) | (h >> np.uint32(19))
        h = (h * np.uint32(5) + np.uint32(0xE6546B64)).astype(np.uint32)
    h ^= np.uint32(8)  # length
    h ^= h >> np.uint32(16)
    h = (h * np.uint32(0x85EBCA6B)).astype(np.uint32)
    h ^= h >> np.uint32(13)
    h = (h * np.uint32(0xC2B2AE35)).astype(np.uint32)
    h ^= h >> np.uint32(16)
    return h


def iceberg_hash(value, ice_type: str) -> int:
    """Iceberg single-value bucket hash (spec Appendix B serialization)."""
    if value is None:
        raise ValueError("null values are never bucketed")
    if ice_type in ("int", "long", "date"):
        return murmur3_32(struct.pack("<q", int(value)))
    if ice_type == "string":
        return murmur3_32(str(value).encode("utf-8"))
    if ice_type == "binary":
        return murmur3_32(bytes(value))
    raise ValueError(f"bucket transform unsupported for {ice_type!r}")


def iceberg_bucket(value, ice_type: str, n: int) -> int:
    return (iceberg_hash(value, ice_type) & 0x7FFFFFFF) % n


def iceberg_bucket_longs(values: np.ndarray, n: int) -> np.ndarray:
    """Vectorized bucket[N] for int/long arrays."""
    h = murmur3_32_long(values).astype(np.int64)
    return ((h & 0x7FFFFFFF) % n).astype(np.int32)
