"""Duplicate-substring detection kernel (the suffix-array capability).

The reference shells out to external Rust/Python suffix-array tools over ONE
concatenated corpus file (suffix_array.py:308-336 -> google
deduplicate-text-datasets: build SA, `self-similar --length-threshold k`,
`collect` -> global byte ranges). Output semantics: the set of byte
positions covered by some substring of length >= k that occurs >= 2 times.

Identity used here: that position set equals the union of all duplicated
k-grams' spans [p, p+k) — every duplicated substring of length L >= k is
covered by its L-k+1 duplicated k-grams, and every duplicated k-gram is
itself a duplicated substring of length k. So instead of a suffix array we
run a vectorized double rolling hash over the concatenation (numpy uint64
wraparound arithmetic, O(n)), verify candidate groups byte-exactly, merge
spans, and reuse the reference's restore/merge interval algebra
(kernel/intervals.py) to map back into documents.

This is partition-local in the Spark operator (operators/suffix.py): the
honest distributed decomposition of an inherently sequential global pass
(SURVEY §7.4) — cross-partition substring dups fall to the MinHash/exact
layers, or use global_scope=True for the reference's exact single-stream
behavior.
"""

from __future__ import annotations

from typing import Dict, List, Sequence, Tuple

import numpy as np

from .intervals import Interval, clean_up, merge_intervals, restore_and_merge

_M64 = np.uint64(0xFFFFFFFFFFFFFFFF)
_B1 = 1000003
_B2 = 998244353


def _rolling_hashes(b: np.ndarray, k: int, base: int) -> np.ndarray:
    """h[i] = hash of b[i:i+k] for all i, via modular-inverse prefix trick:
    P[i] = sum_{j<i} b[j]*B^j  (mod 2^64);  h[i] = (P[i+k]-P[i]) * B^-i.
    All arithmetic wraps mod 2^64 (numpy uint64); base must be odd so B^-1
    exists mod 2^64."""
    n = len(b)

    def _powers(x: int, count: int) -> np.ndarray:
        out = np.empty(count, dtype=np.uint64)
        out[0] = 1
        if count > 1:
            np.multiply.accumulate(
                np.full(count - 1, np.uint64(x)), out=out[1:]
            )
        return out

    pows = _powers(base, n)
    invpows = _powers(pow(base, -1, 1 << 64), n)
    prefix = np.zeros(n + 1, dtype=np.uint64)
    np.cumsum(b * pows, out=prefix[1:])
    return (prefix[k:] - prefix[: n - k + 1]) * invpows[: n - k + 1]


def duplicate_segments(data: bytes, k: int) -> List[Interval]:
    """Global (start, stop) byte ranges covered by >= k-length duplicates,
    merged with the 'overlapping' strategy (contiguous dup spans coalesce,
    as the SA collect step produces maximal ranges)."""
    n = len(data)
    if n < k or k <= 0:
        return []
    b = np.frombuffer(data, dtype=np.uint8).astype(np.uint64)
    h1 = _rolling_hashes(b, k, _B1)
    h2 = _rolling_hashes(b, k, _B2)

    combo = np.empty(len(h1), dtype=[("a", np.uint64), ("b", np.uint64)])
    combo["a"], combo["b"] = h1, h2
    order = np.argsort(combo, kind="stable")
    sorted_c = combo[order]
    # run boundaries of equal (h1, h2)
    new_run = np.empty(len(sorted_c), dtype=bool)
    new_run[0] = True
    new_run[1:] = sorted_c[1:] != sorted_c[:-1]
    run_ids = np.cumsum(new_run) - 1
    counts = np.bincount(run_ids)
    dup_mask = counts[run_ids] >= 2
    candidates = order[dup_mask]
    if len(candidates) == 0:
        return []

    # byte-exact verification within hash groups (rolling-hash collisions)
    groups: Dict[int, List[int]] = {}
    for pos, rid in zip(candidates, run_ids[dup_mask]):
        groups.setdefault(int(rid), []).append(int(pos))
    dup_positions: List[int] = []
    mv = memoryview(data)
    for poss in groups.values():
        if len(poss) < 2:
            continue
        by_bytes: Dict[bytes, List[int]] = {}
        for p in poss:
            by_bytes.setdefault(bytes(mv[p : p + k]), []).append(p)
        for same in by_bytes.values():
            if len(same) >= 2:
                dup_positions.extend(same)

    if not dup_positions:
        return []
    dup_positions.sort()
    return merge_intervals([(p, p + k) for p in dup_positions], "overlapping")


def dedup_documents(
    docs: Sequence[Tuple[int, str]],
    k: int,
    merge_strategy: str = "overlapping",
) -> List[Tuple[int, str, int]]:
    """Concatenate docs (UTF-8, no separators — suffix_array.py:308-317),
    find duplicate segments, restore into per-doc ranges, blank them out.

    Returns (id, cleaned_text, duplicate_bytes_removed) per doc, preserving
    input order. Documents that become empty are NOT filtered here (the
    operator applies the reference's empty filter, suffix_array.py:354-357).
    """
    encoded = [(i, t.encode("utf-8")) for i, t in docs]
    boundaries: List[Interval] = []
    off = 0
    for _, eb in encoded:
        boundaries.append((off, off + len(eb)))
        off += len(eb)
    blob = b"".join(eb for _, eb in encoded)
    segments = duplicate_segments(blob, k)
    per_doc, _total = restore_and_merge(boundaries, segments, k, merge_strategy)

    out = []
    for (i, eb), ranges in zip(encoded, per_doc):
        if not ranges:
            out.append((i, eb.decode("utf-8"), 0))
            continue
        cleaned = clean_up_bytes(eb, ranges)
        removed = sum(b - a for a, b in ranges)
        out.append((i, cleaned, removed))
    return out


def clean_up_bytes(data: bytes, slices: Sequence[Interval]) -> str:
    """Byte-space clean_up (ranges are byte offsets; the reference operates
    on the byte file too) — remove the ranges then decode, dropping any
    split multibyte sequences at the cut edges."""
    keep = bytearray()
    prev = 0
    for a, b in slices:
        keep += data[prev:a]
        prev = b
    keep += data[prev:]
    return bytes(keep).decode("utf-8", errors="ignore")
