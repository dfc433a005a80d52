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
    # a single rolling hash only PROPOSES candidate runs — the byte-exact
    # verification below makes the result exact regardless of collisions,
    # so a second hash would only buy a smaller rare-path, not correctness
    h1 = _rolling_hashes(b, k, _B1)
    order = np.argsort(h1)  # quicksort: ~2x faster than stable on uint64
    sorted_c = h1[order]
    # run boundaries of equal h1
    new_run = np.empty(len(sorted_c), dtype=bool)
    new_run[0] = True
    new_run[1:] = sorted_c[1:] != sorted_c[:-1]
    run_ids = np.cumsum(new_run) - 1
    counts = np.bincount(run_ids)
    dup_mask = counts[run_ids] >= 2
    cand_pos = order[dup_mask].astype(np.int64)
    cand_run = run_ids[dup_mask]  # nondecreasing (subset of sorted order)
    if len(cand_pos) == 0:
        return []

    # Byte-exact verification within hash runs (guards rolling-hash
    # collisions), vectorized: compare every candidate against its run's
    # first member, k single-byte planes at a time.
    grp_start = np.empty(len(cand_run), dtype=bool)
    grp_start[0] = True
    grp_start[1:] = cand_run[1:] != cand_run[:-1]
    starts_idx = np.nonzero(grp_start)[0]
    grp_len = np.diff(np.append(starts_idx, len(cand_run)))
    rep_pos = np.repeat(cand_pos[starts_idx], grp_len)
    eq = np.ones(len(cand_pos), dtype=bool)
    bb = np.frombuffer(data, dtype=np.uint8)
    for j in range(k):
        np.logical_and(eq, bb[cand_pos + j] == bb[rep_pos + j], out=eq)
    # a run is genuine if >= 2 members match its representative
    eq_per_grp = np.add.reduceat(eq, starts_idx)
    grp_ids = np.repeat(np.arange(len(starts_idx)), grp_len)
    verified = eq & (eq_per_grp[grp_ids] >= 2)

    dup_list: List[int] = []
    # Rare path: members NOT equal to the representative are true hash
    # collisions — resolve those few by exact bytes.
    if not eq.all():
        mv = memoryview(data)
        odd_grps = np.unique(grp_ids[~eq])
        for g in odd_grps:
            lo = starts_idx[g]
            members = cand_pos[lo : lo + grp_len[g]][~eq[lo : lo + grp_len[g]]]
            by_bytes: Dict[bytes, List[int]] = {}
            for p in members.tolist():
                by_bytes.setdefault(bytes(mv[p : p + k]), []).append(p)
            for same in by_bytes.values():
                if len(same) >= 2:
                    dup_list.extend(same)

    pos = np.sort(cand_pos[verified])
    if dup_list:
        pos = np.sort(np.concatenate([pos, np.array(dup_list, dtype=np.int64)]))
    if len(pos) == 0:
        return []
    # merge_intervals('overlapping') on sorted equal-length spans [p, p+k):
    # a new merged range starts exactly where the gap to the previous
    # position exceeds k.
    brk = np.nonzero(np.diff(pos) > k)[0]
    starts = pos[np.concatenate(([0], brk + 1))]
    ends = pos[np.concatenate((brk, [len(pos) - 1]))] + k
    return list(zip(starts.tolist(), ends.tolist()))


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
