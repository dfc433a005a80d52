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


def gram_hash_pair(data: bytes, k: int) -> Tuple[np.ndarray, np.ndarray]:
    """(h1, h2) uint64 rolling hashes of every k-gram — two independent
    bases, 128 bits total, for cross-partition matching where byte-exact
    verification is not affordable (collision odds ~ n^2 / 2^128: < 1e-10
    even at 10^14 grams)."""
    b = np.frombuffer(data, dtype=np.uint8).astype(np.uint64)
    return _rolling_hashes(b, k, _B1), _rolling_hashes(b, k, _B2)


def positions_to_segments(pos: np.ndarray, k: int) -> List[Interval]:
    """Maximal runs of the covered-byte set  ∪ [p, p+k)  for sorted dup
    positions ``pos`` — a new merged range starts exactly where the gap to
    the previous position exceeds k (equivalent to
    merge_intervals('overlapping') on the equal-length spans)."""
    if len(pos) == 0:
        return []
    brk = np.nonzero(np.diff(pos) > k)[0]
    starts = pos[np.concatenate(([0], brk + 1))]
    ends = pos[np.concatenate((brk, [len(pos) - 1]))] + k
    return list(zip(starts.tolist(), ends.tolist()))


def local_duplicate_positions(data: bytes, k: int) -> np.ndarray:
    """Sorted start positions of k-grams occurring >= 2 times in ``data``
    — byte-exact (rolling hash proposes, byte comparison verifies)."""
    n = len(data)
    if n < k or k <= 0:
        return np.empty(0, dtype=np.int64)
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
        return np.empty(0, dtype=np.int64)

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
    return pos


def duplicate_segments(data: bytes, k: int) -> List[Interval]:
    """Global (start, stop) byte ranges covered by >= k-length duplicates,
    merged with the 'overlapping' strategy (contiguous dup spans coalesce,
    as the SA collect step produces maximal ranges)."""
    return positions_to_segments(local_duplicate_positions(data, k), k)


def distinct_hash_counts(
    data: bytes, k: int
) -> Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Distinct (h1, h2) k-gram hash pairs with occurrence counts capped at
    2, plus one occurrence position each — the cross-partition exchange
    record. A cap of 2 is all the global 'total >= 2' duplicate test needs;
    the position is meaningful for cnt == 1 rows (the gram's ONLY local
    occurrence), which lets duplicate notifications come back as raw
    positions instead of hashes — the finalize pass then needs no second
    hashing pass and no membership matching."""
    h1, h2 = gram_hash_pair(data, k)
    if len(h1) == 0:
        e = np.empty(0, dtype=np.int64)
        return e, e, e.astype(np.int32), e
    order = np.lexsort((h2, h1))
    s1, s2 = h1[order], h2[order]
    new = np.empty(len(s1), dtype=bool)
    new[0] = True
    new[1:] = (s1[1:] != s1[:-1]) | (s2[1:] != s2[:-1])
    starts = np.nonzero(new)[0]
    cnt = np.minimum(np.diff(np.append(starts, len(s1))), 2).astype(np.int32)
    pos = order[starts].astype(np.int64)
    return s1[starts].view(np.int64), s2[starts].view(np.int64), cnt, pos




def dedup_documents(
    docs: Sequence[Tuple[int, str]],
    k: int,
    merge_strategy: str = "overlapping",
    extra_ranges: Sequence[Interval] | None = None,
) -> List[Tuple[int, str, int]]:
    """Concatenate docs (UTF-8, no separators — suffix_array.py:308-317),
    find duplicate segments, restore into per-doc ranges, blank them out.

    Returns (id, cleaned_text, duplicate_bytes_removed) per doc, preserving
    input order. Documents that become empty are NOT filtered here (the
    operator applies the reference's empty filter, suffix_array.py:354-357).

    ``extra_ranges`` is the distributed hook: pre-clipped byte ranges of
    content known to be duplicated elsewhere in the global stream
    (cross-partition gram coverage and seam-straddling spans). Empty means
    the classic single-stream pass.
    """
    encoded = [(i, t.encode("utf-8")) for i, t in docs]
    boundaries: List[Interval] = []
    off = 0
    for _, eb in encoded:
        boundaries.append((off, off + len(eb)))
        off += len(eb)
    blob = b"".join(eb for _, eb in encoded)

    pos = local_duplicate_positions(blob, k)
    segments = positions_to_segments(pos, k)
    if extra_ranges:
        segments = merge_intervals(list(segments) + list(extra_ranges), "overlapping")
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


def straddle_grams(
    parts: Sequence[Tuple[int, int, bytes, bytes]], k: int
) -> List[Tuple[int, int, int]]:
    """Driver-side: hashes + global positions of every k-gram that straddles
    a partition seam in the id-ordered global concatenation.

    ``parts``: ordered (part_id, blob_len, head, tail) per non-empty
    partition, head/tail = first/last min(blob_len, k-1) bytes. Every
    straddling gram's bytes are provably within k-1 of some seam on each
    side, hence inside the known head/tail material (tiny partitions are
    fully known since head+tail reconstruct blobs of len <= 2(k-1)).

    Returns [(h1_int64, h2_int64, global_pos)]; len(parts) * (k-1) entries
    at most — driver-bounded.
    """
    if k <= 0 or not parts:
        return []
    # known contiguous byte segments of the global stream
    segs: List[Tuple[int, bytes]] = []  # (global_start, bytes)
    offsets: List[Tuple[int, int]] = []  # (global_start, global_end) per part
    off = 0
    for _pid, blen, head, tail in parts:
        if blen <= len(head):  # head is the whole blob
            known = [(off, head)]
        elif blen <= len(head) + len(tail):  # head+tail reconstruct the blob
            known = [(off, head + tail[len(head) + len(tail) - blen:])]
        else:
            known = [(off, head), (off + blen - len(tail), tail)]
        for s, b in known:
            if segs and segs[-1][0] + len(segs[-1][1]) == s:
                segs[-1] = (segs[-1][0], segs[-1][1] + b)
            else:
                segs.append((s, b))
        offsets.append((off, off + blen))
        off += blen
    ends = np.array([e for _s, e in offsets], dtype=np.int64)
    starts = np.array([s for s, _e in offsets], dtype=np.int64)

    out: List[Tuple[int, int, int]] = []
    for s, b in segs:
        if len(b) < k:
            continue
        h1, h2 = gram_hash_pair(b, k)
        v1, v2 = h1.view(np.int64), h2.view(np.int64)
        for g in range(len(b) - k + 1):
            gpos = s + g
            pi = int(np.searchsorted(starts, gpos, side="right")) - 1
            if gpos + k > int(ends[pi]):  # crosses the seam after part pi
                out.append((int(v1[g]), int(v2[g]), gpos))
    return out


def straddle_coverage(
    parts: Sequence[Tuple[int, int, bytes, bytes]],
    dup_positions: Sequence[int],
    k: int,
) -> List[Tuple[int, int, int]]:
    """Map duplicated straddling-gram spans [g, g+k) to per-partition local
    byte ranges (part_id, lo, hi), clipped at partition boundaries — exact,
    because partition seams coincide with document boundaries where the
    restore step splits segments anyway."""
    bounds = []
    off = 0
    for pid, blen, _h, _t in parts:
        bounds.append((pid, off, off + blen))
        off += blen
    out = []
    for g in sorted(set(dup_positions)):
        for pid, s, e in bounds:
            lo, hi = max(g, s), min(g + k, e)
            if lo < hi:
                out.append((pid, lo - s, hi - s))
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
