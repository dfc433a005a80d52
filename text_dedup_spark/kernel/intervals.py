"""Interval algebra for suffix/substring dedup.

Same semantics as the reference's pure helpers (doctested there), re-derived:
- merge_intervals: /root/reference/text_dedup/suffix_array.py:34-108
- restore:         suffix_array.py:111-184
- restore_and_merge: suffix_array.py:187-233
- clean_up:        suffix_array.py:247-271

Intervals are (start, stop) tuples instead of ``slice`` objects (hashable,
Arrow-serializable), but the doctest golden cases are identical.
"""

from __future__ import annotations

from collections import deque
from typing import Deque, Iterable, Iterator, List, Sequence, Tuple

Interval = Tuple[int, int]


def merge_intervals(
    intervals: Sequence[Interval], merge_strategy: str = "longest"
) -> List[Interval]:
    """Merge (start, stop) intervals.

    'overlapping' coalesces touching/overlapping ranges; 'longest' only drops
    ranges fully contained in an earlier one (because when [2,4] and [3,5]
    are duplicates, [2,5] might not be).

    >>> merge_intervals([(0, 10), (1, 11), (2, 12), (3, 13), (4, 14), (5, 15),
    ...                  (6, 16), (7, 21)], 'overlapping')
    [(0, 21)]
    >>> merge_intervals([(0, 2), (2, 4), (4, 5)], 'overlapping')
    [(0, 5)]
    >>> merge_intervals([(0, 4), (2, 4), (4, 5)], 'longest')
    [(0, 4), (4, 5)]
    >>> merge_intervals([(0, 10)] * 5)
    [(0, 10)]
    """
    if not intervals:
        return []
    q: Deque[Interval] = deque(sorted(set(intervals), key=lambda s: (s[0], -s[1])))
    merged: List[Interval] = []
    while q:
        current = q.popleft()
        if not merged:
            merged.append(current)
            continue
        prev = merged[-1]
        if merge_strategy == "overlapping":
            if prev[1] >= current[0]:
                merged[-1] = (prev[0], max(prev[1], current[1]))
            else:
                merged.append(current)
        elif merge_strategy == "longest":
            if current[1] <= prev[1]:
                continue
            merged.append(current)
        else:
            raise ValueError(f"unknown merge strategy {merge_strategy!r}")
    return merged


def restore(
    boundaries: Sequence[Interval], segments: Sequence[Interval]
) -> Iterator[Tuple[int, Interval]]:
    """Map global duplicate byte ranges back into per-document ranges.

    ``boundaries`` are per-document (start, stop) offsets into the
    concatenated corpus (sorted, non-overlapping); ``segments`` are sorted
    global duplicate ranges. Yields (doc_index, doc-relative range).

    >>> list(restore([(0, 10), (10, 20)], [(0, 5), (5, 10), (5, 15), (5, 19)]))
    [(0, (0, 5)), (0, (5, 10)), (1, (0, 5)), (1, (0, 9))]
    """
    indices: Deque[Interval] = deque(segments)
    for i, (s_start, s_stop) in enumerate(boundaries):
        while indices:
            x, y = indices.popleft()
            while y <= s_start and indices:
                x, y = indices.popleft()
            if y <= s_start:
                break
            if x >= s_stop:
                indices.appendleft((x, y))
                break
            if s_start <= x < s_stop <= y:
                yield i, (x - s_start, s_stop - s_start)
                if y > s_stop:
                    indices.appendleft((s_stop, y))
                break
            elif s_start <= x < y <= s_stop:
                yield i, (x - s_start, y - s_start)
                continue
            elif x < s_start < y <= s_stop:
                yield i, (0, y - s_start)
                continue
            elif x < s_start < s_stop <= y:
                yield i, (0, s_stop - s_start)
                if y > s_stop:
                    indices.appendleft((s_stop, y))
                break


def restore_and_merge(
    boundaries: Sequence[Interval],
    segments: Sequence[Interval],
    k: int,
    merge_strategy: str = "longest",
) -> Tuple[List[List[Interval]], int]:
    """restore + per-doc merge + drop ranges < k; returns (per-doc ranges,
    total duplicate bytes).

    >>> restore_and_merge([(0, 10), (10, 20)], [(0, 5), (5, 10), (12, 19)],
    ...                   5, 'longest')
    ([[(0, 5), (5, 10)], [(2, 9)]], 17)
    >>> restore_and_merge([(0, 10), (10, 20)], [(0, 5), (5, 10), (12, 19)],
    ...                   5, 'overlapping')
    ([[(0, 10)], [(2, 9)]], 17)
    """
    duplicate_size = 0
    results: List[List[Interval]] = [[] for _ in boundaries]
    for idx, (a, b) in restore(boundaries, segments):
        if b - a >= k:
            results[idx].append((a, b))
    for i in range(len(results)):
        results[i] = merge_intervals(results[i], merge_strategy)
        duplicate_size += sum(b - a for a, b in results[i])
    return results, duplicate_size


def clean_up(text: str, slices: Iterable[Interval]) -> str:
    """Blank out duplicate ranges from the text.

    >>> clean_up("This is a test.", [(0, 4), (5, 7)])
    '  a test.'
    """
    chars = list(text)
    for a, b in slices:
        chars[a:b] = [""] * (b - a)
    return "".join(chars)
