"""SimHash kernel — integer re-derivation of the reference's bitarray logic.

The reference (simhash.py:41-302) represents an f-bit fingerprint as a
``bitarray`` with index 0 = most-significant bit (``int2ba``/``ba2int``
convention). We represent it as a plain Python int of f bits, which maps
bitarray ops exactly:

    bitarray ``x << s`` (shift toward index 0 / MSB)  ==  ``(x << s) & (2^f-1)``
    bitarray ``x >> s``                               ==  ``x >> s``
    mask over bitarray [start:end)                    ==  ((1<<(end-start))-1) << (f-end)
    ``(a ^ b).count(1)``                              ==  popcount(a ^ b)

Parity citations (all into /root/reference/text_dedup/simhash.py):
- _hamming_distance: :41-64
- Permutation (block decomposition, offsets, search_mask): :67-138
- _create_permutations enumeration: :141-194
- _unsigned_hash (xxh64 digest -> MSB-first bits): :197-230
- compute (bit-majority): :233-260
- embed_func (char n-grams with the utils/tokenization.py:35-36 short-doc
  fallback — NOTE: different from the MinHash spark tokenizer): :263-302
"""

from __future__ import annotations

import math
from itertools import permutations as _itpermutations
from typing import List, Sequence, Tuple

import numpy as np

from .xxh import xxh3_128_int, xxh64_int


def hamming_distance(a: int, b: int) -> int:
    """popcount(a ^ b) (simhash.py:41-64).

    >>> hamming_distance(0b1010, 0b1010)
    0
    >>> hamming_distance(0b1010, 0b0010)
    1
    """
    return bin(a ^ b).count("1")


class Permutation:
    """Bit-rotation bucketing table (simhash.py:67-138).

    Blocks of the f-bit fingerprint are reordered so that a chosen (b-k)
    subset forms the prefix; fingerprints agreeing on that prefix land in the
    same candidate bucket. All state is plain ints so the *apply* step can be
    executed either in Python (caption signatures) or as Catalyst bitwise
    expressions on a LongType column (phash image dedup) — see
    operators/simhash_dedup.py.
    """

    def __init__(self, f: int, k: int, b: int, masks: List[Tuple[int, int, int, int]]):
        self.f = f
        self.k = k
        self.b = b
        self.widths: List[int] = []
        self.offsets: List[int] = []
        self.masks: List[int] = []  # int masks in fingerprint bit-space

        width = 0
        for mask, mask_size, start, _ in masks:
            self.widths.append(mask_size)
            offset = start - width
            width += mask_size
            self.offsets.append(offset)
            self.masks.append(mask)

        assert sum(self.widths) == f, "block widths must sum to fingerprint size"

        prefix_width = sum(self.widths[: b - k])
        self.prefix_width = prefix_width
        self.search_mask: int = ((1 << prefix_width) - 1) << (f - prefix_width)

    def permute(self, x: int) -> int:
        result = 0
        full = (1 << self.f) - 1
        for mask, offset in zip(self.masks, self.offsets):
            if offset > 0:
                result |= ((x & mask) << offset) & full
            else:
                result |= (x & mask) >> -offset
        return result

    def bucket_key(self, x: int) -> int:
        return self.permute(x) & self.search_mask


def block_masks(f: int, b: int) -> List[Tuple[int, int, int, int]]:
    """(mask, size, start, end) per block; start/end in MSB-first bit index
    space (simhash.py:169-184)."""
    block_size = math.ceil(f / b)
    masks = []
    for i in range(b):
        start, end = i * block_size, min((i + 1) * block_size, f)
        mask = ((1 << (end - start)) - 1) << (f - end)
        masks.append((mask, end - start, start, end))
    return masks


def create_permutations(f: int, k: int, b: int) -> List[Permutation]:
    """All orderings of a (b-k)-subset as prefix (simhash.py:186-194).

    >>> len(create_permutations(128, 3, 4))
    4
    >>> len(create_permutations(64, 3, 4))
    4
    """
    if k < 0 or k > b:
        raise ValueError(
            f"bit_diff k={k} must be between 0 and num_bucket b={b}: the "
            "bucketing splits the fingerprint into b blocks and requires "
            "candidates to agree on some (b-k)-block prefix"
        )
    masks = block_masks(f, b)
    indices = set(range(len(masks)))
    results = []
    for leading_idx in _itpermutations(range(len(masks)), b - k):
        remaining_idx = sorted(indices - set(leading_idx))
        blocks = [masks[i] for i in leading_idx] + [masks[i] for i in remaining_idx]
        results.append(Permutation(f, k, b, blocks))
    return results


def unsigned_hash(obj: bytes, f: int = 64) -> int:
    """Digest interpreted MSB-first (simhash.py:197-230): xxh64 for f=64,
    XXH3-128 for f=128 (kernel/xxh.py's spec implementation — the
    reference's ``xxhash.xxh128`` IS XXH3-128)."""
    if f == 64:
        return xxh64_int(obj)
    if f == 128:
        return xxh3_128_int(obj)
    raise ValueError(f"Unsupported fingerprint size: {f}")


def compute(hashes: Sequence[int], f: int = 64) -> int:
    """Bit-majority SimHash of token hashes (simhash.py:233-260).

    >>> compute([13352372148217134600, 5020219685658847592])
    74633958390507528
    """
    if not hashes:
        return 0
    if f == 64:
        h = np.array(hashes, dtype=np.uint64)
        shifts = np.arange(f - 1, -1, -1, dtype=np.uint64)
        arr = ((h[:, None] >> shifts[None, :]) & np.uint64(1)).astype(np.int64)
    else:
        arr = np.zeros((len(hashes), f), dtype=np.int64)
        for i, hv in enumerate(hashes):
            for j in range(f):
                arr[i, j] = (hv >> (f - 1 - j)) & 1
    votes = (2 * arr - 1).sum(axis=0)
    result = 0
    for j in np.nonzero(votes > 0)[0]:
        result |= 1 << (f - 1 - int(j))
    return result


def char_ngrams(content: str, n: int) -> set[str]:
    """Char n-grams with the utils-tokenizer short-doc fallback
    (simhash.py:291 via utils/tokenization.py:35-36): a document shorter than
    n chars becomes a single whole-document token."""
    chars = list(content)
    if len(chars) < n:
        return {"".join(chars)}
    return {content[i : i + n] for i in range(len(chars) - n + 1)}


def simhash_signature(content: str, f: int = 64, ngram: int = 3) -> int:
    """embed_func core (simhash.py:263-302): char-ngram set -> xxh64 each ->
    bit-majority."""
    tokens = char_ngrams(content, ngram)
    return compute([unsigned_hash(t.encode("utf-8"), f=f) for t in tokens], f=f)


def simhash_signatures_batch(
    texts: Sequence[str], f: int = 64, ngram: int = 3
) -> "np.ndarray":
    """uint64[len(texts)] — bit-exact batch of ``simhash_signature``.

    Unique grams across the batch are hashed ONCE with the vectorized
    ``xxh64_batch`` (near-duplicate corpora repeat most grams), and the
    bit-majority runs as one unpack + ``np.add.reduceat`` over document
    offsets instead of a per-document numpy call.
    """
    if f == 128:
        hi, lo = simhash128_signatures_batch(texts, ngram)
        return np.array(
            [(int(h) << 64) | int(l) for h, l in zip(hi, lo)], dtype=object
        )
    if f != 64:
        return np.array(
            [simhash_signature(t, f=f, ngram=ngram) for t in texts], dtype=object
        )
    from .xxh import xxh64_batch

    gram_index: dict = {}
    doc_gram_ids: List[np.ndarray] = []
    for t in texts:
        toks = char_ngrams(t if t is not None else "", ngram)
        ids = np.empty(len(toks), dtype=np.int64)
        for j, tok in enumerate(toks):
            gid = gram_index.get(tok)
            if gid is None:
                gid = len(gram_index)
                gram_index[tok] = gid
            ids[j] = gid
        doc_gram_ids.append(ids)

    hashes = xxh64_batch([g.encode("utf-8") for g in gram_index])

    lens = np.array([len(ids) for ids in doc_gram_ids], dtype=np.int64)
    all_h = hashes[np.concatenate(doc_gram_ids)] if lens.sum() else np.empty(0, np.uint64)
    shifts = np.arange(63, -1, -1, dtype=np.uint64)
    offsets = np.concatenate(([0], np.cumsum(lens)))[:-1]
    nonzero = lens > 0
    ones = np.zeros((len(texts), 64), dtype=np.int64)
    # chunk over documents so the unpacked (grams, 64) bit matrix stays
    # cache-resident (~10 MB) — same trick as minhash_signatures_batch
    chunk_tokens = 20_000
    d0 = 0
    while d0 < len(texts):
        d1, tot = d0, 0
        while d1 < len(texts) and (tot == 0 or tot + lens[d1] <= chunk_tokens):
            tot += lens[d1]
            d1 += 1
        if tot > 0:
            g0 = offsets[d0]
            h = all_h[g0 : g0 + tot]
            # big-endian bytes -> unpackbits = MSB-first 64 bits per hash
            bits = np.unpackbits(
                h.byteswap().view(np.uint8).reshape(-1, 8), axis=1
            ).astype(np.int32)
            sel = nonzero[d0:d1]
            if sel.any():
                ones[d0:d1][sel] = np.add.reduceat(
                    bits, (offsets[d0:d1] - g0)[sel], axis=0
                )
        d0 = d1
    # majority: sum(2b-1) > 0  <=>  2*ones > G
    maj = (2 * ones > lens[:, None]).astype(np.uint64)
    sigs = (maj << shifts[None, :]).sum(axis=1, dtype=np.uint64)
    sigs[~nonzero] = 0  # compute([]) == 0
    return sigs


def simhash128_signatures_batch(
    texts: Sequence[str], ngram: int = 3
) -> Tuple["np.ndarray", "np.ndarray"]:
    """(hi, lo) uint64 halves of the f=128 signature per text — bit-exact
    batch of ``simhash_signature(f=128)``. Unique grams across the batch
    are hashed ONCE with the vectorized XXH3-128 (kernel/xxh.py), and the
    128-way bit majority runs as one unpack + ``np.add.reduceat`` over
    document offsets (same structure as the 64-bit batch)."""
    from .xxh import xxh3_128_batch

    gram_index: dict = {}
    doc_gram_ids: List[np.ndarray] = []
    for t in texts:
        toks = char_ngrams(t if t is not None else "", ngram)
        ids = np.empty(len(toks), dtype=np.int64)
        for j, tok in enumerate(toks):
            gid = gram_index.get(tok)
            if gid is None:
                gid = len(gram_index)
                gram_index[tok] = gid
            ids[j] = gid
        doc_gram_ids.append(ids)

    h_hi, h_lo = xxh3_128_batch([g.encode("utf-8") for g in gram_index])

    lens = np.array([len(ids) for ids in doc_gram_ids], dtype=np.int64)
    order = np.concatenate(doc_gram_ids) if lens.sum() else np.empty(0, np.int64)
    offsets = np.concatenate(([0], np.cumsum(lens)))[:-1]
    nonzero = lens > 0
    ones = np.zeros((len(texts), 128), dtype=np.int64)
    chunk_tokens = 10_000
    d0 = 0
    while d0 < len(texts):
        d1, tot = d0, 0
        while d1 < len(texts) and (tot == 0 or tot + lens[d1] <= chunk_tokens):
            tot += lens[d1]
            d1 += 1
        if tot > 0:
            g0 = offsets[d0]
            gids = order[g0 : g0 + tot]
            # big-endian bytes of (hi, lo) -> unpackbits = MSB-first 128 bits
            by = np.concatenate(
                [
                    h_hi[gids].byteswap().view(np.uint8).reshape(-1, 8),
                    h_lo[gids].byteswap().view(np.uint8).reshape(-1, 8),
                ],
                axis=1,
            )
            bits = np.unpackbits(by, axis=1).astype(np.int32)
            sel = nonzero[d0:d1]
            if sel.any():
                ones[d0:d1][sel] = np.add.reduceat(
                    bits, (offsets[d0:d1] - g0)[sel], axis=0
                )
        d0 = d1
    maj = (2 * ones > lens[:, None]).astype(np.uint64)
    shifts = np.arange(63, -1, -1, dtype=np.uint64)
    hi = (maj[:, :64] << shifts[None, :]).sum(axis=1, dtype=np.uint64)
    lo = (maj[:, 64:] << shifts[None, :]).sum(axis=1, dtype=np.uint64)
    hi[~nonzero] = 0
    lo[~nonzero] = 0  # compute([]) == 0
    return hi, lo
