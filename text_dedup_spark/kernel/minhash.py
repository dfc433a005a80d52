"""MinHash kernel — bit-exact re-derivation of the reference semantics.

Reference parity (all citations into /root/reference):
- tokenizer regex + shingling: text_dedup/minhash_spark.py:25,58-85,146
- sha1_hash32: text_dedup/minhash_spark.py:88-110
- universal-hash permutations: text_dedup/minhash_spark.py:313-322
- signature + banding: text_dedup/minhash_spark.py:113-156
- optimal_param: text_dedup/minhash_spark.py:159-221 (scipy.integrate.quad
  replaced by a composite-Simpson integrator since scipy is not available;
  validated against the reference doctest goldens).

Everything here is pure Python/numpy so it can be unit-tested against the
reference's doctest vectors without a SparkSession.
"""

from __future__ import annotations

import hashlib
import re
import struct
from typing import Iterable, List, Sequence, Tuple

import numpy as np

SEED = 42
NON_ALPHA = re.compile("[^A-Za-z_0-9]")
MAX_HASH = np.uint64((1 << 32) - 1)
MERSENNE_PRIME = np.uint64((1 << 61) - 1)


def ngrams(sequence: Sequence[str], n: int) -> Iterable[Tuple[str, ...]]:
    """Sliding word n-grams, NO padding and NO short-document fallback.

    This is the *spark-script* behavior (minhash_spark.py:58-85): a sequence
    shorter than ``n`` yields nothing (=> all-MAX_HASH signature). The
    reference's utils/tokenization.py:35-36 instead returns the whole
    sequence as one gram — a real divergence; we pin the spark behavior
    because the target is matching `minhash_spark` cluster assignments
    (SURVEY.md §7.4).

    >>> list(ngrams(['a', 'b', 'c', 'd'], 2))
    [('a', 'b'), ('b', 'c'), ('c', 'd')]
    >>> list(ngrams(['a', 'b', 'c', 'd'], 3))
    [('a', 'b', 'c'), ('b', 'c', 'd')]
    >>> list(ngrams(['a', 'b'], 3))
    []
    """
    if n <= 0:
        raise ValueError("n must be positive")
    return zip(*(sequence[i:] for i in range(n)))


def tokenize(content: str, ngram_size: int) -> set[str]:
    """Reference tokenization: replace newlines, split on NON_ALPHA, drop
    empties, join each word n-gram with a single space, set-dedup.

    Parity: minhash_spark.py:146.
    """
    words = [w for w in NON_ALPHA.split(content.replace("\n", " ")) if w]
    return {" ".join(t) for t in ngrams(words, ngram_size)}


def sha1_hash32(data: bytes) -> int:
    """First 4 bytes of SHA1, little-endian (minhash_spark.py:88-110).

    >>> sha1_hash32(b"hello")
    499578026
    """
    return struct.unpack("<I", hashlib.sha1(data).digest()[:4])[0]


def sha1_hash(data: bytes, d: int = 32) -> int:
    """d-bit little-endian SHA1 prefix (single-node variant, minhash.py:54-77).

    >>> sha1_hash(b"hello world", 64)
    13028719972609469994
    """
    if d == 32:
        return struct.unpack("<I", hashlib.sha1(data).digest()[:4])[0]
    if d == 64:
        return struct.unpack("<Q", hashlib.sha1(data).digest()[:8])[0]
    return int.from_bytes(hashlib.sha1(data).digest()[: d // 8], "little")


def generate_permutations(num_perm: int, seed: int = SEED) -> np.ndarray:
    """The (a, b) universal-hash coefficients, drawn in the reference's exact
    order: per permutation a pair (a in [1, p), b in [0, p)) as uint64 from
    ``np.random.RandomState(seed)``, then transposed to shape (2, num_perm).

    Parity: minhash_spark.py:313-322. Any deviation in draw order changes
    every signature (SURVEY.md §7.4 risk #1).
    """
    rng = np.random.RandomState(seed)
    return np.array(
        [
            (
                rng.randint(1, MERSENNE_PRIME, dtype=np.uint64),
                rng.randint(0, MERSENNE_PRIME, dtype=np.uint64),
            )
            for _ in range(num_perm)
        ],
        dtype=np.uint64,
    ).T


def minhash_signature(
    content: str,
    num_perm: int,
    ngram_size: int,
    permutations: np.ndarray,
    token_cache: dict | None = None,
) -> np.ndarray:
    """uint64[num_perm] MinHash signature, bit-exact vs minhash_spark.py:144-153.

    ``token_cache`` optionally memoizes sha1_hash32 per unique token across a
    batch (the UDF layer passes one per Arrow batch) — pure speedup, no
    semantic effect.
    """
    hashvalues = np.ones(num_perm, dtype=np.uint64) * MAX_HASH
    tokens = tokenize(content, ngram_size)
    if token_cache is None:
        hv_list = [sha1_hash32(t.encode("utf-8")) for t in tokens]
    else:
        hv_list = []
        for t in tokens:
            h = token_cache.get(t)
            if h is None:
                h = sha1_hash32(t.encode("utf-8"))
                token_cache[t] = h
            hv_list.append(h)
    hv = np.array(hv_list, dtype=np.uint64)
    a, b = permutations
    phv = np.bitwise_and(
        ((hv * np.tile(a, (len(hv), 1)).T).T + b) % MERSENNE_PRIME, MAX_HASH
    )
    return np.vstack([phv, hashvalues]).min(axis=0)


def minhash_signatures_batch(
    texts: Sequence[str],
    num_perm: int,
    ngram_size: int,
    permutations: np.ndarray,
    token_cache: dict | None = None,
    chunk_tokens: int = 20_000,  # ~10 MB of (T, 64) uint64 working set:
    # small enough to stay cache-resident — measured ~10x faster than a
    # 200k-token chunk on this workload
) -> np.ndarray:
    """uint64[len(texts), num_perm] — bit-exact batch equivalent of
    ``minhash_signature`` per row, with the permutation/min step vectorized
    ACROSS documents: all token hashes of a ~chunk_tokens-token chunk form
    one (T, num_perm) universal-hash matrix, and per-document minima come
    from ``np.minimum.reduceat`` over document offsets. Identical uint64
    wraparound arithmetic as the reference (minhash_spark.py:144-153)."""
    a, b = permutations
    n = len(texts)
    sigs = np.full((n, num_perm), MAX_HASH, dtype=np.uint64)
    cache = token_cache if token_cache is not None else {}

    hv_arrays: List[np.ndarray] = []
    for t in texts:
        toks = tokenize(t or "", ngram_size)
        arr = np.empty(len(toks), dtype=np.uint64)
        for i, tok in enumerate(toks):
            h = cache.get(tok)
            if h is None:
                h = sha1_hash32(tok.encode("utf-8"))
                cache[tok] = h
            arr[i] = h
        hv_arrays.append(arr)

    start = 0
    while start < n:
        end, tot = start, 0
        while end < n and (tot == 0 or tot + len(hv_arrays[end]) <= chunk_tokens):
            tot += len(hv_arrays[end])
            end += 1
        lens = np.array([len(hv_arrays[i]) for i in range(start, end)], dtype=np.int64)
        nonzero = lens > 0
        if tot > 0:
            hv = np.concatenate(hv_arrays[start:end])
            # phv[i, p] = ((hv[i] * a[p] + b[p]) mod MERSENNE) & MAX_HASH,
            # all uint64 wraparound — same elementwise values as the
            # reference's tile/transpose formulation. The mod uses the
            # Mersenne reduction (2^61 ≡ 1 mod p, so y ≡ (y>>61)+(y&p)):
            # shift/add/compare vectorize where numpy's % does not.
            x = hv[:, None] * a[None, :] + b[None, :]
            m = (x >> np.uint64(61)) + (x & MERSENNE_PRIME)
            m -= np.where(m >= MERSENNE_PRIME, MERSENNE_PRIME, np.uint64(0))
            phv = np.bitwise_and(m, MAX_HASH)
            offsets = np.concatenate(([0], np.cumsum(lens)))[:-1][nonzero]
            sigs[start:end][nonzero] = np.minimum.reduceat(phv, offsets, axis=0)
        start = end
    return sigs


def hash_ranges(b: int, r: int) -> List[Tuple[int, int]]:
    """Band slice offsets (minhash_spark.py:312)."""
    return [(i * r, (i + 1) * r) for i in range(b)]


def band_bytes(hashvalues: np.ndarray, hashranges: List[Tuple[int, int]]) -> List[bytes]:
    """Big-endian byte serialization of each band slice
    (minhash_spark.py:155: ``bytes(hashvalues[start:end].byteswap().data)``)."""
    return [bytes(hashvalues[start:end].byteswap().data) for start, end in hashranges]


def _integrate(f, a: float, b: float, n: int = 1024) -> float:
    """Composite Simpson integration (stand-in for scipy.integrate.quad,
    which is unavailable here). The integrands are smooth S-curves on [0,1],
    so Simpson at n=1024 matches quad far beyond the grid-search resolution
    needed by optimal_param (validated by the doctest goldens below)."""
    if b <= a:
        return 0.0
    xs = np.linspace(a, b, n + 1)
    ys = f(xs)
    h = (b - a) / n
    return float(h / 3.0 * (ys[0] + ys[-1] + 4.0 * ys[1:-1:2].sum() + 2.0 * ys[2:-1:2].sum()))


def optimal_param(
    threshold: float,
    num_perm: int,
    false_positive_weight: float = 0.5,
    false_negative_weight: float = 0.5,
) -> Tuple[int, int]:
    """Grid-search (b, r) minimizing weighted FP+FN of the LSH S-curve.

    Parity: minhash_spark.py:159-221 (itself from datasketch).

    >>> optimal_param(0.7, 256)
    (25, 10)
    >>> optimal_param(0.75, 256)
    (21, 12)
    >>> optimal_param(0.75, 256, 0.1, 0.9)
    (28, 9)
    """

    def false_positive_probability(threshold: float, b: int, r: int) -> float:
        return _integrate(lambda s: 1 - (1 - s ** float(r)) ** float(b), 0.0, threshold)

    def false_negative_probability(threshold: float, b: int, r: int) -> float:
        return _integrate(
            lambda s: 1 - (1 - (1 - s ** float(r)) ** float(b)), threshold, 1.0
        )

    min_error = float("inf")
    opt = (0, 0)
    for b in range(1, num_perm + 1):
        max_r = int(num_perm / b)
        for r in range(1, max_r + 1):
            fp = false_positive_probability(threshold, b, r)
            fn = false_negative_probability(threshold, b, r)
            error = fp * false_positive_weight + fn * false_negative_weight
            if error < min_error:
                min_error = error
                opt = (b, r)
    return opt


def jaccard_ngrams(a: str, b: str, n: int = 8) -> float:
    """True n-gram Jaccard similarity for validation (utils/analysis.py:16-20)."""
    sa = tokenize(a, n)
    sb = tokenize(b, n)
    if not sa and not sb:
        return 1.0
    return len(sa & sb) / max(1, len(sa | sb))
