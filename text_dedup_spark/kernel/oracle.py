"""Single-node oracle pipelines (no Spark) used as ground truth in tests.

These mirror the reference's single-node scripts — the same role the
pinecone notebook's UnionFind comparison plays for the reference
(SURVEY §3.3, §5): the distributed DataFrame pipeline must produce exactly
the same cluster partitions on the same input.
"""

from __future__ import annotations

from typing import Dict, Iterable, List, Tuple

from ..config import MinHashConfig, SimHashConfig
from .minhash import band_bytes, generate_permutations, minhash_signature
from .simhash import create_permutations, hamming_distance, simhash_signature
from .union_find import UnionFind


def minhash_oracle(
    docs: Iterable[Tuple[int, str]], cfg: MinHashConfig
) -> UnionFind:
    """LSH bucket index + per-bucket union, as minhash.py:295-312 (but with
    the spark tokenizer — the parity target, SURVEY §7.4)."""
    cfg = cfg.resolve()
    permutations = generate_permutations(cfg.num_perm, cfg.seed)
    ranges = cfg.ranges
    buckets: Dict[Tuple[int, bytes], List[int]] = {}
    uf = UnionFind()
    for idx, text in docs:
        uf.find(idx)
        sig = minhash_signature(text, cfg.num_perm, cfg.ngram_size, permutations)
        for band_idx, h in enumerate(band_bytes(sig, ranges)):
            buckets.setdefault((band_idx, h), []).append(idx)
    for cluster in buckets.values():
        if len(cluster) <= 1:
            continue
        mn = min(cluster)
        for x in cluster:
            uf.union(x, mn)
    return uf


def simhash_oracle(
    docs: Iterable[Tuple[int, str]], cfg: SimHashConfig
) -> UnionFind:
    """Bucket index + Hamming-verified unions, as simhash.py:305-378.

    NOTE insertion-order sensitivity: the reference only compares a new item
    against items already *in* the bucket; with union-find transitivity the
    resulting partition is order-independent for the pairs that verify, so
    bucket membership + Hamming<=k pairs fully determine the clusters.
    """
    perms = create_permutations(cfg.f, cfg.bit_diff, cfg.num_bucket)
    uf = UnionFind()
    buckets: Dict[Tuple[int, int], List[Tuple[int, int]]] = {}
    sigs: Dict[int, int] = {}
    for idx, text in docs:
        uf.find(idx)
        sigs[idx] = simhash_signature(text, f=cfg.f, ngram=cfg.ngram)
    for idx, sig in sigs.items():
        for p_i, perm in enumerate(perms):
            key = (p_i, perm.bucket_key(sig))
            for idy, other in buckets.get(key, []):
                if hamming_distance(sig, other) <= cfg.bit_diff:
                    uf.union(idx, idy)
            buckets.setdefault(key, []).append((idx, sig))
    return uf


def simhash_fingerprint_oracle(
    items: Iterable[Tuple[int, int]], cfg: SimHashConfig
) -> UnionFind:
    """Same bucketing/verify over precomputed f-bit fingerprints (the phash
    image-dedup path, BASELINE.json F14)."""
    perms = create_permutations(cfg.f, cfg.bit_diff, cfg.num_bucket)
    uf = UnionFind()
    buckets: Dict[Tuple[int, int], List[Tuple[int, int]]] = {}
    for idx, fp in items:
        uf.find(idx)
        for p_i, perm in enumerate(perms):
            key = (p_i, perm.bucket_key(fp))
            for idy, other in buckets.get(key, []):
                if hamming_distance(fp, other) <= cfg.bit_diff:
                    uf.union(idx, idy)
            buckets.setdefault(key, []).append((idx, fp))
    return uf
