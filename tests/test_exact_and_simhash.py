"""Exact-hash and SimHash operators vs their single-node oracles."""

import random

import pytest
from pyspark.sql import functions as F

from text_dedup_spark.config import SimHashConfig
from text_dedup_spark.kernel.oracle import simhash_fingerprint_oracle, simhash_oracle
from text_dedup_spark.kernel.simhash import simhash_signature
from text_dedup_spark.kernel.union_find import UnionFind
from text_dedup_spark.operators.apply import split_survivors
from text_dedup_spark.operators.cc import connected_components
from text_dedup_spark.operators.exact import exact_assignments, exact_dedup
from text_dedup_spark.operators.simhash_dedup import (
    simhash_assignments_from_fingerprint,
    simhash_assignments_from_text,
    simhash_fingerprints,
)

from conftest import synth_corpus


def partitions(assign_rows, all_ids):
    uf = UnionFind()
    for x in all_ids:
        uf.find(x)
    for a, b in assign_rows:
        uf.union(a, b)
    return {frozenset(c) for c in uf.clusters().values() if len(c) > 1}


# --- exact hash ---


def test_exact_assignments_min_representative(spark):
    docs = [(10, "aa"), (3, "aa"), (7, "bb"), (1, "cc"), (5, "aa"), (2, "bb")]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    rows = {(r["doc_id"], r["component"]) for r in exact_assignments(df, "text", "doc_id").collect()}
    assert rows == {(10, 3), (5, 3), (7, 2)}
    kept, removed = split_survivors(df, exact_assignments(df, "text", "doc_id"), "doc_id")
    assert {r["doc_id"] for r in kept.collect()} == {3, 2, 1}
    assert {r["doc_id"] for r in removed.collect()} == {10, 5, 7}


def test_exact_dedup_window_variant(spark):
    docs = [(10, "aa"), (3, "aa"), (7, "bb"), (1, "cc"), (5, "aa"), (2, "bb")]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    kept = {r["doc_id"] for r in exact_dedup(df, "text", "doc_id").collect()}
    assert kept == {3, 2, 1}
    # sha256 variant agrees
    kept2 = {r["doc_id"] for r in exact_dedup(df, "text", "doc_id", algo="sha256").collect()}
    assert kept2 == kept


# --- simhash: UDF fingerprints bit-exact vs kernel ---

CFG = SimHashConfig(f=64, bit_diff=3, num_bucket=4, ngram=3)


@pytest.fixture(scope="module")
def corpus():
    return synth_corpus(150, seed=7)


def test_simhash_udf_matches_kernel(spark, corpus):
    df = spark.createDataFrame(corpus, "doc_id long, text string")
    rows = simhash_fingerprints(df, "text", CFG, "doc_id").collect()
    got = {r["doc_id"]: r["sig"] & ((1 << 64) - 1) for r in rows}
    for idx, text in corpus:
        assert got[idx] == simhash_signature(text, f=64, ngram=3), idx


def test_simhash_text_clusters_match_oracle(spark, corpus):
    df = spark.createDataFrame(corpus, "doc_id long, text string")
    assigns = simhash_assignments_from_text(df, "text", CFG, "doc_id").collect()
    all_ids = [i for i, _ in corpus]
    got = partitions([(r["doc_id"], r["component"]) for r in assigns], all_ids)

    oracle = simhash_oracle(corpus, CFG)
    expect = {frozenset(c) for c in oracle.clusters().values() if len(c) > 1}
    assert got == expect
    # min-representative absence invariant
    got_ids = {r["doc_id"] for r in assigns}
    for c in expect:
        assert min(c) not in got_ids


def test_simhash_fingerprint_path_matches_oracle(spark):
    # synthetic phash population with planted Hamming-near neighbors
    rng = random.Random(42)
    items = []
    base_fps = [rng.getrandbits(64) for _ in range(60)]
    idx = 0
    for fp in base_fps:
        items.append((idx, fp)); idx += 1
        if rng.random() < 0.4:  # plant a near-dup within bit_diff
            mutated = fp
            for _ in range(rng.randint(1, 3)):
                mutated ^= 1 << rng.randrange(64)
            items.append((idx, mutated)); idx += 1
        if rng.random() < 0.2:  # exact duplicate fingerprint
            items.append((idx, fp)); idx += 1

    signed = [(i, fp - (1 << 64) if fp >= (1 << 63) else fp) for i, fp in items]
    df = spark.createDataFrame(signed, "img_id long, phash long")
    assigns = simhash_assignments_from_fingerprint(df, "phash", CFG, "img_id").collect()
    all_ids = [i for i, _ in items]
    got = partitions([(r["img_id"], r["component"]) for r in assigns], all_ids)

    oracle = simhash_fingerprint_oracle(items, CFG)
    expect = {frozenset(c) for c in oracle.clusters().values() if len(c) > 1}
    assert got == expect


CFG128 = SimHashConfig(f=128, bit_diff=3, num_bucket=4, ngram=3)


def test_xxh3_128_spec_goldens():
    """Published vectors pin the shared secret bytes and both avalanches
    (XXH3-64 and -128 share them); remaining length paths are covered by the
    gated exact test below plus structural checks."""
    from text_dedup_spark.kernel.xxh import xxh3_64_int, xxh3_128_int

    assert xxh3_64_int(b"") == 0x2D06800538D394C2
    assert xxh3_128_int(b"") == 0x99AA06D3014798D86001C324468D497F
    seen = set()
    for n in [1, 2, 3, 4, 7, 8, 9, 12, 16, 17, 64, 96, 128, 129, 200, 240, 241, 500, 3000]:
        h = xxh3_128_int(bytes(range(256))[:1] * n)
        assert 0 <= h < (1 << 128)
        assert h == xxh3_128_int(b"\x00" * n)  # deterministic
        seen.add(h)
    assert len(seen) == 19  # every length path produces a distinct hash


def test_xxh3_128_matches_real_lib_if_available():
    try:
        import xxhash
    except ImportError:
        import pytest as _pytest

        _pytest.skip("xxhash package not installed in this environment")
    if getattr(xxhash, "__refstub__", False):
        # tests/_refstubs.py may have installed its kernel-backed substitute
        # (it feeds the reference modules); comparing the kernel against
        # itself would be circular, so this external check still skips.
        import pytest as _pytest

        _pytest.skip("only the _refstubs xxhash substitute is present")
    import random as _r

    from text_dedup_spark.kernel.xxh import xxh3_128_int

    rng = _r.Random(3)
    for n in list(range(0, 32)) + [63, 64, 65, 127, 128, 129, 200, 240, 241, 512, 2048]:
        data = bytes(rng.getrandbits(8) for _ in range(n))
        assert xxh3_128_int(data) == xxhash.xxh128(data).intdigest(), n


def test_unsigned_hash_128_lengths():
    """simhash.py:215-220 doctest parity: f selects the digest width."""
    from text_dedup_spark.kernel.simhash import compute, unsigned_hash

    h64 = unsigned_hash(b"hello world", f=64)
    h128 = unsigned_hash(b"hello world", f=128)
    assert 0 <= h64 < (1 << 64)
    assert (1 << 64) <= h128 < (1 << 128)  # realistic 128-bit value
    sig = compute([h128, unsigned_hash(b"other token", f=128)], f=128)
    assert 0 <= sig < (1 << 128)


def test_catalyst_bucket_keys128_match_kernel(spark):
    from text_dedup_spark.functions.simhash_udf import bucket_keys128_expr
    from text_dedup_spark.kernel.simhash import create_permutations

    rng = random.Random(5)
    m = (1 << 64) - 1

    def s64(x):
        return x - (1 << 64) if x >= (1 << 63) else x

    fps = [rng.getrandbits(128) for _ in range(200)]
    df = spark.createDataFrame(
        [(s64(fp >> 64), s64(fp & m)) for fp in fps], "hi long, lo long"
    )
    rows = df.select(
        bucket_keys128_expr(F.col("hi"), F.col("lo"), CFG128).alias("keys")
    ).collect()
    perms = create_permutations(CFG128.f, CFG128.bit_diff, CFG128.num_bucket)
    for fp, row in zip(fps, rows):
        expect = [p.bucket_key(fp) for p in perms]
        got = [
            ((k["key_hi"] & m) << 64) | (k["key_lo"] & m) for k in row["keys"]
        ]
        assert got == expect


def test_simhash128_text_clusters_match_oracle(spark, corpus):
    df = spark.createDataFrame(corpus, "doc_id long, text string")
    assigns = simhash_assignments_from_text(df, "text", CFG128, "doc_id").collect()
    all_ids = [i for i, _ in corpus]
    got = partitions([(r["doc_id"], r["component"]) for r in assigns], all_ids)

    oracle = simhash_oracle(corpus, CFG128)
    expect = {frozenset(c) for c in oracle.clusters().values() if len(c) > 1}
    assert got == expect


def test_catalyst_bucket_keys_match_kernel(spark):
    # the JVM bitwise permute/mask must equal the kernel Permutation
    from text_dedup_spark.functions.simhash_udf import bucket_keys_expr
    from text_dedup_spark.kernel.simhash import create_permutations

    rng = random.Random(1)
    fps = [rng.getrandbits(64) for _ in range(200)]
    signed = [(fp - (1 << 64) if fp >= (1 << 63) else fp,) for fp in fps]
    df = spark.createDataFrame(signed, "fp long")
    rows = df.select(bucket_keys_expr(F.col("fp"), CFG).alias("keys")).collect()
    perms = create_permutations(CFG.f, CFG.bit_diff, CFG.num_bucket)
    for fp, row in zip(fps, rows):
        expect = [p.bucket_key(fp) for p in perms]
        got = [k & ((1 << 64) - 1) for k in row["keys"]]
        assert got == expect
