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
