"""Bloom pre-filter: never drops a non-duplicate; prunes the exact join.

Reference analogue bloom_filter.py:52-68 (which accepts false-positive
DROPS); this engine uses the Bloom only as a join pre-filter, so the
output is exactly the no-bloom result while the join probe side shrinks."""

import random

from pyspark.sql import functions as F

from text_dedup_spark.operators.bloom import (
    build_bloom,
    exact_dedup_against_history,
    history_hashes,
    might_contain,
)


def _docs(n, prefix, seed):
    rng = random.Random(seed)
    return [
        (i, f"{prefix} document {i} " + " ".join(str(rng.random()) for _ in range(5)))
        for i in range(n)
    ]


def test_bloom_no_false_negatives_and_bounded_fpp(spark):
    hist = spark.createDataFrame(_docs(2000, "hist", 1), "doc_id long, text string")
    hashes = history_hashes(hist, "text").persist()
    sketch = build_bloom(hashes, "__h__", expected=2000, fpp=0.01)

    # every historical hash MUST hit (no false negatives)
    hits = hashes.withColumn("m", might_contain(F.col("__h__"), sketch, spark))
    assert hits.where(~F.col("m")).count() == 0

    # novel values hit at ~fpp, not more than a loose bound
    novel = spark.createDataFrame(_docs(2000, "new", 2), "doc_id long, text string")
    novel_hashes = history_hashes(novel, "text")
    fp = (
        novel_hashes.withColumn("m", might_contain(F.col("__h__"), sketch, spark))
        .where(F.col("m"))
        .count()
    )
    assert fp <= 2000 * 0.05, fp  # 1% nominal, 5% hard ceiling
    hashes.unpersist()


def test_exact_dedup_against_history_matches_plain_anti_join(spark):
    hist = spark.createDataFrame(_docs(1000, "hist", 3), "doc_id long, text string")
    new_rows = _docs(500, "new", 4) + [
        (10_000 + i, t) for i, t in [(r[0], r[1]) for r in _docs(1000, "hist", 3)[:120]]
    ]  # 120 rows duplicate historical content
    new = spark.createDataFrame(new_rows, "doc_id long, text string")
    hashes = history_hashes(hist, "text").persist()
    sketch = build_bloom(hashes, "__h__", expected=1000, fpp=0.01)

    got = {
        r["doc_id"]
        for r in exact_dedup_against_history(new, hashes, "text", sketch).collect()
    }
    # oracle: plain exact anti-join without any bloom
    from text_dedup_spark.operators.exact import content_hash

    expect = {
        r["doc_id"]
        for r in new.withColumn("__h__", content_hash(F.col("text"), "md5"))
        .join(hashes, "__h__", "left_anti")
        .collect()
    }
    assert got == expect  # never drops a non-duplicate, never keeps a dup
    assert len(expect) == 500  # all novel rows survive, all 120 dups dropped
    hashes.unpersist()


def test_bloom_empty_history(spark):
    empty = spark.createDataFrame([], "__h__ string")
    sketch = build_bloom(empty, "__h__", expected=10, fpp=0.01)
    new = spark.createDataFrame(_docs(50, "x", 5), "doc_id long, text string")
    out = exact_dedup_against_history(new, empty, "text", sketch)
    assert out.count() == 50


def test_bloom_dedup_on_streaming_frame(spark, tmp_path):
    """exact_dedup_against_history works as a stream-static join (the
    incremental-ingest deployment shape): streamed new docs against a
    static history, bloom pruning intact."""
    hist = spark.createDataFrame(_docs(300, "hist", 6), "doc_id long, text string")
    hashes = history_hashes(hist, "text").persist()
    hashes.count()
    sketch = build_bloom(hashes, "__h__", expected=300, fpp=0.01)

    new_rows = _docs(200, "new", 7) + [
        (20_000 + i, t) for i, t in _docs(300, "hist", 6)[:50]
    ]  # 50 streamed rows duplicate historical content
    inp = str(tmp_path / "bloom_stream_in")
    spark.createDataFrame(new_rows, "doc_id long, text string").coalesce(1)\
        .write.mode("overwrite").parquet(inp)

    stream = spark.readStream.schema("doc_id long, text string").parquet(inp)
    out = exact_dedup_against_history(stream, hashes, "text", sketch)
    assert out.isStreaming
    q = (
        out.writeStream.format("memory").queryName("bloom_stream")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_bloom"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {r["doc_id"] for r in spark.sql("select doc_id from bloom_stream").collect()}
    assert got == {doc_id for doc_id, _ in _docs(200, "new", 7)}
    hashes.unpersist()
