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


def test_sharded_bloom_matches_plain_anti_join(spark):
    """VERDICT r2 #3: hash-range-sharded sketch (no driver merge, no full
    broadcast) must reproduce the plain anti-join exactly at n_shards > 1,
    including shards that hold no history (rows there are definitely new)."""
    from text_dedup_spark.operators.bloom import (
        build_bloom_sharded,
        exact_dedup_against_history_sharded,
        flag_might_contain_sharded,
    )
    from text_dedup_spark.operators.exact import content_hash

    hist = spark.createDataFrame(_docs(1000, "hist", 3), "doc_id long, text string")
    new_rows = _docs(500, "new", 4) + [
        (10_000 + i, t) for i, t in [(r[0], r[1]) for r in _docs(1000, "hist", 3)[:120]]
    ]
    new = spark.createDataFrame(new_rows, "doc_id long, text string")
    hashes = history_hashes(hist, "text").persist()

    for n_shards in (1, 4, 16):
        sb = build_bloom_sharded(hashes, "__h__", expected=1000, fpp=0.01, n_shards=n_shards)
        got = {
            r["doc_id"]
            for r in exact_dedup_against_history_sharded(new, hashes, "text", sb).collect()
        }
        expect = {
            r["doc_id"]
            for r in new.withColumn("__h__", content_hash(F.col("text"), "md5"))
            .join(hashes, "__h__", "left_anti")
            .collect()
        }
        assert got == expect, n_shards
        assert len(expect) == 500

    # no false negatives per shard: every historical hash must flag maybe
    sb = build_bloom_sharded(hashes, "__h__", expected=1000, fpp=0.01, n_shards=8)
    flags = flag_might_contain_sharded(hashes, "__h__", sb)
    assert flags.where(~F.col("__maybe__")).count() == 0
    # exactly one sketch row per non-empty shard
    n_sketches = sb.sketches.count()
    assert 1 <= n_sketches <= 8
    hashes.unpersist()


def test_sharded_bloom_empty_history_and_empty_shards(spark):
    from text_dedup_spark.operators.bloom import (
        build_bloom_sharded,
        exact_dedup_against_history_sharded,
    )

    empty = spark.createDataFrame([], "__h__ string")
    sb = build_bloom_sharded(empty, "__h__", expected=10, fpp=0.01, n_shards=4)
    new = spark.createDataFrame(_docs(50, "x", 5), "doc_id long, text string")
    assert exact_dedup_against_history_sharded(new, empty, "text", sb).count() == 50

    # tiny history occupying a strict subset of shards
    hist = spark.createDataFrame(_docs(3, "hist", 9), "doc_id long, text string")
    hashes = history_hashes(hist, "text")
    sb2 = build_bloom_sharded(hashes, "__h__", expected=3, fpp=0.01, n_shards=16)
    dup = spark.createDataFrame(
        [(99, _docs(3, "hist", 9)[0][1])], "doc_id long, text string"
    )
    mixed = new.unionByName(dup)
    got = {
        r["doc_id"]
        for r in exact_dedup_against_history_sharded(mixed, hashes, "text", sb2).collect()
    }
    assert got == {r[0] for r in _docs(50, "x", 5)}


def test_auto_n_shards_rule():
    from text_dedup_spark.operators.bloom import (
        DRIVER_SKETCH_MAX_EXPECTED,
        auto_n_shards,
    )

    # driver-merged up to the documented threshold
    assert auto_n_shards(1) == 0
    assert auto_n_shards(DRIVER_SKETCH_MAX_EXPECTED) == 0
    # sharded above it, never fewer than 8 shards
    assert auto_n_shards(DRIVER_SKETCH_MAX_EXPECTED + 1) == 8
    # ~25M expected values per shard at the 10^9/10^10 scales
    assert auto_n_shards(1_000_000_000) == 40
    assert auto_n_shards(10_000_000_000) == 400


def test_dedup_against_history_front_door_both_paths(spark):
    """The auto front door's output is path-independent and equals the
    plain anti-join truth (n_shards=0 driver-merged vs pinned sharded)."""
    from text_dedup_spark.operators.bloom import dedup_against_history

    hist = spark.createDataFrame(_docs(300, "hist", 21), "doc_id long, text string")
    novel = spark.createDataFrame(_docs(80, "new", 22), "doc_id long, text string")
    dups = hist.where("doc_id % 5 = 0").select(
        (F.col("doc_id") + 1000).alias("doc_id"), "text"
    )
    new = novel.unionByName(dups)

    truth = {
        r["doc_id"]
        for r in new.join(hist.select("text"), "text", "left_anti").collect()
    }
    for n_shards in (None, 0, 4):
        got = {
            r["doc_id"]
            for r in dedup_against_history(
                new, hist, "text", n_shards=n_shards
            ).collect()
        }
        assert got == truth, f"n_shards={n_shards}"
