"""Structured-Streaming front-end tests: streamed outputs must be
bit-identical to the batch path for the same rows, and streaming exact-dedup
keeps first-seen rows within the watermark."""

from __future__ import annotations

import datetime

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from text_dedup_spark.config import MinHashConfig
from text_dedup_spark.operators.lsh import band_rows
from text_dedup_spark.streaming.incremental import (
    streaming_band_rows,
    streaming_exact_dedup,
    streaming_minhash_signatures,
)

CFG = MinHashConfig(ngram_size=3, num_perm=16, threshold=0.7)

SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("text", StringType()),
        StructField("ts", TimestampType()),
    ]
)


def _write_stream_input(spark, tmp_path, rows):
    path = str(tmp_path / "stream_in")
    spark.createDataFrame(rows, SCHEMA).coalesce(1).write.mode("overwrite").parquet(path)
    return path


def _run_available_now(stream_df, tmp_path, name):
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / f"ckpt_{name}"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return q


_T0 = datetime.datetime(2026, 1, 1, 12, 0, 0)


def _rows():
    mk = lambda i, t, s: (i, t, _T0 + datetime.timedelta(seconds=s))
    return [
        mk(1, "the quick brown fox jumps over the lazy dog", 0),
        mk(2, "pack my box with five dozen liquor jugs", 10),
        mk(3, "the quick brown fox jumps over the lazy dog", 20),  # dup of 1
        mk(4, "sphinx of black quartz judge my vow", 30),
        mk(5, "pack my box with five dozen liquor jugs", 3600),  # dup of 2
    ]


def test_streaming_band_rows_match_batch(spark, tmp_path):
    rows = _rows()
    path = _write_stream_input(spark, tmp_path, rows)
    stream = spark.readStream.schema(SCHEMA).parquet(path)
    q = _run_available_now(
        streaming_band_rows(stream, "text", CFG, "doc_id"), tmp_path, "bands_stream"
    )
    got = {
        (r["doc_id"], r["band"], r["band_hash"])
        for r in spark.sql("SELECT * FROM bands_stream").collect()
    }
    batch = {
        (r["doc_id"], r["band"], r["band_hash"])
        for r in band_rows(
            spark.createDataFrame(rows, SCHEMA), "text", CFG, "doc_id"
        ).collect()
    }
    q.stop()
    assert got == batch and len(got) > 0


def test_streaming_signatures_match_batch(spark, tmp_path):
    from text_dedup_spark.functions.minhash_udf import make_signature_udf

    rows = _rows()
    path = _write_stream_input(spark, tmp_path, rows)
    stream = spark.readStream.schema(SCHEMA).parquet(path)
    q = _run_available_now(
        streaming_minhash_signatures(stream, "text", CFG, "doc_id"),
        tmp_path,
        "sig_stream",
    )
    got = {
        r["doc_id"]: tuple(r["signature"])
        for r in spark.sql("SELECT * FROM sig_stream").collect()
    }
    udf = make_signature_udf(CFG)
    batch = {
        r["doc_id"]: tuple(r["signature"])
        for r in spark.createDataFrame(rows, SCHEMA)
        .select("doc_id", udf(F.col("text")).alias("signature"))
        .collect()
    }
    q.stop()
    assert got == batch


def test_streaming_exact_dedup_drops_in_watermark_dup(spark, tmp_path):
    rows = _rows()
    path = _write_stream_input(spark, tmp_path, rows)
    stream = spark.readStream.schema(SCHEMA).parquet(path)
    q = _run_available_now(
        streaming_exact_dedup(stream, "text", "ts", watermark="10 minutes"),
        tmp_path,
        "exact_stream",
    )
    kept = sorted(
        r["doc_id"] for r in spark.sql("SELECT * FROM exact_stream").collect()
    )
    q.stop()
    # doc 3 (dup of 1, 20s later: inside watermark) dropped; in one
    # availableNow batch doc 5 is deduped against doc 2's in-state entry too
    assert 1 in kept and 2 in kept and 4 in kept
    assert 3 not in kept
