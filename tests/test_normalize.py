"""CCNet-style normalized-exact dedup: goldens, DuckDB parity with the
oracle restatement, idempotence, and the dedup tier itself."""

import duckdb
import pytest
from pyspark.sql import functions as F

from text_dedup_spark.operators.exact import exact_assignments
from text_dedup_spark.operators.normalize import (
    normalize_sql,
    normalize_text_expr,
    normalized_exact_assignments,
    normalized_exact_dedup,
)

CASES = [
    ("  Héllo, Wörld! 42 CAFÉS  naïve—ok ", "hello world 00 cafes naive—ok"),
    ("Hello,  World 42!", "hello world 00"),
    ("héllo world 7", "hello world 0"),
    ("UPPER lower MiXeD", "upper lower mixed"),
    ("tabs\tand\nnewlines\r\n collapse", "tabs and newlines collapse"),
    ("price: $1,234.56 (USD)", "price 000000 usd"),
    ("", ""),
    ("!!!", ""),
    ("øresund Ølsen", "oresund olsen"),  # Ø lowercases to ø, which folds
    ("no-op plain text", "noop plain text"),
]


def _spark_normalize(spark, texts):
    df = spark.createDataFrame([(t,) for t in texts], "t string")
    rows = df.select(normalize_text_expr(F.col("t")).alias("n")).collect()
    return [r["n"] for r in rows]


def test_goldens(spark):
    got = _spark_normalize(spark, [c[0] for c in CASES])
    assert got == [c[1] for c in CASES]


def test_duckdb_oracle_parity(spark):
    """The SQL restatement used by the contract-query oracle produces
    byte-identical output for every golden + a unicode-heavy extra set."""
    texts = [c[0] for c in CASES] + [
        "ÀÁÂÃÄÅ Ç ÈÉÊË ÌÍÎÏ Ñ ÒÓÔÕÖ ÙÚÛÜ Ý ÿ",
        "混合 CJK と ASCII 42!",
        "a" * 500 + " 9 " + "B" * 10,
    ]
    spark_out = _spark_normalize(spark, texts)
    con = duckdb.connect()
    duck_out = [
        con.execute(f"SELECT {normalize_sql('?')}", [t]).fetchone()[0]
        for t in texts
    ]
    assert spark_out == duck_out


def test_idempotent(spark):
    once = _spark_normalize(spark, [c[0] for c in CASES])
    twice = _spark_normalize(spark, once)
    assert twice == once


def test_normalized_assignments_catch_what_raw_exact_misses(spark):
    rows = [
        (1, "The quick brown fox 4."),
        (2, "the QUICK brown   fox 7"),  # normalized-equal to 1 (digit->0)
        (3, "thé quick bröwn fox, 0!"),  # normalized-equal to 1
        (4, "a different document"),
        (5, "a different document"),  # raw-exact dup of 4
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    raw = {
        (r["doc_id"], r["component"])
        for r in exact_assignments(df, "text", "doc_id").collect()
    }
    assert raw == {(5, 4)}
    norm = {
        (r["doc_id"], r["component"])
        for r in normalized_exact_assignments(df, "text", "doc_id").collect()
    }
    assert norm == {(2, 1), (3, 1), (5, 4)}


def test_normalized_dedup_keeps_original_payload(spark):
    rows = [
        (10, "Hello World!", "keep-me"),
        (11, "hello   world", "drop-me"),
        (12, "other", "solo"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, payload string")
    out = normalized_exact_dedup(df, "text", "doc_id").collect()
    got = {(r["doc_id"], r["text"], r["payload"]) for r in out}
    # min-id survivor, ORIGINAL (un-normalized) text and payload intact,
    # no helper column left behind
    assert got == {(10, "Hello World!", "keep-me"), (12, "other", "solo")}
    assert set(out[0].asDict()) == {"doc_id", "text", "payload"}


@pytest.mark.parametrize("seed", [0, 1])
def test_assignment_partitioning_independence(spark, seed):
    # letter variants, not digits — digit bucketing would merge all groups
    rows = [(i, f"Doc {chr(97 + i % 7)} body TEXT!") for i in range(40)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    a = {
        (r["doc_id"], r["component"])
        for r in normalized_exact_assignments(
            df.repartition(1 + seed * 7), "text", "doc_id"
        ).collect()
    }
    b = {
        (r["doc_id"], r["component"])
        for r in normalized_exact_assignments(
            df.repartition(4 - seed * 3, "text"), "text", "doc_id"
        ).collect()
    }
    assert a == b and len(a) == 40 - 7
