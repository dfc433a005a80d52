"""Benchmark decontamination: flag corpus documents sharing any word
n-gram with an evaluation/benchmark set (the GPT-3 appendix-C / Llama
13-gram rule) — the standard training-data hygiene step that sits next to
dedup in every pretraining pipeline. The reference suite stops at
corpus-internal duplication; this closes the corpus-vs-benchmark half.

Scale shape (the part that matters at 100 TB):

- benchmark n-gram sets are small by nature (eval suites are MBs) — the
  distinct benchmark grams are optionally collapsed to 64-bit xxhash64
  keys and BROADCAST, so the corpus-side gram explosion is consumed by a
  map-side semi-join: the corpus never shuffles, no matter its size.
- only matching (corpus_id, gram) rows — a vanishingly small set —
  shuffle for the per-doc hit count; the flag rejoins via a broadcast of
  that small hit table (AQE picks it from the measured size).
- grams reuse ``shingles_expr`` (pure Catalyst sequence/slice/concat_ws:
  whole-stage codegen, no Python), lowercased so casing differences
  don't hide contamination.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .jaccard import shingles_expr


def benchmark_grams(
    benchmark: DataFrame, text_col: str, n: int = 13, hash_grams: bool = True
) -> DataFrame:
    """Distinct lowercased word n-grams of the benchmark set — one column
    ``__gram__`` (string, or int64 when ``hash_grams``: xxhash64 shrinks
    the broadcast ~10x; a 2^-64 collision mis-flags one doc, acceptable
    for a hygiene filter and avoidable with hash_grams=False)."""
    g = benchmark.select(
        F.explode(shingles_expr(F.lower(F.col(text_col)), n)).alias("__gram__")
    )
    if hash_grams:
        g = g.select(F.xxhash64("__gram__").alias("__gram__"))
    return g.distinct()


def contamination_hits(
    corpus: DataFrame,
    benchmark: DataFrame,
    text_col: str,
    id_col: str,
    bench_text_col: str | None = None,
    n: int = 13,
    hash_grams: bool = True,
) -> DataFrame:
    """(id_col, n_contaminated_grams) for every corpus doc that shares at
    least one n-gram with the benchmark — the witness table."""
    bg = benchmark_grams(benchmark, bench_text_col or text_col, n, hash_grams)
    grams = corpus.select(
        F.col(id_col),
        F.explode(shingles_expr(F.lower(F.col(text_col)), n)).alias("__gram__"),
    )
    if hash_grams:
        grams = grams.select(id_col, F.xxhash64("__gram__").alias("__gram__"))
    # shingles_expr emits DISTINCT grams per doc and bg is distinct, so the
    # join multiplicity is 1 and count(*) == distinct contaminated grams
    return (
        grams.join(F.broadcast(bg), "__gram__")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).cast("int").alias("n_contaminated_grams"))
    )


def decontaminate(
    corpus: DataFrame,
    benchmark: DataFrame,
    text_col: str,
    id_col: str,
    bench_text_col: str | None = None,
    n: int = 13,
    hash_grams: bool = True,
) -> DataFrame:
    """Corpus with two added columns: ``contaminated`` (shares >=1 word
    n-gram with the benchmark) and ``n_contaminated_grams`` (distinct
    shared grams, 0 when clean). Filter ``~contaminated`` for the clean
    training split; keep the flag column for lineage/metrics instead."""
    hits = contamination_hits(
        corpus, benchmark, text_col, id_col, bench_text_col, n, hash_grams
    )
    return (
        corpus.join(hits, id_col, "left")
        .withColumn(
            "n_contaminated_grams",
            F.coalesce(F.col("n_contaminated_grams"), F.lit(0)).cast("int"),
        )
        .withColumn("contaminated", F.col("n_contaminated_grams") > 0)
    )
