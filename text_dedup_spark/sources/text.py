"""Raw-text / JSON / CSV ingestion — executor-side replacements for the
reference's driver-side readers.

The reference reads whole files with ``readlines()`` ON THE DRIVER and
splits them into '\\n\\n'-separated paragraphs before createDataFrame
(lines2passage, minhash_spark.py:246-269; onlyHash.py:236-263) — the reason
its production runs needed 400-1200 GB of DRIVER memory (RunFullSet.sh:128).

``read_paragraphs`` keeps the exact same per-file paragraph semantics but
entirely executor-side: ``spark.read.text(..., wholetext=True)`` yields one
row per file (the same per-file scope the reference processes), and the
paragraph split + blank-trim is a Catalyst explode. Parallelism is bounded
by file count — identical to the reference's loop, but with zero driver
memory; for few-huge-file corpora, repartition after the explode.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def read_paragraphs(
    spark: SparkSession,
    paths: str | list[str],
    text_col: str = "text",
    keep_file: bool = False,
) -> DataFrame:
    """One row per non-empty '\\n\\n'-separated paragraph across the input
    text files (lines2passage semantics: split on blank lines, drop
    whitespace-only blocks)."""
    if isinstance(paths, str):
        paths = [paths]
    files = spark.read.text(*paths, wholetext=True).select(
        F.input_file_name().alias("file"), F.col("value")
    )
    paras = files.select(
        "file",
        F.explode(F.split(F.col("value"), r"\n\s*\n")).alias(text_col),
    ).where(F.trim(F.col(text_col)) != "")
    return paras if keep_file else paras.drop("file")


def read_input(
    spark: SparkSession, path: str, fmt: str = "parquet", text_col: str = "text"
) -> DataFrame:
    """Format-dispatching reader for the CLI (reference scripts accept HF
    datasets / text / BigQuery, minhash_spark.py:326; here: parquet | json |
    csv | text | warc | iceberg — the warehouse-scan analog reads an
    Iceberg table location via the pure-Python format layer)."""
    if fmt == "parquet":
        return spark.read.parquet(path)
    if fmt == "iceberg":
        from .iceberg import NativeIcebergTable

        return NativeIcebergTable(spark, path).read()
    if fmt == "json":
        return spark.read.json(path)
    if fmt == "csv":
        return spark.read.option("header", "true").csv(path)
    if fmt == "text":
        return read_paragraphs(spark, path, text_col)
    if fmt == "warc":
        from .warc import read_warc

        df = read_warc(spark, path)
        return df if text_col == "text" else df.withColumnRenamed("text", text_col)
    raise ValueError(f"unknown input format {fmt!r}")
