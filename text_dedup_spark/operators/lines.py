"""Corpus-wide line-level dedup (CCNet-style paragraph/line hash dedup,
Wenzek et al. 2020; the C4 boilerplate-line strip): every normalized line
that occurs more than once ACROSS THE WHOLE CORPUS is kept only at its
globally-first occurrence and dropped everywhere else — the cheap upstream
complement to the suffix-array substring pass (which catches partial-line
overlap this operator cannot).

Semantics (deterministic, engine/oracle-restatable):

- lines = '\\n'-split; the dedup key is ``trim(lower(line))``; the ORIGINAL
  line text is what survives into the rebuilt document.
- whitespace-only lines are structural — always kept, never counted.
- "first occurrence" = minimum (doc_id, pos) over the whole corpus, so the
  result is independent of partitioning and execution order (CCNet keeps
  an arbitrary shard-order first; a distributed engine needs a total
  order to be reproducible).
- output: one row per input doc — rebuilt ``text`` (kept lines joined in
  original order) + ``n_lines_removed`` witness count.

Scale shape:

- occurrence stats are a groupBy on the line key with a map-side partial
  ``min(struct(doc_id, pos))`` — a billion-document boilerplate footer
  ("all rights reserved") pre-aggregates to one row per task BEFORE the
  shuffle, so hot keys cost map work, not reducer memory (same reason the
  LSH bucket-min uses groupBy+join-back instead of a window: a window's
  sort shuffles every raw occurrence to one reducer).
- the join back is 1 stats row per key against the lines (AQE splits any
  residual skew); doc rebuild shuffles by doc_id with per-task memory
  bounded by one document.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def line_occurrence_stats(
    df: DataFrame, text_col: str, id_col: str
) -> DataFrame:
    """(line_key, n_docs, n_occurrences, first_doc, first_pos) per distinct
    normalized non-blank line — the corpus-wide line frequency table
    (useful on its own as a boilerplate report)."""
    lines = df.select(
        F.col(id_col).alias("__doc__"),
        F.posexplode(F.split(F.col(text_col), "\n")).alias("__pos__", "__line__"),
    ).withColumn("__key__", F.trim(F.lower(F.col("__line__"))))
    return (
        lines.where(F.col("__key__") != "")
        .groupBy("__key__")
        .agg(
            F.countDistinct("__doc__").alias("n_docs"),
            F.count(F.lit(1)).alias("n_occurrences"),
            F.min(F.struct("__doc__", "__pos__")).alias("__first__"),
        )
        .select(
            F.col("__key__").alias("line_key"),
            "n_docs",
            "n_occurrences",
            F.col("__first__.__doc__").alias("first_doc"),
            F.col("__first__.__pos__").alias("first_pos"),
        )
    )


def dedup_lines(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Rebuild every document with corpus-wide duplicate lines removed
    (keep = globally-first occurrence by (doc_id, pos)); adds
    ``n_lines_removed``. Docs whose every line is removed come back as
    empty strings (filter downstream with the usual empty-doc pass)."""
    lines = df.select(
        F.col(id_col).alias("__doc__"),
        F.posexplode(F.split(F.col(text_col), "\n")).alias("__pos__", "__line__"),
    ).withColumn("__key__", F.trim(F.lower(F.col("__line__"))))
    firsts = (
        lines.where(F.col("__key__") != "")
        .groupBy("__key__")
        .agg(F.min(F.struct("__doc__", "__pos__")).alias("__first__"))
    )
    kept = (
        lines.join(firsts, "__key__", "left")
        .withColumn(
            "__keep__",
            (F.col("__key__") == "")
            | (
                (F.col("__first__.__doc__") == F.col("__doc__"))
                & (F.col("__first__.__pos__") == F.col("__pos__"))
            ),
        )
    )
    rebuilt = kept.groupBy("__doc__").agg(
        F.concat_ws(
            "\n",
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.when(F.col("__keep__"), F.struct("__pos__", "__line__"))
                    )
                ),
                lambda s: s["__line__"],
            ),
        ).alias(text_col),
        F.sum(F.when(F.col("__keep__"), 0).otherwise(1)).cast("int").alias(
            "n_lines_removed"
        ),
    )
    return rebuilt.select(
        F.col("__doc__").alias(id_col), text_col, "n_lines_removed"
    )
