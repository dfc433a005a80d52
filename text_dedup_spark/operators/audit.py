"""Cluster-quality audit: true-Jaccard statistics over produced clusters.

Reference parity: utils/analysis.py:23-47 — after a dedup run, sample
cluster members and compute true 8-gram Jaccard against the representative
to quantify LSH false positives. The reference runs it as a driver-side
loop over a HF dataset; here it is a join + Catalyst shingle expressions,
fully distributed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .jaccard import jaccard_expr, shingles_expr


def audit_false_positives(
    corpus: DataFrame,
    assignments: DataFrame,
    text_col: str,
    id_col: str,
    n: int = 8,
    threshold: float = 0.7,
) -> DataFrame:
    """Per-cluster-member true n-gram Jaccard vs the representative.

    Returns (id, component, jaccard, is_false_positive) — a member whose
    true similarity to its representative is below ``threshold`` counts as
    an LSH false positive (utils/analysis.py uses 8-grams and reports the
    below-threshold share). Aggregate with ``audit_summary``.
    """
    sh = corpus.select(
        F.col(id_col), shingles_expr(F.col(text_col), n).alias("__sh__")
    )
    member = assignments.join(sh, id_col).withColumnRenamed("__sh__", "__sh_m__")
    rep = sh.select(
        F.col(id_col).alias("component"), F.col("__sh__").alias("__sh_r__")
    )
    return (
        member.join(rep, "component")
        .select(
            id_col,
            "component",
            F.round(jaccard_expr(F.col("__sh_m__"), F.col("__sh_r__")), 6).alias("jaccard"),
        )
        .withColumn("is_false_positive", F.col("jaccard") < threshold)
    )


def audit_summary(audited: DataFrame) -> DataFrame:
    """(n_members, n_false_positive, fp_rate, avg_jaccard, min_jaccard)."""
    return audited.agg(
        F.count(F.lit(1)).alias("n_members"),
        F.sum(F.col("is_false_positive").cast("long")).alias("n_false_positive"),
        F.round(F.avg(F.col("is_false_positive").cast("double")), 6).alias("fp_rate"),
        F.round(F.avg("jaccard"), 6).alias("avg_jaccard"),
        F.min("jaccard").alias("min_jaccard"),
    )
