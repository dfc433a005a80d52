"""True n-gram Jaccard: Catalyst shingle expressions + pair verification.

The reference uses true Jaccard only as an offline false-positive audit
(utils/analysis.py:16-47). Here it is a first-class operator:
- ``shingles_expr``: word n-gram set as a Catalyst expression (sequence +
  slice + concat_ws — no Python), same tokenizer/shingling as the MinHash
  kernel (spark-script behavior: short docs -> empty set).
- ``verify_pairs``: annotate candidate edges with exact Jaccard and filter —
  composes with LSH candidates for a verified-MinHash mode that eliminates
  LSH false positives at the cost of one extra join.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .textstats import tokens_expr


def shingles_expr(col: Column, n: int) -> Column:
    """array<string> of distinct space-joined word n-grams (empty when the
    document has fewer than n tokens — minhash_spark.py:58-85 semantics)."""
    toks = tokens_expr(col)
    count = F.size(toks) - F.lit(n - 1)
    grams = F.when(count > 0, F.transform(
        F.sequence(F.lit(1), count),
        lambda i: F.concat_ws(" ", F.slice(toks, i, n)),
    )).otherwise(F.array().cast("array<string>"))
    return F.array_distinct(grams)


def jaccard_expr(a: Column, b: Column) -> Column:
    """Jaccard of two string-array columns (0.0 when both empty)."""
    inter = F.size(F.array_intersect(a, b))
    union = F.size(F.array_union(a, b))
    return F.when(union > 0, inter.cast("double") / union).otherwise(F.lit(0.0))


def verify_pairs(
    corpus: DataFrame,
    edges: DataFrame,
    text_col: str,
    n: int,
    threshold: float,
    id_col: str = "__id__",
) -> DataFrame:
    """Filter (src, dst) candidate edges by true n-gram Jaccard >= threshold.

    Shingle sets are computed ONCE per document (projection before the
    joins), not per pair."""
    sh = corpus.select(
        F.col(id_col), shingles_expr(F.col(text_col), n).alias("__sh__")
    )
    return (
        edges.join(sh.withColumnRenamed("__sh__", "__sh_src__"), edges.src == sh[id_col])
        .drop(id_col)
        .join(
            sh.withColumnRenamed("__sh__", "__sh_dst__").withColumnRenamed(id_col, "__dst_id__"),
            F.col("dst") == F.col("__dst_id__"),
        )
        .select(
            "src",
            "dst",
            F.round(jaccard_expr(F.col("__sh_src__"), F.col("__sh_dst__")), 6).alias("jaccard"),
        )
        .where(F.col("jaccard") >= threshold)
    )


def jaccard_dedup_edges(
    corpus: DataFrame,
    text_col: str,
    n: int,
    threshold: float,
    cfg=None,
    id_col: str = "__id__",
) -> DataFrame:
    """LSH candidates verified by exact Jaccard (verified-MinHash mode)."""
    from ..config import MinHashConfig
    from .lsh import minhash_edges

    cfg = (cfg or MinHashConfig(ngram_size=n, threshold=threshold)).resolve()
    candidates = minhash_edges(corpus, text_col, cfg, id_col)
    return verify_pairs(corpus, candidates, text_col, n, threshold, id_col)
