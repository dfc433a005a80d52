"""Apply cluster assignments to the corpus: survivors / removed split.

The reference does ``df.join(components, "left")`` then filters
isNull/isNotNull (minhash_spark.py:391-392, onlyRemove.py:206-213 — the
latter with the `rm_df`-before-definition bug we do not replicate,
SURVEY §7.4). Expressed directly as left_anti (keep) / left_semi (audit):
one operator each, no null-sentinel column, and Catalyst can broadcast the
assignment side when it fits (autoBroadcastJoinThreshold / AQE decides;
the assignment table holds only duplicate ids, which is << corpus size).

Because cluster roots are absent from the assignment table (cc.py), the
left_anti join keeps exactly one representative (the min id) per cluster —
the reference's dedup semantics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .ids import ID


def split_survivors(
    df: DataFrame, assignments: DataFrame, id_col: str = ID, broadcast: bool = False
) -> tuple[DataFrame, DataFrame]:
    """Returns (kept, removed). ``broadcast=True`` hints the duplicate-id
    side — use when the corpus rows are wide (raw payload bytes) and the
    duplicate set is known to fit in executor memory, so the corpus never
    shuffles for the split."""
    dup_ids = assignments.select(id_col)
    if broadcast:
        dup_ids = F.broadcast(dup_ids)
    kept = df.join(dup_ids, on=id_col, how="left_anti")
    removed = df.join(dup_ids, on=id_col, how="left_semi")
    return kept, removed


def reassign_survivors(
    assignments: DataFrame,
    scores: DataFrame,
    id_col: str = ID,
    score_col: str = "score",
    descending: bool = True,
) -> DataFrame:
    """Rewrite a min-id assignment table so each cluster keeps its
    BEST-SCORING member instead of its smallest id — the curation policy a
    real pipeline wants ("keep the longest / highest-quality duplicate"),
    which the reference hard-codes away as min-id (minhash_spark.py
    component min). ``scores`` is (id_col, score_col[numeric]); ties break
    to the smallest id so results stay partitioning-independent.

    Returns the same roots-absent schema (id_col, component) where
    ``component`` is now the surviving member's id — drop-in for
    ``split_survivors``. Singleton docs never appear in ``assignments``
    and are unaffected.

    Scale shape: membership = assignments + their components (duplicates
    only, << corpus); one join to fetch scores (broadcast-able when the
    duplicate set is small, AQE decides), one groupBy(component) with a
    map-side-partial ``max_by`` — no corpus-wide shuffle."""
    members = (
        assignments.select(id_col, "component")
        .unionAll(
            assignments.select(
                F.col("component").alias(id_col), "component"
            )
        )
        .distinct()
    )
    sign = F.col(score_col) if descending else -F.col(score_col)
    scored = members.join(
        scores.select(id_col, score_col), id_col
    ).withColumn("__ord__", F.struct(sign.alias("s"), (-F.col(id_col)).alias("i")))
    survivors = scored.groupBy("component").agg(
        F.expr(f"max_by({id_col}, __ord__)").alias("__surv__")
    )
    return (
        members.join(survivors, "component")
        .where(F.col(id_col) != F.col("__surv__"))
        .select(id_col, F.col("__surv__").alias("component"))
    )


def dedup_report(
    df: DataFrame,
    assignments: DataFrame,
    id_col: str = ID,
    text_col: str | None = None,
) -> DataFrame:
    """One-row impact summary of a dedup run — the operational readout a
    pipeline owner checks before committing a removal: corpus size, rows
    removed (and the char share when ``text_col`` is given), cluster count
    and the largest cluster (a spike there means a degenerate key — e.g.
    boilerplate — not genuine duplication).

    Scale shape: one corpus aggregate (map-side partial) + one groupBy over
    the duplicates-only assignment table (<< corpus); no window, no
    collect beyond the single result row."""
    a = assignments.select(F.col(id_col), "component")
    sizes = a.groupBy("component").agg((F.count(F.lit(1)) + 1).alias("__sz__"))
    clusters = sizes.agg(
        F.count(F.lit(1)).alias("n_clusters"),
        F.coalesce(F.max("__sz__"), F.lit(0)).cast("long").alias("max_cluster_size"),
    )
    flagged = df.join(a.select(F.col(id_col), F.lit(1).alias("__rm__")), id_col, "left")
    aggs = [
        F.count(F.lit(1)).alias("n_docs"),
        F.coalesce(F.sum("__rm__"), F.lit(0)).cast("long").alias("n_removed"),
        F.round(
            F.coalesce(F.sum("__rm__"), F.lit(0)) / F.count(F.lit(1)), 6
        ).alias("removed_frac"),
    ]
    if text_col is not None:
        total = F.sum(F.length(F.col(text_col)))
        removed = F.sum(F.when(F.col("__rm__").isNotNull(), F.length(F.col(text_col))).otherwise(0))
        aggs.append(
            F.round(removed / F.greatest(total, F.lit(1)), 6).alias("removed_char_frac")
        )
    return flagged.agg(*aggs).crossJoin(clusters)


def keep_survivors(df: DataFrame, assignments: DataFrame, id_col: str = ID) -> DataFrame:
    return split_survivors(df, assignments, id_col)[0]


def with_cluster(df: DataFrame, assignments: DataFrame, id_col: str = ID) -> DataFrame:
    """Annotate every row with its cluster id (self for representatives and
    singletons) instead of dropping duplicates — the 'cluster table' view."""
    a = assignments.withColumnRenamed("component", "__component__")
    return df.join(a, on=id_col, how="left").withColumn(
        "cluster", F.coalesce(F.col("__component__"), F.col(id_col))
    ).drop("__component__")
