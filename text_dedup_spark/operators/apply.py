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


def keep_survivors(df: DataFrame, assignments: DataFrame, id_col: str = ID) -> DataFrame:
    return split_survivors(df, assignments, id_col)[0]


def with_cluster(df: DataFrame, assignments: DataFrame, id_col: str = ID) -> DataFrame:
    """Annotate every row with its cluster id (self for representatives and
    singletons) instead of dropping duplicates — the 'cluster table' view."""
    a = assignments.withColumnRenamed("component", "__component__")
    return df.join(a, on=id_col, how="left").withColumn(
        "cluster", F.coalesce(F.col("__component__"), F.col(id_col))
    ).drop("__component__")
