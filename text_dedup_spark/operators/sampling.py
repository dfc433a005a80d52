"""Token-budget corpus sampling: "take ~N tokens per language" — the
curation step that follows dedup/quality filtering when assembling a
training mix. Documents are taken in ascending id order per group while
the cumulative token count (inclusive) stays within the budget, so the
selection is deterministic and partitioning-independent.

Scale shape — the naive formulation is a running sum
``sum() OVER (PARTITION BY lang ORDER BY id)``, which shuffles every row
of a group to ONE reducer task (a 10^11-doc language = one task). This
implementation is a two-level distributed prefix sum instead:

1. docs are bucketed by ``id div bucket_size``; per-(group, bucket) token
   sums aggregate map-side — one small stats frame, corpus/bucket_size
   rows.
2. the running sum ACROSS buckets is a window over that small frame
   (per-group rows bounded by construction, not by corpus size).
3. the running sum WITHIN a bucket is a window whose partition is one
   bucket — at most ``bucket_size`` ids per task, a constant.

Total: one map-side-combined aggregation + one bounded window + one join
back. No task ever sees more than ``bucket_size`` rows or
``corpus/bucket_size`` stats rows, whichever path it is on.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .textstats import token_count_expr


def sample_token_budget(
    df: DataFrame,
    text_col: str,
    id_col: str,
    budget: int,
    group_col: str = "lang",
    bucket_size: int = 1 << 20,
) -> DataFrame:
    """Rows of ``df`` (plus ``n_tokens`` / ``cum_tokens``) whose inclusive
    running token total — ascending ``id_col`` within each ``group_col``
    value — is <= ``budget``. The first doc that would cross the budget is
    EXCLUDED (strict cap, no overshoot)."""
    toks = df.withColumn("n_tokens", token_count_expr(F.col(text_col))).withColumn(
        "__bucket__", F.floor(F.col(id_col) / F.lit(bucket_size))
    )
    bstats = toks.groupBy(group_col, "__bucket__").agg(
        F.sum("n_tokens").alias("__bt__")
    )
    wb = (
        Window.partitionBy(group_col)
        .orderBy("__bucket__")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    prefixes = bstats.withColumn(
        "__before__", F.sum("__bt__").over(wb) - F.col("__bt__")
    ).select(group_col, "__bucket__", "__before__")
    # buckets whose preceding total already exceeds the budget can be
    # pruned before the per-doc window — at scale this drops almost the
    # whole corpus from the expensive path
    wd = (
        Window.partitionBy(group_col, "__bucket__")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        toks.join(prefixes.where(F.col("__before__") < budget),
                  [group_col, "__bucket__"])
        .withColumn(
            "cum_tokens", (F.col("__before__") + F.sum("n_tokens").over(wd)).cast("long")
        )
        .where(F.col("cum_tokens") <= budget)
        .drop("__bucket__", "__before__")
    )
