"""Id assignment.

The reference needs a *dense, global, cross-job-consecutive* id and builds it
with ``row_number().over(Window.orderBy("__id__"))`` — a single-partition
global sort the author themselves flags ("TODO: do this with partition",
minhash_spark_onlyHash.py:334-338). At 10^12 rows that window is a
non-starter.

``assign_dense_ids`` gets the same dense result scalably in two passes:
per-partition counts (one tiny job) -> cumulative offsets broadcast ->
``spark_partition_id``-indexed offset + intra-partition row_number. Shuffle-
free on the data path.

``assign_unique_ids`` is the cheap non-dense variant
(monotonically_increasing_id, minhash_spark.py:343): sufficient whenever
only *uniqueness within the job* matters (cluster semantics only need a
total order, SURVEY §1.1). Prefer it; use dense ids when checkpointing
across jobs (PREV_ID replacement, onlyHash.py:307-309).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

ID = "__id__"


def assign_unique_ids(df: DataFrame, id_col: str = ID) -> DataFrame:
    return df.withColumn(id_col, F.monotonically_increasing_id())


def assign_dense_ids(df: DataFrame, id_col: str = ID, start: int = 0) -> DataFrame:
    """Dense consecutive int64 ids [start, start+count) without a global sort.

    Row order follows (partition, intra-partition order) — deterministic for
    a deterministic input layout, exactly like the reference's
    monotonically_increasing_id base order.
    """
    pid = "__pid__"
    with_pid = df.withColumn(pid, F.spark_partition_id())
    counts = with_pid.groupBy(pid).count().collect()  # tiny: one row/partition
    offsets = []
    acc = start
    for row in sorted(counts, key=lambda r: r[pid]):
        offsets.append((row[pid], acc))
        acc += row["count"]
    # broadcast-joined offset table (NOT a create_map literal: at 10^5+
    # partitions a literal map bloats the plan tree; a broadcast join stays
    # O(1) in plan size)
    offsets_df = df.sparkSession.createDataFrame(
        offsets, f"{pid} int, __offset__ long"
    )
    w = Window.partitionBy(pid).orderBy(F.monotonically_increasing_id())
    return (
        with_pid.join(F.broadcast(offsets_df), pid)
        .withColumn(id_col, F.col("__offset__") + F.row_number().over(w) - 1)
        .drop(pid, "__offset__")
    )


def max_id(df: DataFrame, id_col: str = ID) -> int:
    """PREV_ID replacement (onlyHash.py:343): next job starts at max+1."""
    row = df.agg(F.max(id_col).alias("m")).collect()[0]
    return int(row["m"]) if row["m"] is not None else -1
