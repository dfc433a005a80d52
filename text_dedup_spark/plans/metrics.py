"""Per-stage metrics + per-partition lineage (north rule: "writes
per-partition lineage + metrics to Iceberg").

Replaces the reference's driver-side Timer logging (utils/timer.py:23-55)
and ad-hoc rdd.count() prints (loadHashAndDedup.py:284,305) with typed rows
appended to a catalog table, so multi-job runs are auditable.
"""

from __future__ import annotations

import time
from contextlib import contextmanager

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

METRICS_TABLE = "metrics"
LINEAGE_TABLE = "lineage"


class Timer:
    """Same surface as the reference Timer (utils/timer.py): a reusable
    context manager collecting named elapsed times."""

    def __init__(self) -> None:
        self.elapsed_times: dict[str, float] = {}

    @contextmanager
    def __call__(self, name: str):
        start = time.monotonic()
        try:
            yield
        finally:
            self.elapsed_times[name] = time.monotonic() - start


def log_metric(
    catalog,
    run_id: str,
    stage: str,
    dataset: str,
    rows_in: int,
    rows_out: int,
    wall_sec: float,
) -> None:
    spark: SparkSession = catalog.spark
    df = spark.createDataFrame(
        [(run_id, stage, dataset, rows_in, rows_out, float(wall_sec), time.time())],
        "run_id string, stage string, dataset string, rows_in long, rows_out long, wall_sec double, ts double",
    )
    catalog.append(df, METRICS_TABLE)


def log_partition_lineage(catalog, run_id: str, stage: str, df: DataFrame) -> None:
    """One row per physical partition: (partition, rows). Executor-side
    aggregation — never collects data rows to the driver."""
    lineage = (
        df.groupBy(F.spark_partition_id().alias("partition"))
        .count()
        .select(
            F.lit(run_id).alias("run_id"),
            F.lit(stage).alias("stage"),
            "partition",
            F.col("count").alias("rows"),
        )
    )
    catalog.append(lineage, LINEAGE_TABLE)
