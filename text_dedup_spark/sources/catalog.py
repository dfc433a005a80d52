"""Checkpoint/table catalog.

The north rule targets Iceberg tables for inputs and checkpoints. The
sandbox has no Iceberg runtime jar, so the catalog abstraction ships with a
Parquet-directory implementation carrying the SAME contract Iceberg would
provide here (typed schema-on-write, atomic overwrite via _SUCCESS,
idempotent re-create). On a real cluster, ``IcebergCatalog`` is the same
four methods over ``spark.table`` / ``df.writeTo(tbl).createOrReplace()`` —
nothing else in the engine touches storage directly.

This kills the reference's base64-over-CSV checkpoint dance
(onlyHash.py:167,270-299; schemaless read-back + manual casts,
loadHashAndDedup.py:175-182): checkpoints keep real types end-to-end.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession


class ParquetCatalog:
    def __init__(self, spark: SparkSession, base: str):
        self.spark = spark
        self.base = base

    def path(self, name: str) -> str:
        return os.path.join(self.base, name)

    def write(self, df: DataFrame, name: str, partition_by: list[str] | None = None) -> None:
        w = df.write.mode("overwrite")
        if partition_by:
            w = w.partitionBy(*partition_by)
        w.parquet(self.path(name))

    def append(self, df: DataFrame, name: str) -> None:
        df.write.mode("append").parquet(self.path(name))

    def read(self, name: str) -> DataFrame:
        return self.spark.read.parquet(self.path(name))

    def read_many(self, names: list[str]) -> DataFrame:
        """Multi-path scan in ONE load (replaces the reference's driver loop
        of per-file RDD unions, loadHashAndDedup.py:273-281)."""
        return self.spark.read.parquet(*[self.path(n) for n in names])

    def exists(self, name: str) -> bool:
        return os.path.exists(os.path.join(self.path(name), "_SUCCESS"))


class IcebergCatalog:  # pragma: no cover - requires an Iceberg-enabled cluster
    """Same contract over an Iceberg catalog (spark.sql.catalog.<name>
    configured with iceberg-spark-runtime on the cluster classpath)."""

    def __init__(self, spark: SparkSession, namespace: str):
        self.spark = spark
        self.namespace = namespace

    def _tbl(self, name: str) -> str:
        return f"{self.namespace}.{name}"

    def write(self, df: DataFrame, name: str, partition_by: list[str] | None = None) -> None:
        w = df.writeTo(self._tbl(name))
        if partition_by:
            from pyspark.sql import functions as F

            w = w.partitionedBy(*[F.col(c) for c in partition_by])
        w.createOrReplace()

    def append(self, df: DataFrame, name: str) -> None:
        df.writeTo(self._tbl(name)).append()

    def read(self, name: str) -> DataFrame:
        return self.spark.table(self._tbl(name))

    def read_many(self, names: list[str]) -> DataFrame:
        from functools import reduce

        return reduce(DataFrame.unionByName, [self.read(n) for n in names])

    def exists(self, name: str) -> bool:
        return self.spark.catalog.tableExists(self._tbl(name))
