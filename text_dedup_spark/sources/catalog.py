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

import json
import os
import re

from pyspark.sql import DataFrame, SparkSession

_BUCKET_SPEC = "_bucket_spec.json"


class ParquetCatalog:
    def __init__(self, spark: SparkSession, base: str):
        self.spark = spark
        self.base = base

    def path(self, name: str) -> str:
        return os.path.join(self.base, name)

    def _table(self, name: str) -> str:
        """Session-catalog identifier for a bucketed checkpoint. Namespaced
        by a hash of the base dir so two catalogs in one SparkSession (e.g.
        parallel tests) never collide on checkpoint names."""
        import hashlib

        ns = hashlib.sha1(os.path.abspath(self.base).encode()).hexdigest()[:8]
        return f"`ckpt_{ns}_{re.sub(r'[^A-Za-z0-9_]', '_', name)}`"

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

    # -- bucketed checkpoints -------------------------------------------
    #
    # A checkpoint that later stages JOIN or GROUP BY on a known key (the
    # id-stamped corpus and the cluster table, both keyed by id) can be
    # written hash-bucketed on that key. Every same-key join/agg over two
    # such checkpoints with equal bucket counts is then EXCHANGE-FREE: at
    # 100 TB the wide corpus (payload bytes) never crosses the network for
    # the survivor split, even when the duplicate set is too large to
    # broadcast. The reference re-shuffles the full corpus on every
    # onlyRemove run (minhash_spark_onlyRemove.py joins the raw frame each
    # time); bucketing pays that shuffle once, at write.

    def write_bucketed(
        self, df: DataFrame, name: str, keys: list[str] | str, n_buckets: int = 32
    ) -> None:
        """Bucketed + per-file-sorted checkpoint. Files live under the
        catalog dir (external table) so data survives the session; the
        bucket spec is mirrored to a sidecar JSON so ``read_bucketed`` can
        re-register the table in a FRESH session's metastore (resume)."""
        keys = [keys] if isinstance(keys, str) else list(keys)
        tbl = self._table(name)
        self.spark.sql(f"DROP TABLE IF EXISTS {tbl}")
        (
            df.write.mode("overwrite")
            .option("path", self.path(name))
            .bucketBy(n_buckets, *keys)
            .sortBy(*keys)
            .format("parquet")
            .saveAsTable(tbl)
        )
        with open(os.path.join(self.path(name), _BUCKET_SPEC), "w") as f:
            json.dump({"keys": keys, "n_buckets": n_buckets}, f)

    def read_bucketed(self, name: str) -> DataFrame:
        """Read a bucketed checkpoint THROUGH the table catalog (a plain
        ``spark.read.parquet`` would drop the bucketing metadata and give
        back a shuffling plan). Re-registers from the sidecar spec when the
        metastore doesn't know the table — i.e. on resume in a new session."""
        tbl = self._table(name)
        if not self.spark.catalog.tableExists(tbl.strip("`")):
            with open(os.path.join(self.path(name), _BUCKET_SPEC)) as f:
                spec = json.load(f)
            schema_ddl = self.spark.read.parquet(self.path(name)).schema.toDDL()
            cols = ", ".join(f"`{k}`" for k in spec["keys"])
            self.spark.sql(
                f"CREATE TABLE {tbl} ({schema_ddl}) USING parquet "
                f"CLUSTERED BY ({cols}) SORTED BY ({cols}) "
                f"INTO {spec['n_buckets']} BUCKETS LOCATION '{self.path(name)}'"
            )
        return self.spark.table(tbl)

    def is_bucketed(self, name: str) -> bool:
        return self.exists(name) and os.path.exists(
            os.path.join(self.path(name), _BUCKET_SPEC)
        )


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

    def write_bucketed(
        self, df: DataFrame, name: str, keys: list[str] | str, n_buckets: int = 32
    ) -> None:
        """Iceberg's native analog: a bucket(N, col) partition transform —
        the same co-location contract, tracked in table metadata so any
        engine reading the table sees it (storage-partitioned joins)."""
        from pyspark.sql import functions as F

        keys = [keys] if isinstance(keys, str) else list(keys)
        df.writeTo(self._tbl(name)).partitionedBy(
            *[F.bucket(n_buckets, F.col(k)) for k in keys]
        ).createOrReplace()

    def read_bucketed(self, name: str) -> DataFrame:
        return self.spark.table(self._tbl(name))

    def is_bucketed(self, name: str) -> bool:
        return self.exists(name)
