"""SparkSession factory with the scale-oriented defaults this engine assumes.

Every knob here is a plain public Spark conf. On a real cluster the same
settings apply (with shuffle.partitions sized to ~2-3x total cores and
maxPartitionBytes tuned to executor memory); `local[N]` is only the test
stand-in mandated by the sandbox.

Why each setting (SURVEY.md §4):
- AQE on + coalescePartitions: runtime re-plan replaces the reference's
  hand-tuned ``repartition(num_perm * 2)`` (minhash_spark.py:347).
- AQE skewJoin: splits hot LSH-bucket partitions in the edge join — the
  reference has NO skew handling (SURVEY §4 row 4) and a degenerate bucket
  (all short docs share the all-MAX_HASH signature) stalls a task forever.
- Arrow enabled: all Python kernels run as Arrow-batched pandas UDFs, never
  per-row Python (north rule).
- BLAS threads pinned to 1: each of N Python workers would otherwise spawn
  one OpenBLAS thread PER CORE for every numpy matmul (N x cores threads
  total) — measured 2x slowdown at local[32] vs local[8] from exactly this.
  Spark owns the parallelism; kernels must be single-threaded.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def build_session(
    master: str | None = None,
    app_name: str = "text-dedup-spark",
    shuffle_partitions: int | None = None,
    extra_conf: dict | None = None,
) -> SparkSession:
    # one BLAS/OMP thread per worker: Spark supplies the parallelism
    for var in ("OMP_NUM_THREADS", "OPENBLAS_NUM_THREADS", "MKL_NUM_THREADS",
                "VECLIB_MAXIMUM_THREADS", "NUMEXPR_NUM_THREADS"):
        os.environ.setdefault(var, "1")

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    master = master or f"local[{cpus}]"
    if shuffle_partitions is None:
        # ~1x parallelism locally; on a cluster, 2-3x total executor cores
        n = master.removeprefix("local[").removesuffix("]")
        shuffle_partitions = cpus if not n.isdigit() else int(n)

    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # off: (a) Spark 4.1's UnionBase.rewriteConstraints throws
        # NoSuchElementException planning unions whose children share
        # lineage (our 3-modality edge union); (b) constraint propagation
        # is quadratic in plan size — a known cost on large iterative
        # plans like the CC loop. We lose only inferred IsNotNull pushdowns.
        .config("spark.sql.constraintPropagation.enabled", "false")
        # real-cluster path for the same BLAS pinning (local mode inherits
        # the os.environ set above through the gateway JVM)
        .config("spark.executorEnv.OMP_NUM_THREADS", "1")
        .config("spark.executorEnv.OPENBLAS_NUM_THREADS", "1")
        .config("spark.executorEnv.MKL_NUM_THREADS", "1")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
