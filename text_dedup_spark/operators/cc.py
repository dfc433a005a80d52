"""Connected components: alternating large-star / small-star, as iterative
DataFrame self-joins.

Algorithm: "Connected Components in MapReduce and Beyond" (Kiveris et al.),
the same one the reference implements over RDD groupByKey
(minhash_spark.py:31-55,372-379). Differences, all scale-motivated:

- groupByKey + Python reduce lambdas -> groupBy().agg(min) + join back:
  partial (map-side) aggregation for the min, Catalyst-planned joins.
- per-iteration ``localCheckpoint(eager=True)`` truncates the growing lineage
  (the reference instead leaks .cache() chains and manually gc.collect()s,
  loadHashAndDedup.py:219-221,291-293).
- convergence via a multiset fingerprint (count + sum(xxhash64(u, v)))
  computed executor-side, instead of ``a.subtract(b).union(b.subtract(a))
  .collect()`` (minhash_spark.py:377) which materializes the symmetric
  difference on the driver every iteration.

Output invariant (must hold for dedup semantics, SURVEY §2.5 C6): rows are
(id, component=min id of cluster) and cluster roots NEVER appear as ids —
so a left-anti join of the corpus against this table keeps exactly one
representative (the min id) per cluster.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .ids import ID


def _fingerprints2(a: DataFrame, b: DataFrame) -> tuple:
    """Multiset fingerprints of two edge frames in ONE Spark job (tagged
    union + grouped agg). Each term is count + two independent modded hash
    sums; mods keep terms ~1e6 so the long sums cannot overflow before
    ~1e12 edges even under ANSI arithmetic."""
    h = F.xxhash64("u", "v")
    tagged = a.select("u", "v", F.lit(0).alias("__t__")).unionAll(
        b.select("u", "v", F.lit(1).alias("__t__"))
    )
    rows = (
        tagged.groupBy("__t__")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.pmod(h, F.lit(1_000_003))).alias("s1"),
            F.sum(F.pmod(h, F.lit(999_983))).alias("s2"),
        )
        .collect()
    )
    by_tag = {r["__t__"]: (r["n"], r["s1"], r["s2"]) for r in rows}
    empty = (0, None, None)
    return by_tag.get(0, empty), by_tag.get(1, empty)


def _large_star(edges: DataFrame) -> DataFrame:
    """b = large-star(a): emit (neighbor, min(N(u) ∪ {u})) for neighbors > u."""
    directed = edges.select("u", "v").unionAll(
        edges.select(F.col("v").alias("u"), F.col("u").alias("v"))
    )
    mins = directed.groupBy("u").agg(F.min("v").alias("__mn__"))
    mins = mins.select("u", F.least("__mn__", F.col("u")).alias("__m__"))
    return (
        directed.join(mins, "u")
        .where(F.col("v") > F.col("u"))
        .select(F.col("v").alias("u"), F.col("__m__").alias("v"))
        .dropDuplicates(["u", "v"])
    )


def _small_star(edges: DataFrame) -> DataFrame:
    """a = small-star(b): orient to (max, min), emit (n, min) for n != min."""
    directed = edges.select(
        F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v")
    )
    mins = directed.groupBy("u").agg(F.min("v").alias("__m__"))
    from_neighbors = (
        directed.join(mins, "u")
        .where(F.col("v") != F.col("__m__"))
        .select(F.col("v").alias("u"), F.col("__m__").alias("v"))
    )
    from_centers = mins.where(F.col("u") != F.col("__m__")).select(
        "u", F.col("__m__").alias("v")
    )
    return from_neighbors.unionAll(from_centers).dropDuplicates(["u", "v"])


def connected_components(
    edges: DataFrame, id_col: str = ID, max_iterations: int = 64
) -> DataFrame:
    """edges(src, dst) -> assignments(id_col, component), roots absent.

    Empty edge input returns an empty assignment frame (minhash_spark.py:382
    'No components found').
    """
    spark = edges.sparkSession
    a = edges.select(F.col("src").alias("u"), F.col("dst").alias("v"))
    a = a.localCheckpoint(eager=True)

    for _ in range(max_iterations):
        # LAZY checkpoints: the fingerprint action below materializes
        # large-star, small-star, AND the convergence check in ONE job per
        # iteration (vs three with eager checkpoints) — the CC loop is the
        # serial section of the whole pipeline, so job-count is its cost.
        # Lineage still truncates at the checkpoint once materialized.
        b = _large_star(a).localCheckpoint(eager=False)
        new_a = _small_star(b).localCheckpoint(eager=False)
        old_a = a
        a = new_a
        fp_a, fp_b = _fingerprints2(a, b)
        old_a.unpersist()
        b.unpersist()
        # reference loop stops when small-star output == large-star output as
        # sets (minhash_spark.py:374-379); multiset fingerprints of the two
        # deduped frames agree iff (w.h.p.) the sets agree
        if fp_a == fp_b:
            break
    else:
        raise RuntimeError(f"connected_components did not converge in {max_iterations} iterations")

    return a.select(F.col("u").alias(id_col), F.col("v").alias("component"))
