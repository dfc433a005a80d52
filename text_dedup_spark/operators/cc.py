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


def _is_star(a: DataFrame) -> bool:
    """True iff no dst of ``a`` also appears as a src — i.e. every edge
    points directly at a root. Run only when the a==b fingerprint check
    fires, so it costs one tiny job per CC call, not per iteration."""
    return (
        a.select("v")
        .distinct()
        .join(a.select(F.col("u").alias("v")).distinct(), "v")
        .isEmpty()
    )


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


# introspection for tests/bench: filled by every connected_components call
LAST_RUN_STATS: dict = {"iterations": 0, "pre_contract_rounds": 0}


def _pre_contract(a: DataFrame, rounds: int) -> tuple[DataFrame, DataFrame | None]:
    """Contract each node to min(N(u) ∪ {u}) for ``rounds`` passes.

    Returns (contracted_edges, mapping) where mapping(orig, label) covers
    every node of the ORIGINAL graph. Contraction preserves components
    (u is connected to its label, which is a neighbor or itself), and the
    global min m of a cluster always maps to itself (all its neighbors are
    larger), so component ids are unchanged. LSH star edges (member ->
    bucket-min) mostly collapse to their cluster min in one pass, so the
    serial large/small-star loop then runs on a graph that is typically
    orders of magnitude smaller — it replaces the loop's first (and most
    expensive) iterations, not its correctness."""
    mapping: DataFrame | None = None
    for _ in range(rounds):
        directed = a.select("u", "v").unionAll(
            a.select(F.col("v").alias("u"), F.col("u").alias("v"))
        )
        labels = (
            directed.groupBy("u")
            .agg(F.min("v").alias("__mn__"))
            .select("u", F.least("__mn__", F.col("u")).alias("__l__"))
        )
        lu = labels.select(F.col("u"), F.col("__l__").alias("__lu__"))
        lv = labels.select(F.col("u").alias("v"), F.col("__l__").alias("__lv__"))
        a = (
            a.join(lu, "u")
            .join(lv, "v")
            .where(F.col("__lu__") != F.col("__lv__"))
            .select(
                F.least("__lu__", "__lv__").alias("u"),
                F.greatest("__lu__", "__lv__").alias("v"),
            )
            .dropDuplicates(["u", "v"])
            .localCheckpoint(eager=False)
        )
        step = labels.select(F.col("u").alias("orig"), F.col("__l__").alias("label"))
        if mapping is None:
            mapping = step
        else:
            # compose: relabel the previous round's labels through this
            # round's mapping (nodes absent from the contracted graph keep
            # their label — they were already fully contracted)
            nxt = step.select(F.col("orig").alias("label"), F.col("label").alias("__nl__"))
            mapping = mapping.join(nxt, "label", "left").select(
                "orig", F.coalesce("__nl__", "label").alias("label")
            )
        mapping = mapping.localCheckpoint(eager=False)
    return a, mapping


def connected_components(
    edges: DataFrame,
    id_col: str = ID,
    max_iterations: int = 64,
    pre_contract: int = 0,
) -> DataFrame:
    """edges(src, dst) -> assignments(id_col, component), roots absent.

    ``pre_contract``: rounds of hash-to-min contraction before the
    large/small-star loop (0 = reference-shaped loop only). Output is
    identical either way. Measured guidance: LSH star edges from a typical
    dedup corpus converge in ONE loop iteration already (bench corpus:
    iterations=1), where contraction is pure added latency — hence default
    0; on deeper graphs (bridged clusters, chains: overlapping buckets at
    web scale) each round cuts ~1 serial iteration and shrinks the frames
    the loop shuffles (tests/test_minhash_pipeline.py measures 3 -> 2 and
    4 -> 3), so set 1-2 when cluster diameters are expected to be large.

    Empty edge input returns an empty assignment frame (minhash_spark.py:382
    'No components found').
    """
    a = edges.select(F.col("src").alias("u"), F.col("dst").alias("v"))
    mapping: DataFrame | None = None
    if pre_contract > 0:
        a, mapping = _pre_contract(a, pre_contract)
    a = a.localCheckpoint(eager=True)
    LAST_RUN_STATS["pre_contract_rounds"] = pre_contract

    # Convergence: a == b (the reference's rule, minhash_spark.py:377-379)
    # AND a is star-shaped. The reference's rule ALONE halts chain-shaped
    # graphs (A<-B<-C<-...: each node min-of-bucket for the next) at a
    # PARENT-POINTER state where `component` is a smaller non-root member,
    # not the cluster min — its survivors are still correct (every non-root
    # appears as a key) but its assignments diverge from its own
    # single-node UnionFind (utils/union_find.py:7-28). A star-shaped a==b
    # state IS the per-cluster-min assignment (edges (n, r) with r no
    # one's child and r < n, and the maps preserve connectivity), so this
    # engine guarantees component == cluster-min on every graph shape; the
    # star probe is one tiny job run only when a == b fires.
    iterations = 0
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
        iterations += 1
        # multiset fingerprints of the deduped frames agree iff (w.h.p.)
        # the sets agree; see the star-shape note above
        if fp_a == fp_b and _is_star(a):
            break
    else:
        raise RuntimeError(f"connected_components did not converge in {max_iterations} iterations")
    LAST_RUN_STATS["iterations"] = iterations

    assigns = a.select(F.col("u").alias(id_col), F.col("v").alias("component"))
    if mapping is None:
        return assigns
    # compose the contraction mapping back over ALL original nodes:
    # comp(orig) = comp_contracted(label) if the label was further merged,
    # else the label itself; the cluster min maps to itself and is never a
    # key of the inner result, so the roots-absent invariant carries over
    comp = assigns.select(F.col(id_col).alias("label"), "component")
    return (
        mapping.join(comp, "label", "left")
        .select(
            F.col("orig").alias(id_col),
            F.coalesce("component", "label").alias("component"),
        )
        .where(F.col(id_col) != F.col("component"))
    )
