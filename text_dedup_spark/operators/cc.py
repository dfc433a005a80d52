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
- convergence via a per-iteration STAR PROBE (one tiny semi-join job)
  instead of ``a.subtract(b).union(b.subtract(a)).collect()``
  (minhash_spark.py:377) which materializes the symmetric difference on
  the driver every iteration. A star-shaped state is a fixpoint of both
  maps AND is the per-cluster-min assignment (proof at the loop), so the
  probe both detects convergence one iteration EARLIER than the
  reference's a==b rule (no confirmation pass over an already-converged
  graph) and removes the per-iteration fingerprint scan of a ∪ b.

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
    points directly at a root. Expressed as explode + one aggregation
    (2 stages) rather than a self-semi-join (4 stages + join planning):
    a node violates star-shape iff it occurs both as src and as dst."""
    both = (
        a.select(
            F.explode(
                F.array(
                    F.struct(F.col("u").alias("n"), F.lit(1).alias("s"), F.lit(0).alias("d")),
                    F.struct(F.col("v").alias("n"), F.lit(0).alias("s"), F.lit(1).alias("d")),
                )
            ).alias("x")
        )
        .select("x.n", "x.s", "x.d")
        .groupBy("n")
        .agg(F.max("s").alias("s"), F.max("d").alias("d"))
        .where((F.col("s") == 1) & (F.col("d") == 1))
    )
    return both.isEmpty()


def _large_star(edges: DataFrame) -> DataFrame:
    """b = large-star(a): emit (neighbor, min(N(u) ∪ {u})) for neighbors > u."""
    directed = edges.select("u", "v").unionAll(
        edges.select(F.col("v").alias("u"), F.col("u").alias("v"))
    )
    mins = directed.groupBy("u").agg(F.min("v").alias("__mn__"))
    mins = mins.select("u", F.least("__mn__", F.col("u")).alias("__m__"))
    # No dropDuplicates here: duplicates (several u emitting the same
    # (v, m)) are absorbed by small-star's min-aggregate in the same job,
    # and |b| <= |directed| = 2|a| regardless, so skipping the dedup
    # removes one exchange per iteration without unbounding anything.
    return (
        directed.join(mins, "u")
        .where(F.col("v") > F.col("u"))
        .select(F.col("v").alias("u"), F.col("__m__").alias("v"))
    )


def _fused_star_round(a: DataFrame) -> DataFrame:
    """small_star(large_star(a)) derived in ONE pass over a single directed
    scan (VERDICT r3 #6) — algebraic fusion, not a new algorithm.

    MEASURED DEAD END #3 (kept for the record like the two in the NOTES
    below; default OFF). cc_lab on the 309944-edge merged 3-modality graph,
    480k corpus, 8 pinned cores, interleaved A/B runs: classic 41 stages /
    loop 11.5-14.0 s vs fused 56 stages / loop 18.2-24.9 s, identical
    fingerprints, 12 jobs both. Why it loses: ``lg`` (the large-star edge
    set) feeds two consumers (the mb aggregation and the join back), and
    without a checkpoint that whole join lineage executes twice — exchange
    reuse only deduplicates identical Exchange nodes, not the joined
    subtree above them. Adding a lazy checkpoint on ``lg`` recreates
    exactly the intermediate-``b`` materialization the fusion was meant to
    remove. The classic two-phase round with a lazily-checkpointed ``b``
    IS the fused plan with the common subexpression materialized once.

    Derivation (row-set identical to the classic pair, pinned on
    randomized graphs in tests/test_minhash_pipeline.py):

    large-star emits (v, m_u) for v in N(u), v > u, where
    m_u = min(N(u) ∪ {u}); every such edge is already (max, min)-oriented
    because m_u <= u < v. small-star on that edge set therefore groups by
    its v side directly: mb_v = min{m_u : u in N(v), u < v}, and the
    outputs are (m_u, mb_v) for m_u != mb_v plus the center rows
    (v, mb_v)."""
    directed = a.select("u", "v").unionAll(
        a.select(F.col("v").alias("u"), F.col("u").alias("v"))
    )
    mins = directed.groupBy("u").agg(F.min("v").alias("__mn__"))
    mins = mins.select("u", F.least("__mn__", F.col("u")).alias("__m__"))
    lg = (
        directed.join(mins, "u")
        .where(F.col("v") > F.col("u"))
        .select(F.col("v").alias("w"), F.col("__m__").alias("m"))
    )
    # min(N(w) ∪ {w}) over the large-star graph: every m < w, so the least()
    # guard is only for parity with _small_star's general form
    mbs = lg.groupBy("w").agg(F.min("m").alias("__mb__"))
    mbs = mbs.select("w", F.least("__mb__", F.col("w")).alias("__b__"))
    from_neighbors = (
        lg.join(mbs, "w")
        .where(F.col("m") != F.col("__b__"))
        .select(F.col("m").alias("u"), F.col("__b__").alias("v"))
    )
    from_centers = mbs.where(F.col("w") != F.col("__b__")).select(
        F.col("w").alias("u"), F.col("__b__").alias("v")
    )
    return from_neighbors.unionAll(from_centers).dropDuplicates(["u", "v"])


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


# NOTE (measured, round 3): a per-partition union-find "filtering" pass
# (mapInPandas spanning forest, zero shuffle) was prototyped here and
# REMOVED — on LSH star-edge graphs the merge chains are cross-partition
# by construction (each modality's bucket-min lives wherever its bucket
# hashed), so local contraction cut neither iterations (still 4) nor
# loop wall, while adding a Python-worker pass over the edges.


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
    fused: bool | None = None,
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
    import os as _os
    import time as _time

    if fused is None:
        fused = _os.environ.get("SPARK_GRAFT_CC_FUSED", "0") == "1"
    t0 = _time.monotonic()
    a = edges.select(F.col("src").alias("u"), F.col("dst").alias("v"))
    mapping: DataFrame | None = None
    if pre_contract > 0:
        a, mapping = _pre_contract(a, pre_contract)
    a = a.localCheckpoint(eager=True)
    LAST_RUN_STATS["pre_contract_rounds"] = pre_contract
    LAST_RUN_STATS["fused"] = fused
    LAST_RUN_STATS["edge_materialize_sec"] = round(_time.monotonic() - t0, 3)
    t0 = _time.monotonic()

    # Convergence: a is STAR-SHAPED (no dst also a src). Why that alone is
    # sufficient AND correct — stronger than the reference's a == b rule
    # (minhash_spark.py:377-379):
    #   * small-star output always points downward (dst = a min over keys
    #     >= dst, filtered dst != src), so in a star-shaped a every root r
    #     is smaller than all its members.
    #   * both maps preserve the connected components of the original
    #     graph (Kiveris et al., Thm 1-2), so each star's node set is
    #     exactly one original component.
    #   * the component's global min m must be the root: were m a member,
    #     it would have an edge (m, r) with r < m in the same component —
    #     contradicting minimality. Hence component == cluster-min.
    #   * a star is a fixpoint of both maps (large-star re-emits (n, r)
    #     for every member n; small-star keeps (n, r)), so stopping here
    #     equals the reference's answer while skipping its confirmation
    #     iteration over the already-converged graph.
    # The reference's rule ALONE can also halt chain-shaped graphs at a
    # PARENT-POINTER state where `component` is a smaller non-root member
    # (divergent from its own UnionFind, utils/union_find.py:7-28); the
    # star test guarantees per-cluster-min on every graph shape.
    # Pin the loop's joins to shuffle joins: the per-node-min frames joined
    # inside large/small-star are co-partitioned with the groupBy exchange
    # that produced them (same key u), so sort-merge reuses that exchange,
    # while a broadcast pick costs a separate driver-blocking
    # collect+rebroadcast job per join (~1s each measured) — pure serial
    # latency here. At scale the mins frame is O(nodes) anyway: never
    # broadcast-able. Restored after the loop.
    spark = edges.sparkSession
    prev_thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    iterations = 0
    for _ in range(max_iterations):
        # ONE eager checkpoint per iteration materializes large-star AND
        # small-star in a single job and truncates lineage there; the star
        # probe then runs on the few-MB checkpointed frame. (A lazy
        # checkpoint + isEmpty probe does NOT work: limit-1 short-circuits
        # full materialization, so each iteration re-executes its
        # predecessors — measured stage counts grew 2 -> 6 -> 11 per
        # probe. The CC loop is the serial section of the whole pipeline,
        # so job/stage count is its cost.)
        # ONE large/small-star round per eager checkpoint. (Unrolling two
        # rounds per job was measured SLOWER: the mid-round lazy checkpoint
        # is consumed by several union branches of the same job, which
        # re-execute it before it is persisted — 48 stages vs 41 and +50%
        # loop wall.)
        if fused:
            # measured dead end, default OFF — see _fused_star_round
            new_a = _fused_star_round(a).localCheckpoint(eager=True)
            b = None
        else:
            b = _large_star(a).localCheckpoint(eager=False)
            new_a = _small_star(b).localCheckpoint(eager=True)
        old_a = a
        a = new_a
        iterations += 1
        star = _is_star(a)
        old_a.unpersist()
        if b is not None:
            b.unpersist()
        if star:
            break
    else:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev_thresh)
        raise RuntimeError(f"connected_components did not converge in {max_iterations} iterations")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev_thresh)
    LAST_RUN_STATS["iterations"] = iterations
    LAST_RUN_STATS["loop_sec"] = round(_time.monotonic() - t0, 3)

    assigns = a.select(F.col("u").alias(id_col), F.col("v").alias("component"))
    if mapping is None:
        return assigns
    # compose the contraction mapping back over ALL original nodes:
    # comp(orig) = comp_contracted(label) if the label was further merged,
    # else the label itself; the cluster min maps to itself and is never a
    # key of the inner result, so the roots-absent invariant carries over.
    # Eagerly checkpointed: the lazy contraction mappings above would
    # otherwise be re-executed by every downstream action (measured: a
    # 0.6s survivor split ballooning to 9s).
    comp = assigns.select(F.col(id_col).alias("label"), "component")
    return (
        mapping.join(comp, "label", "left")
        .select(
            F.col("orig").alias(id_col),
            F.coalesce("component", "label").alias("component"),
        )
        .where(F.col(id_col) != F.col("component"))
        .localCheckpoint(eager=True)
    )
