"""Semantic deduplication (SemDeDup): k-means the embedding space, then
find and prune semantic duplicates WITHIN each cluster.

Public algorithm (Abbas et al. 2023, "SemDeDup: Data-efficient learning at
web-scale through semantic deduplication", arXiv:2303.09540): cluster all
embeddings with k-means; within each cluster, any pair with cosine
similarity >= eps is a semantic-duplicate pair; keep exactly one item per
duplicate group (the paper's best-performing policy keeps the item with the
LOWEST similarity to its cluster centroid). Cross-cluster pairs are never
examined — that is SemDeDup's stated approximation, which is what makes it
tractable at web scale.

No reference analog: text-dedup has no embedding-space operator at all;
this extends the suite the same way the ANN operators do (SURVEY §2
round-2/3 additions) and shares their machinery.

Spark shape (all DataFrame-native, scale-audited):
- centroids: ``ann.train_centroids`` — deterministic init + distributed
  Lloyd steps; only the (n_clusters x dim) matrix reaches the driver.
- one Arrow-batched pass assigns every DISTINCT embedding its cell and
  centroid similarity (identical vectors collapse to one representative
  first, via ``ann._collapse_identical_vectors`` — the hot-cell defense: a
  dedup corpus carries thousands of byte-identical embeddings which would
  otherwise all land in one cell and square the within-cell work).
- one shuffle partitions representatives by cell; each cell is grouped in
  a single ``applyInPandas`` task that finds duplicate groups with a
  BLOCKED matmul (row_block x cell_size — never cell_size^2 memory) and a
  vectorized min-label propagation; output is O(members), only rows in
  multi-member groups are emitted.
- group keys merge back through the identical-vector membership map, and
  the survivor policy is applied with ``apply.reassign_survivors`` (the
  same curation operator the MinHash path uses).

Per-cell work is O(cell_size^2) FLOPs by the paper's own construction —
``n_clusters`` is the knob that bounds it (the paper uses ~sqrt(n)
clusters; cells then hold ~sqrt(n) rows). The operator never materializes
a cell_size^2 matrix and never emits the quadratic pair set.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .ann import (
    _collapse_identical_vectors,
    _round_half_up,
    make_cosine_pairs_udf,
    train_centroids,
)
from .apply import reassign_survivors
from .cc import connected_components


def _make_cell_scan(eps: float, row_block: int):
    """Per-cell duplicate-group finder for ``applyInPandas``.

    Emits (id, component, csim) for every member of a multi-member group,
    where ``component`` is the group's minimum id (the roots-PRESENT view;
    the caller strips roots). Label propagation is vectorized: each round
    takes the min label over each row's eps-neighbors via ``np.minimum.at``
    on the sparse edge list, converging in O(graph diameter) rounds."""

    def scan(pdf: pd.DataFrame) -> pd.DataFrame:
        n = len(pdf)
        empty = pd.DataFrame(
            {
                "id": pd.Series(dtype="int64"),
                "component": pd.Series(dtype="int64"),
                "csim": pd.Series(dtype="float64"),
            }
        )
        if n < 2:
            return empty
        ids = pdf["id"].to_numpy()
        csim = pdf["csim"].to_numpy()
        mat = np.array(pdf["v"].tolist(), dtype=np.float64)
        mat /= np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-300)

        rows_l, cols_l = [], []
        for start in range(0, n, row_block):
            block = mat[start : start + row_block]
            sims = _round_half_up(block @ mat.T)
            bi, j = np.nonzero(sims >= eps)
            i = bi + start
            keep = i < j  # one direction; propagation applies both
            if keep.any():
                rows_l.append(i[keep])
                cols_l.append(j[keep])
        if not rows_l:
            return empty
        rows = np.concatenate(rows_l)
        cols = np.concatenate(cols_l)

        lab = np.arange(n, dtype=np.int64)
        while True:
            new = lab.copy()
            np.minimum.at(new, rows, lab[cols])
            np.minimum.at(new, cols, lab[rows])
            if np.array_equal(new, lab):
                break
            lab = new

        # component = min ID in the group (ids are not index-ordered)
        comp_min = np.full(n, np.iinfo(np.int64).max, dtype=np.int64)
        np.minimum.at(comp_min, lab, ids)
        sizes = np.bincount(lab, minlength=n)
        member = sizes[lab] > 1
        return pd.DataFrame(
            {
                "id": ids[member],
                "component": comp_min[lab[member]],
                "csim": csim[member],
            }
        )

    return scan


def _big_cell_edges(
    big: DataFrame, eps: float, n_blocks: int, row_block: int
) -> DataFrame:
    """(src, dst) near-dup edges within each oversized cell, via the same
    blocked pair-group scheme as ``ann._exact_near_pairs_blocked`` but
    grouped by (cell, pair_id): every vector is replicated to its block's
    pair-groups (factor n_blocks), each group holds ~2*cell_size/n_blocks
    rows and is scored with a chunked matmul. Edges then feed the audited
    distributed connected-components pass, so no single task ever holds a
    whole hot cell. Edge volume equals the true qualifying-pair count —
    materialized hash-partitioned, never in one task."""
    spark = big.sparkSession
    member_rows = []
    pi = 0
    for i in range(n_blocks):
        for j in range(i, n_blocks):
            diag = 1 if i == j else 0
            member_rows.append((i, pi, 0, diag))
            if j != i:
                member_rows.append((j, pi, 1, diag))
            pi += 1
    members = spark.createDataFrame(
        member_rows, "block int, pair_id int, role int, diag int"
    )
    vecs = big.select(
        "cell",
        "id",
        "v",
        F.pmod(F.xxhash64(F.col("id")), F.lit(n_blocks)).cast("int").alias("block"),
    )
    replicated = vecs.join(F.broadcast(members), "block").select(
        "cell", "pair_id", "diag", "role", "id", "v"
    )
    empty = pd.DataFrame(
        {"src": pd.Series(dtype="int64"), "dst": pd.Series(dtype="int64")}
    )

    def edge_group(pdf: pd.DataFrame) -> pd.DataFrame:
        diag = bool(pdf["diag"].iloc[0])
        left = pdf[pdf["role"] == 0]
        right = pdf[pdf["role"] == 1]
        if len(left) == 0 or (not diag and len(right) == 0):
            return empty
        lids = left["id"].to_numpy()
        lmat = np.array(left["v"].tolist(), dtype=np.float64)
        lmat /= np.maximum(np.linalg.norm(lmat, axis=1, keepdims=True), 1e-300)
        if diag:
            rids, rmat = lids, lmat
        else:
            rids = right["id"].to_numpy()
            rmat = np.array(right["v"].tolist(), dtype=np.float64)
            rmat /= np.maximum(np.linalg.norm(rmat, axis=1, keepdims=True), 1e-300)
        srcs, dsts = [], []
        for start in range(0, len(lids), row_block):
            sims = _round_half_up(lmat[start : start + row_block] @ rmat.T)
            li, ri = np.nonzero(sims >= eps)
            a, b = lids[start:][li], rids[ri]
            keep = a != b
            srcs.append(np.minimum(a[keep], b[keep]))
            dsts.append(np.maximum(a[keep], b[keep]))
        if not srcs:
            return empty
        out = pd.DataFrame(
            {"src": np.concatenate(srcs), "dst": np.concatenate(dsts)}
        )
        return out.drop_duplicates(["src", "dst"]) if diag else out

    return replicated.groupBy("cell", "pair_id").applyInPandas(
        edge_group, "src long, dst long"
    )


def hashed_shingle_embeddings(
    df: DataFrame,
    text_col: str,
    id_col: str = "doc_id",
    dim: int = 512,
    ngram: int = 5,
) -> DataFrame:
    """Model-free text embedding for semantic_dedup: signed feature-hashed
    bag of word ``ngram``-shingles (crc32 -> bucket index + sign). Cosine
    over these vectors tracks shingle-set overlap (for same-length docs,
    cosine of shingle indicators ~ 2J/(1+J) of their Jaccard J), so it
    lands the same fuzzy-duplicate regime as MinHash at threshold ~0.7 when
    eps ~ 0.8 — without any model weights. Deterministic across workers
    (crc32, not Python's salted hash). Returns (id_col, embedding)."""
    import zlib

    @F.pandas_udf("array<float>")
    def embed(texts: pd.Series) -> pd.Series:
        out = []
        for t in texts:
            words = (t or "").split()
            vec = np.zeros(dim, dtype=np.float64)
            n = max(len(words) - ngram + 1, 0)
            for i in range(n):
                h = zlib.crc32(" ".join(words[i : i + ngram]).encode("utf-8"))
                vec[h % dim] += 1.0 if (h >> 31) & 1 else -1.0
            out.append(vec.astype(np.float32).tolist())
        return pd.Series(out)

    return df.select(F.col(id_col), embed(F.col(text_col)).alias("embedding"))


def semantic_dedup(
    df: DataFrame,
    eps: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_clusters: int = 64,
    keep: str = "low",
    kmeans_iterations: int = 2,
    row_block: int = 2048,
    cell_cap: int | None = 50_000,
) -> DataFrame:
    """Roots-absent assignment table (id_col, component): one row per
    PRUNED item, ``component`` = the id of its group's surviving member —
    a drop-in for ``apply.split_survivors``, exactly like the MinHash CC
    output.

    ``n_clusters`` must be sized WELL BELOW the number of distinct
    vectors (the paper uses ~sqrt(n)): with n_clusters >= n every vector
    seeds its own cell and within-cell scans find nothing — a silent
    no-op on tiny corpora, deliberate rather than auto-clamped so the
    cell geometry never changes behind the caller's back.

    ``keep``: which member of each semantic-duplicate group survives —
    ``'low'`` (paper default: lowest similarity to the cluster centroid),
    ``'high'``, or ``'min_id'``. Ties (and all identical-vector copies,
    whose centroid similarities are equal) break to the smallest id, so
    results are partitioning-independent.

    ``cell_cap``: hot-cell defense. A skewed corpus can put far more than
    corpus/n_clusters rows in one cell (one dominant content type), and the
    single-task-per-cell scan would then be unbounded. Cells holding more
    than ``cell_cap`` DISTINCT vectors are instead processed by blocked
    pair-group edge extraction (per-task rows ~ 2*cell/n_blocks <=
    ~2*cell_cap) + the distributed connected-components pass — identical
    groups, no task ever holds a whole cell. Size it to executor memory:
    the in-task matrix is cell_cap x dim float64 (50k x 768 ~ 300 MB).
    ``None`` disables the split (single-task cells regardless of size)."""
    if keep not in ("low", "high", "min_id"):
        raise ValueError(f"keep must be low|high|min_id, got {keep!r}")
    cents = train_centroids(df, id_col, vec_col, n_clusters, kmeans_iterations)
    reps, members = _collapse_identical_vectors(df, id_col, vec_col)

    @F.pandas_udf("struct<cell: int, csim: double>")
    def cell_and_sim(vecs: pd.Series) -> pd.DataFrame:
        mat = np.array(vecs.tolist(), dtype=np.float64)
        mat /= np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-300)
        sims = mat @ cents.T
        cell = sims.argmax(axis=1).astype(np.int32)
        return pd.DataFrame(
            {"cell": cell, "csim": _round_half_up(sims.max(axis=1))}
        )

    celled = reps.withColumn("__cs__", cell_and_sim(F.col("v"))).select(
        "id", "v", F.col("__cs__.cell").alias("cell"), F.col("__cs__.csim").alias("csim")
    )

    # rep-level duplicate groups within each cell (multi-member only);
    # oversized cells take the blocked-edges + distributed-CC path
    big_cells: list[int] = []
    if cell_cap is not None:
        # driver-side collect BOUNDED BY n_clusters (one (cell, n) row per
        # k-means cell, never per data row) — same class of documented
        # bounded collects as ids.py:42 / suffix.py:241
        sizes = celled.groupBy("cell").agg(F.count(F.lit(1)).alias("n")).collect()
        big_cells = [r["cell"] for r in sizes if r["n"] > cell_cap]
    small = celled.where(~F.col("cell").isin(big_cells)) if big_cells else celled
    rep_groups = small.groupBy("cell").applyInPandas(
        _make_cell_scan(eps, row_block), "id long, component long, csim double"
    )
    if big_cells:
        big = celled.where(F.col("cell").isin(big_cells))
        max_big = max(r["n"] for r in sizes if r["cell"] in set(big_cells))
        n_blocks = -(-max_big // cell_cap)  # ceil; >= 2 since max_big > cap
        edges = _big_cell_edges(big, eps, n_blocks, row_block)
        assigned = connected_components(edges, "id")  # roots absent
        roots = assigned.select(F.col("component").alias("id"), "component").distinct()
        big_groups = (
            assigned.unionByName(roots)
            .join(celled.select("id", "csim"), "id")
            .select("id", "component", "csim")
        )
        rep_groups = rep_groups.unionByName(big_groups)

    # identical-vector groups whose representative found NO distinct
    # neighbor are still duplicate groups on their own (every copy is at
    # self-similarity of its vector) — gate on the self-score >= eps so
    # degenerate zero vectors (self-cosine 0 under the guarded norm) are
    # never grouped, matching embedding_near_pairs semantics.
    score = make_cosine_pairs_udf()
    gsize = members.groupBy("rep").agg(F.count(F.lit(1)).alias("__gn__"))
    lone_identical = (
        celled.join(gsize.where(F.col("__gn__") > 1), celled["id"] == F.col("rep"))
        .join(rep_groups.select(F.col("id").alias("rep")), "rep", "left_anti")
        .where(score(F.col("v"), F.col("v")) >= eps)
        .select(F.col("rep").alias("id"), F.col("rep").alias("component"), "csim")
    )

    # expand representative groups to all identical copies: a copy shares
    # its rep's vector, hence its cell, neighbors, and centroid similarity.
    # component stays the group min id: reps are their identical group's
    # min, and the scan's component is the min rep — min over all members.
    all_groups = rep_groups.unionByName(lone_identical)
    expanded = (
        all_groups.withColumnRenamed("id", "rep")
        .join(members, "rep")
        .select("id", "component", "csim")
    )

    assignments = expanded.where(F.col("id") != F.col("component")).select(
        F.col("id").alias(id_col), "component"
    )
    if keep == "min_id":
        return assignments
    scores = expanded.select(F.col("id").alias(id_col), "csim")
    return reassign_survivors(
        assignments, scores, id_col, "csim", descending=(keep == "high")
    )
