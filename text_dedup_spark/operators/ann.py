"""Similarity search over embedding columns (array<float>).

Tiers (all DataFrame-native):
- ``brute_force_topk``: exact cosine top-k — broadcast the (small) query set
  against the full corpus; dot products via zip_with/aggregate in DOUBLE with
  left-to-right accumulation (deterministic, oracle-mirrorable). The
  baseline and the verifier for the approximate paths.
- ``lsh_topk``: random-hyperplane (sign) LSH — an Arrow-batched numpy matmul
  computes an nbits signature per vector, candidates = bucket collisions in
  any of ``n_tables`` tables, exact cosine re-rank of candidates only. The
  scan-pruning path: candidate generation is a hash-partitioned equi-join on
  (table, bucket), never a cross join.
- ``ivf_topk``: coarse k-means cells, probe-n_probe scan pruning.
- ``pq_topk`` / ``ivfpq_topk``: product quantization — the MEMORY path for
  10^12 vectors (m bytes/vector instead of 4*dim; ADC lookup-table scoring
  in the compressed domain; IVF-PQ composes cells + codes + optional exact
  refine, the canonical billion-to-trillion-scale layout).

``embedding_near_pairs``: all pairs above a cosine threshold (the
embedding-space near-duplicate operator) — same join skeleton as the LSH
path; brute force only when forced.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.pandas.functions import pandas_udf
from pyspark.sql.types import ArrayType, IntegerType


def _round_half_up(x: np.ndarray, digits: int = 6) -> np.ndarray:
    """Match Spark/DuckDB ROUND (HALF_UP) instead of numpy's HALF_EVEN."""
    scale = 10.0 ** digits
    return np.sign(x) * np.floor(np.abs(x) * scale + 0.5) / scale


def cosine_expr(a, b):
    """Cosine similarity of two array<float/double> columns, computed in
    double with index-order accumulation."""
    ad = F.transform(a, lambda x: x.cast("double"))
    bd = F.transform(b, lambda x: x.cast("double"))
    dot = F.aggregate(F.zip_with(ad, bd, lambda x, y: x * y), F.lit(0.0), lambda s, x: s + x)
    na = F.sqrt(F.aggregate(F.transform(ad, lambda x: x * x), F.lit(0.0), lambda s, x: s + x))
    nb = F.sqrt(F.aggregate(F.transform(bd, lambda x: x * x), F.lit(0.0), lambda s, x: s + x))
    return dot / (na * nb)


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(query_id, neighbor_id, rank, score). Self-matches excluded. The
    query side is broadcast (it is the small side by contract)."""
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("__qv__")
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("__cv__")
    )
    scored = (
        c.crossJoin(F.broadcast(q))
        .where(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(cosine_expr(F.col("__qv__"), F.col("__cv__")), 6).alias("score"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("score"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "score")
    )


def sign_planes(dim: int, nbits: int, n_tables: int, seed: int) -> np.ndarray:
    """Deterministic (n_tables, dim, nbits) hyperplane tensor — the single
    source of truth shared by every sign-LSH UDF AND the constructed board
    oracle (kernel/oracle_values.py), so both sides derive bit-identical
    projections from (seed, dim, nbits, n_tables)."""
    return np.random.RandomState(seed).normal(size=(n_tables, dim, nbits))


def sign_bucket_ids(mat: np.ndarray, planes: np.ndarray) -> np.ndarray:
    """(n, dim) float64 -> (n, n_tables) int64 sign-bit bucket ids; the
    shared kernel math for corpus/query bucketing (UDFs and oracle)."""
    n_tables, _, nbits = planes.shape
    weights = (1 << np.arange(nbits)).astype(np.int64)
    out = np.empty((mat.shape[0], n_tables), dtype=np.int64)
    for t in range(n_tables):
        bits = (mat @ planes[t]) > 0  # (n, nbits)
        out[:, t] = bits @ weights
    return out


def make_sign_lsh_udf(nbits: int, n_tables: int, seed: int = 42, dim: int | None = None):
    """array<float> -> array<int> of n_tables bucket ids (sign-bit LSH).

    The projection matrix is deterministic in (seed, dim, nbits, n_tables).
    ``dim`` may be omitted: it is then read from the first Arrow batch on
    each worker — every worker derives the identical planes, and no extra
    Spark job is spent discovering the vector length on the driver."""
    state: dict = {}

    @pandas_udf(ArrayType(IntegerType()))
    def sign_buckets(vecs: pd.Series) -> pd.Series:
        mat = np.array(vecs.tolist(), dtype=np.float64)  # (batch, dim)
        planes = state.get("planes")
        if planes is None:
            d = dim if dim is not None else mat.shape[1]
            planes = sign_planes(d, nbits, n_tables, seed)
            state["planes"] = planes
        out = sign_bucket_ids(mat, planes)
        return pd.Series(out.astype(np.int32).tolist())

    return sign_buckets


def make_multiprobe_lsh_udf(
    nbits: int, n_tables: int, seed: int, n_probes: int, dim: int | None = None
):
    """array<float> -> array<int> of ``n_tables * n_probes`` bucket ids —
    query-directed multi-probe sign-LSH (Lv et al. 2007, VLDB: "Multi-Probe
    LSH: Efficient Indexing for High-Dimensional Similarity Search").

    Probe 0 per table is the base bucket (identical to
    ``make_sign_lsh_udf`` — SAME seed => same planes => joinable against a
    corpus index built with the single-probe UDF). Probe j >= 1 flips the
    j-th LOWEST-|margin| bit: the hyperplanes the vector sits closest to
    are the ones a true near-neighbor most plausibly landed on the other
    side of, so these are the highest-yield neighboring buckets.

    First-order (single-bit) perturbations only, so ``n_probes <= nbits+1``
    — fully vectorized over the Arrow batch (an argsort of |projection|
    per table; flipping bit b is an int XOR with 1<<b). Layout of the
    returned array: table-major (``pos // n_probes`` recovers the table),
    matching the posexplode in ``lsh_topk``.
    """
    if n_probes > nbits + 1:
        raise ValueError(f"n_probes={n_probes} > nbits+1={nbits + 1}")
    state: dict = {}

    @pandas_udf(ArrayType(IntegerType()))
    def multiprobe_buckets(vecs: pd.Series) -> pd.Series:
        mat = np.array(vecs.tolist(), dtype=np.float64)  # (batch, dim)
        planes = state.get("planes")
        if planes is None:
            d = dim if dim is not None else mat.shape[1]
            planes = sign_planes(d, nbits, n_tables, seed)
            state["planes"] = planes
        n = mat.shape[0]
        weights = (1 << np.arange(nbits)).astype(np.int64)
        out = np.empty((n, n_tables, n_probes), dtype=np.int64)
        for t in range(n_tables):
            proj = mat @ planes[t]  # (batch, nbits)
            base = ((proj > 0) @ weights).astype(np.int64)
            out[:, t, 0] = base
            if n_probes > 1:
                # bits sorted by |margin| ascending = flip-likelihood desc
                order = np.argsort(np.abs(proj), axis=1, kind="stable")
                flips = np.int64(1) << order[:, : n_probes - 1]
                out[:, t, 1:] = base[:, None] ^ flips
        return pd.Series(out.reshape(n, -1).astype(np.int32).tolist())

    return multiprobe_buckets


def _collapse_identical_vectors(
    df: DataFrame, id_col: str, vec_col: str, member_cap: int | None = None
) -> tuple[DataFrame, DataFrame]:
    """(reps, members): one representative row (id=group-min, vector) per
    DISTINCT embedding value, plus the (rep, id) membership map.

    This is the hot-bucket defense for the embedding operators (the analog
    of simhash_dedup's identical-signature collapse): a dedup corpus has
    MANY bit-identical embeddings, and every copy lands in the same LSH
    bucket in every table — a quadratic self-join on one key. Grouping by
    the raw vector value (never a hash of it — a hash collision here would
    silently assign wrong scores) costs one linear corpus shuffle and makes
    every downstream bucket join see each distinct vector once.

    ``member_cap``: keep only the cap smallest member ids per group (for
    top-k expansion only the k smallest ids of a tied group can ever make
    the cut, so expansion stays O(k) per candidate group).

    One hash-aggregate shuffle total (partial agg map-side); reps and
    members both project from it, so AQE reuses the exchange instead of
    recomputing — this replaced a 3-window formulation whose unpartialled
    sort exchanges tripled the stage count.
    """
    grouped = (
        df.groupBy(F.col(vec_col).alias("v"))
        .agg(F.sort_array(F.collect_list(id_col)).alias("__ids__"))
        .select(
            F.element_at("__ids__", 1).alias("rep"),
            "v",
            (F.slice("__ids__", 1, member_cap) if member_cap is not None
             else F.col("__ids__")).alias("__member_ids__"),
        )
    )
    reps = grouped.select(F.col("rep").alias("id"), "v")
    members = grouped.select("rep", F.explode("__member_ids__").alias("id"))
    return reps, members


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    nbits: int = 12,
    n_tables: int = 8,
    seed: int = 42,
    n_probes: int = 1,
) -> DataFrame:
    """Approximate top-k: bucket-collision candidates, exact re-rank.

    ``n_probes > 1`` turns on query-directed multi-probe (Lv et al. 2007):
    each QUERY additionally probes the n_probes-1 neighboring buckets
    reached by flipping its lowest-|margin| sign bits. Recall rises at a
    FIXED corpus-side index — the right scale lever: the corpus index (the
    10^12-row side) stays one row per table per distinct vector, only the
    small query side fans out, and the candidate set is a strict superset
    of the single-probe one (probe 0 is the base bucket), so recall is
    monotonically non-decreasing in n_probes while the exact re-rank keeps
    precision.

    Scale shape: (a) identical corpus vectors are collapsed to one
    representative before the bucket join (a tied group of g copies costs 1
    bucket row per table instead of g — the quadratic-hot-bucket defense;
    members re-expand after scoring, capped at k+1 per group since only the
    k+1 smallest ids of a tied group can make top-k under the
    (score desc, id asc) order even after self-exclusion); (b) the candidate
    join and pair-dedup shuffles carry ONLY 8-byte ids — vectors re-join
    exactly once per side and score with one numpy matmul per batch."""
    udf = make_sign_lsh_udf(nbits, n_tables, seed)
    reps, members = _collapse_identical_vectors(
        corpus, id_col, vec_col, member_cap=k + 1
    )

    cb = reps.select(
        F.col("id").alias("rep"),
        F.posexplode_outer(udf(F.col("v"))).alias("table", "neighbor_bucket"),
    )
    if n_probes > 1:
        qudf = make_multiprobe_lsh_udf(nbits, n_tables, seed, n_probes)
        qb = queries.select(
            F.col(id_col).alias("query_id"),
            F.posexplode_outer(qudf(F.col(vec_col))).alias("__p__", "neighbor_bucket"),
        ).select(
            "query_id",
            (F.col("__p__") / n_probes).cast("int").alias("table"),
            "neighbor_bucket",
        )
    else:
        qb = queries.select(
            F.col(id_col).alias("query_id"),
            F.posexplode_outer(udf(F.col(vec_col))).alias("table", "neighbor_bucket"),
        )
    cand = (
        cb.join(qb, ["table", "neighbor_bucket"])
        .select("query_id", "rep")
        .dropDuplicates(["query_id", "rep"])
    )
    qv = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("__qv__"))
    cv = reps.select(F.col("id").alias("rep"), F.col("v").alias("__cv__"))
    score = make_cosine_pairs_udf()
    # no broadcast hint on the query-vector re-join: queries are usually the
    # small side, but an unconditional hint would bypass
    # autoBroadcastJoinThreshold for arbitrarily large query sets — let
    # AQE pick broadcast vs shuffle from the measured size (as
    # embedding_near_pairs does)
    scored = (
        cand.join(qv, "query_id")
        .join(cv, "rep")
        .select(
            "query_id",
            "rep",
            score(F.col("__qv__"), F.col("__cv__")).alias("score"),
        )
    )
    # re-expand representatives to members (identical vector => identical
    # score); self-matches excluded at MEMBER level so a query inside a
    # tied corpus group still sees its co-members
    expanded = (
        scored.join(members, "rep")
        .where(F.col("id") != F.col("query_id"))
        .select("query_id", F.col("id").alias("neighbor_id"), "score")
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("neighbor_id"))
    return (
        expanded.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "score")
    )


def make_cosine_pairs_udf():
    """(array<float>, array<float>) -> double cosine, numpy per Arrow batch
    — the re-rank scorer for candidate joins (vectorized; ~20x faster than
    per-row Catalyst aggregate/zip_with on wide candidate sets)."""

    @pandas_udf("double")
    def cos(a: pd.Series, b: pd.Series) -> pd.Series:
        am = np.array(a.tolist(), dtype=np.float64)
        bm = np.array(b.tolist(), dtype=np.float64)
        dots = np.einsum("ij,ij->i", am, bm)
        na = np.linalg.norm(am, axis=1)
        nb = np.linalg.norm(bm, axis=1)
        return pd.Series(_round_half_up(dots / np.maximum(na * nb, 1e-300)))

    return cos


def train_centroids(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_centroids: int = 64,
    kmeans_iterations: int = 2,
) -> np.ndarray:
    """Deterministic spherical k-means centroids (unit rows, shape
    (n_centroids, dim)): hash-ordered corpus sample init, then
    ``kmeans_iterations`` distributed Lloyd steps — assign cells with the
    batched matmul UDF, per-cell means via posexplode + groupBy(cell,
    pos).avg (a partial-aggregating shuffle of n_centroids x dim rows,
    never a vector collect); only the tiny centroid matrix reaches the
    driver. Shared by ``ivf_topk`` and ``semantic_dedup``."""
    cent_rows = (
        corpus.select(F.col(vec_col).alias("v"), F.xxhash64(F.col(id_col)).alias("h"))
        .orderBy("h")
        .limit(n_centroids)
        .collect()
    )
    cents = np.array([r["v"] for r in cent_rows], dtype=np.float64)
    cents /= np.maximum(np.linalg.norm(cents, axis=1, keepdims=True), 1e-300)

    for _ in range(kmeans_iterations):
        assign_it = make_cell_assign_udf(cents)
        means = (
            corpus.select(
                assign_it(F.col(vec_col)).alias("cell"),
                F.posexplode(F.col(vec_col)).alias("pos", "val"),
            )
            .groupBy("cell", "pos")
            .agg(F.avg("val").alias("m"))
            .collect()
        )
        new_cents = cents.copy()  # empty cells keep their previous centroid
        touched = {r["cell"] for r in means}
        for c in touched:
            new_cents[c] = 0.0
        for r in means:
            new_cents[r["cell"], r["pos"]] = r["m"]
        norms = np.linalg.norm(new_cents, axis=1, keepdims=True)
        cents = new_cents / np.maximum(norms, 1e-300)
    return cents


def make_cell_assign_udf(c: np.ndarray):
    """array<float> -> nearest-centroid cell id (argmax cosine), one numpy
    matmul per Arrow batch."""

    @pandas_udf(IntegerType())
    def assign(vecs: pd.Series) -> pd.Series:
        mat = np.array(vecs.tolist(), dtype=np.float64)
        mat /= np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-300)
        return pd.Series((mat @ c.T).argmax(axis=1).astype(np.int32))

    return assign


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_centroids: int = 64,
    n_probe: int = 8,
    seed: int = 42,
    kmeans_iterations: int = 2,
) -> DataFrame:
    """IVF (inverted-file) approximate top-k: the scale path for ANN.

    - Centroids: a deterministic hash-ordered sample of ``n_centroids``
      corpus vectors, refined by ``kmeans_iterations`` distributed Lloyd
      steps: assign cells with the batched matmul UDF, then per-cell
      spherical means via posexplode + groupBy(cell, pos).avg — a partial-
      aggregating shuffle of n_centroids x dim rows, never a vector
      collect; only the (tiny) centroid matrix reaches the driver.
    - Cell assignment: one numpy matmul per Arrow batch (argmax cosine).
    - Query side probes its ``n_probe`` nearest cells; candidates come from
      a hash-partitioned equi-join on the cell id — the corpus is scanned
      once and shuffled by cell, never cross-joined.
    - Exact cosine re-rank of candidates only.
    """
    cents = train_centroids(corpus, id_col, vec_col, n_centroids, kmeans_iterations)
    assign_cell = make_cell_assign_udf(cents)

    @pandas_udf(ArrayType(IntegerType()))
    def probe_cells(vecs: pd.Series) -> pd.Series:
        mat = np.array(vecs.tolist(), dtype=np.float64)
        mat /= np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-300)
        sims = mat @ cents.T
        idx = np.argsort(-sims, axis=1)[:, :n_probe].astype(np.int32)
        return pd.Series(idx.tolist())

    celled = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("__cv__"),
        assign_cell(F.col(vec_col)).alias("cell"),
    )
    probed = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("__qv__"),
        F.explode_outer(probe_cells(F.col(vec_col))).alias("cell"),
    )
    score = make_cosine_pairs_udf()
    cand = (
        celled.join(probed, "cell")
        .where(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            score(F.col("__qv__"), F.col("__cv__")).alias("score"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("neighbor_id"))
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "score")
    )


def train_pq(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    m: int = 8,
    nbits: int = 8,
    sample_cap: int = 65536,
    kmeans_iterations: int = 10,
) -> np.ndarray:
    """Product-quantizer codebooks, shape (m, 2**nbits, dim/m).

    The memory path for 10^12-vector search: PQ stores m bytes per vector
    (m=8, dim=64 float32 -> 32x compression), and ADC scans the compressed
    codes without touching raw vectors. Training follows the standard
    practice (Jegou et al., faiss): an independent L2 k-means per subspace
    over a BOUNDED deterministic sample — hash-ordered ``sample_cap`` rows,
    so the driver holds at most sample_cap x dim x 8 B (32 MB at the
    defaults) regardless of corpus size; everything after training is
    distributed. Vectors are L2-normalized before splitting, so ADC inner
    products approximate cosine (the metric every other ANN tier here
    uses). dim must be divisible by m."""
    k = 1 << nbits
    rows = (
        corpus.select(F.col(vec_col).alias("v"), F.xxhash64(F.col(id_col)).alias("h"))
        .orderBy("h")
        .limit(sample_cap)
        .collect()
    )
    mat = np.array([r["v"] for r in rows], dtype=np.float64)
    return pq_train_numpy(mat, m, nbits, kmeans_iterations)


def pq_train_numpy(
    mat: np.ndarray, m: int, nbits: int, kmeans_iterations: int
) -> np.ndarray:
    """Driver-side PQ codebook training on an already-collected sample —
    the shared deterministic kernel for ``train_pq`` AND the constructed
    board oracle (same sample order in => bit-identical codebooks out)."""
    k = 1 << nbits
    dim = mat.shape[1]
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m {m}")
    dsub = dim // m
    mat = mat / np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-300)
    books = np.empty((m, k, dsub), dtype=np.float64)
    for s in range(m):
        sub = mat[:, s * dsub : (s + 1) * dsub]
        # deterministic init: first k sample rows (cycled if the sample is
        # smaller than k — duplicate centroids resolve via argmin ties)
        cents = sub[np.arange(k) % len(sub)].copy()
        for _ in range(kmeans_iterations):
            d2 = ((sub[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
            assign = d2.argmin(axis=1)
            for c in np.unique(assign):
                cents[c] = sub[assign == c].mean(axis=0)
        books[s] = cents
    return books


def pq_codes_numpy(mat: np.ndarray, codebooks: np.ndarray) -> np.ndarray:
    """(n, dim) float64 -> (n, m) uint8 nearest-codeword codes of the
    L2-normalized rows; shared by the encode UDF and the board oracle."""
    m, k, dsub = codebooks.shape
    mat = mat / np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-300)
    out = np.empty((mat.shape[0], m), dtype=np.uint8)
    for s in range(m):
        sub = mat[:, s * dsub : (s + 1) * dsub]
        # argmin ||x - c||^2 = argmax (x.c - ||c||^2/2), batched
        scores = sub @ codebooks[s].T - 0.5 * (codebooks[s] ** 2).sum(axis=1)
        out[:, s] = scores.argmax(axis=1).astype(np.uint8)
    return out


def adc_scores_numpy(
    q: np.ndarray, codes: np.ndarray, codebooks: np.ndarray
) -> np.ndarray:
    """Unrounded ADC inner-product scores for (nq-normalized query rows,
    (n, m) uint8 codes): the exact lookup arithmetic of the ADC UDF (one
    LUT per distinct query, m table lookups per code row). ``q`` must
    already be L2-normalized; rows of ``codes`` are scored against the
    matching row of ``q`` (same length)."""
    m, k, dsub = codebooks.shape
    _, first_idx, inv = np.unique(q, axis=0, return_index=True, return_inverse=True)
    luts = np.einsum(
        "qmd,mkd->qmk", q[first_idx].reshape(len(first_idx), m, dsub), codebooks
    )  # (nq, m, k)
    rows = np.arange(len(codes))
    return luts[inv][rows[:, None], np.arange(m)[None, :], codes].sum(axis=1)


def make_pq_encode_udf(codebooks: np.ndarray):
    """array<float> -> binary of m uint8 codes (nearest codeword per
    subspace of the L2-normalized vector); one numpy pass per Arrow batch."""
    m, k, dsub = codebooks.shape

    @pandas_udf("binary")
    def encode(vecs: pd.Series) -> pd.Series:
        mat = np.array(vecs.tolist(), dtype=np.float64)
        out = pq_codes_numpy(mat, codebooks)
        return pd.Series([r.tobytes() for r in out])

    return encode


def pq_encode(
    df: DataFrame,
    codebooks: np.ndarray,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, pq_code binary) — the compressed corpus table. At 10^12 rows
    this is what persists and shuffles (m bytes/row); raw vectors are read
    exactly once to encode."""
    enc = make_pq_encode_udf(codebooks)
    return df.select(
        F.col(id_col).alias("id"), enc(F.col(vec_col)).alias("pq_code")
    )


def make_adc_score_udf(codebooks: np.ndarray):
    """(query array<float>, pq_code binary) -> double approximate cosine.

    Real ADC: per Arrow batch, build one (m x 2**nbits) inner-product
    lookup table per DISTINCT query in the batch, then score every code row
    with m table lookups — dsub-times fewer flops than decoding, which is
    the whole point of scanning in the compressed domain."""
    m, k, dsub = codebooks.shape

    @pandas_udf("double")
    def adc(qv: pd.Series, codes: pd.Series) -> pd.Series:
        q = np.array(qv.tolist(), dtype=np.float64)
        q /= np.maximum(np.linalg.norm(q, axis=1, keepdims=True), 1e-300)
        c = np.frombuffer(b"".join(codes.tolist()), dtype=np.uint8).reshape(-1, m)
        # group rows by identical query (queries repeat per batch under the
        # broadcast join); one LUT per distinct query, not per row
        return pd.Series(_round_half_up(adc_scores_numpy(q, c, codebooks)))

    return adc


def pq_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    m: int = 8,
    nbits: int = 8,
    codebooks: np.ndarray | None = None,
) -> DataFrame:
    """(query_id, neighbor_id, rank, score) — flat ADC scan over PQ codes.

    The compressed-domain twin of ``brute_force_topk``: same broadcast-query
    join skeleton, but the corpus side is the m-bytes/row code table and
    scoring is m LUT lookups per pair. ``score`` is the ADC approximation
    of cosine (quantization error bounded by the codebook distortion); use
    ``ivfpq_topk(refine=...)`` when exact final scores are needed."""
    if codebooks is None:
        codebooks = train_pq(corpus, id_col, vec_col, m, nbits)
    codes = pq_encode(corpus, codebooks, id_col, vec_col).withColumnRenamed(
        "id", "neighbor_id"
    )
    q = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("__qv__"))
    adc = make_adc_score_udf(codebooks)
    scored = (
        codes.crossJoin(F.broadcast(q))
        .where(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            adc(F.col("__qv__"), F.col("pq_code")).alias("score"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "score")
    )


def ivfpq_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_centroids: int = 64,
    n_probe: int = 8,
    m: int = 8,
    nbits: int = 8,
    refine: int = 0,
    kmeans_iterations: int = 2,
    codebooks: np.ndarray | None = None,
) -> DataFrame:
    """IVF-PQ: the canonical 10^12-vector design (coarse cells prune the
    scan, PQ codes bound memory, optional exact re-rank restores scores).

    - corpus pass 1: assign coarse cell (shared ``train_centroids``) and
      PQ-encode — the persisted index row is (id, cell, m-byte code);
    - query side probes ``n_probe`` cells; candidates come from the
      hash-partitioned equi-join on cell (same skeleton as ``ivf_topk``),
      scored with ADC lookups — raw vectors never join the candidate path;
    - ``refine`` > 0: the top ``refine`` ADC candidates per query (>= k)
      re-join the raw vectors ONCE for exact cosine, which both fixes the
      ranking and restores exact scores. refine bounds that join to
      nq x refine rows, independent of corpus size."""
    if codebooks is None:
        codebooks = train_pq(corpus, id_col, vec_col, m, nbits)
    cents = train_centroids(corpus, id_col, vec_col, n_centroids, kmeans_iterations)
    assign_cell = make_cell_assign_udf(cents)
    enc = make_pq_encode_udf(codebooks)

    @pandas_udf(ArrayType(IntegerType()))
    def probe_cells(vecs: pd.Series) -> pd.Series:
        mat = np.array(vecs.tolist(), dtype=np.float64)
        mat /= np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-300)
        idx = np.argsort(-(mat @ cents.T), axis=1)[:, :n_probe].astype(np.int32)
        return pd.Series(idx.tolist())

    index = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        assign_cell(F.col(vec_col)).alias("cell"),
        enc(F.col(vec_col)).alias("pq_code"),
    )
    probed = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("__qv__"),
        F.explode_outer(probe_cells(F.col(vec_col))).alias("cell"),
    )
    adc = make_adc_score_udf(codebooks)
    cand = (
        index.join(probed, "cell")
        .where(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            adc(F.col("__qv__"), F.col("pq_code")).alias("score"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("neighbor_id"))
    if not refine:
        return (
            cand.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k)
            .select("query_id", "neighbor_id", "rank", "score")
        )
    short = (
        cand.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= max(refine, k))
        .select("query_id", "neighbor_id")
    )
    qv = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("__qv__"))
    cv = corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("__cv__"))
    score = make_cosine_pairs_udf()
    exact = (
        short.join(qv, "query_id")
        .join(cv, "neighbor_id")
        .select(
            "query_id",
            "neighbor_id",
            score(F.col("__qv__"), F.col("__cv__")).alias("score"),
        )
    )
    return (
        exact.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "score")
    )


def embedding_near_pairs(
    df: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    approximate: bool = True,
    nbits: int = 10,
    n_tables: int = 12,
    seed: int = 42,
) -> DataFrame:
    """(id_a, id_b, score) with id_a < id_b and cosine >= threshold.

    Approximate path, hot-bucket-safe: identical vectors collapse to one
    representative BEFORE the bucket self-join (the quadratic-at-scale
    defense — a dedup corpus puts every copy of a duplicated embedding in
    the same bucket of every table), so the self-join sees each distinct
    vector once. Candidates are 8-byte rep-id pairs only; vectors re-join
    once per side for one numpy-batched scoring pass, then surviving rep
    pairs re-expand to member pairs (identical vectors => identical
    scores). Intra-group pairs are emitted from the membership map with the
    group's self-score, gated by the threshold BEFORE expansion — a group
    that cannot pass never materializes its member pairs.

    Note the OUTPUT is still all qualifying pairs (a tied group of g copies
    owns g(g-1)/2 true pairs — that is the operator's contract, matched by
    the SQL oracle); the collapse bounds the candidate/shuffle volume, which
    is what explodes at 100x scale, not the answer itself."""
    if not approximate:
        return _exact_near_pairs_blocked(df, threshold, id_col, vec_col)
    udf = make_sign_lsh_udf(nbits, n_tables, seed)
    reps, members = _collapse_identical_vectors(df, id_col, vec_col)

    b = reps.select(
        F.col("id").alias("rep"),
        F.posexplode_outer(udf(F.col("v"))).alias("table", "bucket"),
    )
    left = b.select("table", "bucket", F.col("rep").alias("rep_a"))
    right = b.select("table", "bucket", F.col("rep").alias("rep_b"))
    cand = (
        left.join(right, ["table", "bucket"])
        .where(F.col("rep_a") < F.col("rep_b"))
        .dropDuplicates(["rep_a", "rep_b"])
    )
    va = reps.select(F.col("id").alias("rep_a"), F.col("v").alias("__va__"))
    vb = reps.select(F.col("id").alias("rep_b"), F.col("v").alias("__vb__"))
    score = make_cosine_pairs_udf()
    rep_pairs = (
        cand.join(va, "rep_a")
        .join(vb, "rep_b")
        .select("rep_a", "rep_b", score(F.col("__va__"), F.col("__vb__")).alias("score"))
        .where(F.col("score") >= threshold)
    )
    # cross-group expansion: every (member of a) x (member of b) pair
    # carries the rep pair's score; groups are disjoint so no dedup needed
    ma = members.select(F.col("rep").alias("rep_a"), F.col("id").alias("__ida__"))
    mb = members.select(F.col("rep").alias("rep_b"), F.col("id").alias("__idb__"))
    cross = (
        rep_pairs.join(ma, "rep_a")
        .join(mb, "rep_b")
        .select(
            F.least("__ida__", "__idb__").alias("id_a"),
            F.greatest("__ida__", "__idb__").alias("id_b"),
            "score",
        )
    )
    # intra-group pairs: self-score (cosine of the group's vector with
    # itself — 1.0 except degenerate zero vectors) computed once per
    # multi-member group, threshold-gated before the pair expansion
    gsize = members.groupBy("rep").agg(F.count(F.lit(1)).alias("__gn__"))
    multi = reps.join(
        gsize.where(F.col("__gn__") > 1).select("rep"),
        reps["id"] == F.col("rep"),
    ).select(F.col("rep"), F.col("v"))
    self_ok = multi.select(
        "rep", score(F.col("v"), F.col("v")).alias("score")
    ).where(F.col("score") >= threshold)
    ia = members.select("rep", F.col("id").alias("id_a"))
    ib = members.select("rep", F.col("id").alias("id_b"))
    intra = (
        self_ok.join(ia, "rep")
        .join(ib, "rep")
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "score")
    )
    return cross.unionByName(intra)


def _exact_near_pairs_blocked(
    df: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_blocks: int = 8,
) -> DataFrame:
    """Exact all-pairs cosine >= threshold via blocked matrix multiply.

    Vectors are hash-assigned to one of ``n_blocks`` blocks; each vector is
    replicated to every unordered block-pair it participates in (replication
    factor = n_blocks, vs. n for a cross join), then each block-pair group is
    scored with ONE numpy matmul inside ``applyInPandas``. Every unordered
    vector pair lands in exactly one group, so no dedup pass is needed.
    At cluster scale n_blocks ~ sqrt(parallelism) keeps groups
    executor-memory-sized while the shuffle stays O(n * n_blocks) rows.
    """
    spark = df.sparkSession
    pairs = [
        (i, j, pi)
        for pi, (i, j) in enumerate(
            (i, j) for i in range(n_blocks) for j in range(i, n_blocks)
        )
    ]
    # block -> the pair-groups it must be shipped to, with its role in each:
    # role 0 = "left" rows (block i), 1 = "right" rows (block j); diagonal
    # groups (i == j) use role 0 only and carry an explicit diag flag —
    # NEVER inferred from an empty right side, because a skewed/small corpus
    # can legitimately leave a block (and hence one side of a group) empty.
    member_rows = []
    for i, j, pi in pairs:
        diag = 1 if i == j else 0
        member_rows.append((i, pi, 0, diag))
        if j != i:
            member_rows.append((j, pi, 1, diag))
    members = spark.createDataFrame(
        member_rows, "block int, pair_id int, role int, diag int"
    )

    vecs = df.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).alias("v"),
        F.pmod(F.xxhash64(F.col(id_col)), F.lit(n_blocks)).cast("int").alias("block"),
    )
    replicated = vecs.join(F.broadcast(members), "block").select(
        "pair_id", "diag", "role", "id", "v"
    )

    empty = pd.DataFrame({"id_a": pd.Series(dtype="int64"),
                          "id_b": pd.Series(dtype="int64"),
                          "score": pd.Series(dtype="float64")})

    def score_group(pdf: pd.DataFrame) -> pd.DataFrame:
        diag = bool(pdf["diag"].iloc[0])
        left = pdf[pdf["role"] == 0]
        right = pdf[pdf["role"] == 1]
        if len(left) == 0 or (not diag and len(right) == 0):
            return empty
        lids = left["id"].to_numpy()
        lmat = np.array(left["v"].tolist(), dtype=np.float64)
        lmat /= np.maximum(np.linalg.norm(lmat, axis=1, keepdims=True), 1e-300)
        if diag:  # pairs within `left`
            rids, rmat = lids, lmat
        else:
            rids = right["id"].to_numpy()
            rmat = np.array(right["v"].tolist(), dtype=np.float64)
            rmat /= np.maximum(np.linalg.norm(rmat, axis=1, keepdims=True), 1e-300)
        scores = _round_half_up(lmat @ rmat.T)
        li, ri = np.nonzero(scores >= threshold)
        a, b = lids[li], rids[ri]
        keep = a != b
        a, b, s = a[keep], b[keep], scores[li, ri][keep]
        lo, hi = np.minimum(a, b), np.maximum(a, b)
        out = pd.DataFrame({"id_a": lo, "id_b": hi, "score": s})
        if diag:  # each within-block pair appears twice (i,j)+(j,i)
            out = out.drop_duplicates(["id_a", "id_b"])
        return out

    return replicated.groupBy("pair_id").applyInPandas(
        score_group, "id_a long, id_b long, score double"
    )
