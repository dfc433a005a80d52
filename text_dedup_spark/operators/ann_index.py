"""Persisted IVF-PQ index: build once, query many times, append O(new).

``ivfpq_topk`` (operators/ann.py) trains + encodes + queries in one job —
right for a one-shot dedup pass, wrong for the serving shape of a
10^12-vector corpus, where the index is built ONCE (hours), appended
incrementally (minutes), and probed constantly (sub-second). This module
persists that state:

- the index TABLE: ``(id long, pq_code binary)`` parquet rows written
  ``partitionBy("cell")`` — one directory per coarse cell, so a probe of
  ``n_probe`` cells is a STATIC PARTITION-PRUNED scan reading
  n_probe/n_centroids of the data (plan-asserted in tests; the engine's
  disk analog of FAISS's inverted lists);
- the SIDECAR: centroids + PQ codebooks + params in one ``.npz`` next to
  the table (a few MB at any corpus size — 4096 cells x 64 dims + 8x256
  codewords; an object-store backend would put/get the same blob);
- ``append``: new vectors encode with the FROZEN trainers (no retrain, no
  touch of existing cells' files) and land as additional files inside
  their cells' directories — cost scales with the new data only, matching
  ``stage_dedup_incremental``'s contract for the dedup tables.

Reference anchor: the reference has no ANN surface at all (its nearest
analog is the band-hash checkpoint CSV, minhash_spark_onlyHash.py:383);
this is part of the beyond-parity embedding tier (SURVEY §2 A6/ANN rows).
"""

from __future__ import annotations

import io
import json
import os
from dataclasses import dataclass

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql.pandas.functions import pandas_udf

from .ann import (
    make_adc_score_udf,
    make_cell_assign_udf,
    make_cosine_pairs_udf,
    make_pq_encode_udf,
    train_centroids,
    train_pq,
)

_SIDECAR = "_ann_sidecar.npz"
_META = "_ann_meta.json"


@dataclass(frozen=True)
class IvfPqIndex:
    path: str
    centroids: np.ndarray  # (n_centroids, dim) unit rows
    codebooks: np.ndarray  # (m, 2**nbits, dim/m)
    meta: dict

    @property
    def n_centroids(self) -> int:
        return self.centroids.shape[0]


def build_ivfpq_index(
    corpus: DataFrame,
    path: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_centroids: int = 64,
    m: int = 8,
    nbits: int = 8,
    kmeans_iterations: int = 2,
) -> IvfPqIndex:
    """Train coarse cells + PQ codebooks on ``corpus`` and persist the
    cell-partitioned code table at ``path``. One full corpus pass: the
    trainers see bounded driver samples (train_pq/train_centroids docs),
    the encode+write is a single distributed job."""
    codebooks = train_pq(corpus, id_col, vec_col, m, nbits)
    cents = train_centroids(corpus, id_col, vec_col, n_centroids, kmeans_iterations)
    idx = IvfPqIndex(
        path=path, centroids=cents, codebooks=codebooks,
        meta={
            "id_col": id_col, "vec_col": vec_col,
            "n_centroids": int(n_centroids), "m": int(m), "nbits": int(nbits),
            "dim": int(cents.shape[1]),
        },
    )
    # parquet overwrite first (it clears the directory), sidecar after
    _encode_rows(corpus, idx).write.mode("overwrite").partitionBy("cell").parquet(path)
    _write_sidecar(idx)
    return idx


def append_to_ivfpq_index(index: IvfPqIndex, new_corpus: DataFrame) -> None:
    """Encode ``new_corpus`` with the index's FROZEN trainers and append
    inside the existing cell directories — O(new rows), nothing retrained,
    no existing file rewritten. (Drift policy is the caller's: when the
    appended distribution shifts far enough that recall sags, rebuild —
    the sidecar's trainers make staleness measurable by re-scoring a
    sample.)"""
    _encode_rows(new_corpus, index).write.mode("append").partitionBy(
        "cell").parquet(index.path)


def load_ivfpq_index(spark: SparkSession, path: str) -> IvfPqIndex:
    with open(os.path.join(path, _META)) as f:
        meta = json.load(f)
    with open(os.path.join(path, _SIDECAR), "rb") as f:
        blob = np.load(io.BytesIO(f.read()))
        return IvfPqIndex(
            path=path, centroids=blob["centroids"],
            codebooks=blob["codebooks"], meta=meta,
        )


def ivfpq_index_topk(
    spark: SparkSession,
    index: IvfPqIndex,
    queries: DataFrame,
    k: int,
    n_probe: int = 8,
    refine: int = 0,
    corpus: DataFrame | None = None,
) -> DataFrame:
    """(query_id, neighbor_id, rank, score) from the PERSISTED index.

    The probed cell set (<= nq x n_probe ids, driver-bounded) becomes a
    static ``cell IN (...)`` filter on the parquet read — partition
    pruning keeps the scan at n_probe/n_centroids of the table, which is
    the entire point of the IVF layout on disk. ``refine`` > 0 re-ranks
    the top ADC candidates with exact cosine and needs the raw ``corpus``
    frame (the index stores codes only — at 10^12 rows the raw vectors
    live in the warehouse table, joined here by id exactly once)."""
    id_col, vec_col = index.meta["id_col"], index.meta["vec_col"]
    cents = index.centroids
    n_probe = min(n_probe, index.n_centroids)

    @pandas_udf("array<int>")
    def probe_cells(vecs: pd.Series) -> pd.Series:
        mat = np.array(vecs.tolist(), dtype=np.float64)
        mat /= np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-300)
        idx_ = np.argsort(-(mat @ cents.T), axis=1)[:, :n_probe].astype(np.int32)
        return pd.Series(idx_.tolist())

    probed = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("__qv__"),
        F.explode_outer(probe_cells(F.col(vec_col))).alias("cell"),
    )
    # the union of probed cells is small and driver-known: collect it and
    # push a literal partition filter into the scan (static pruning beats
    # relying on DPP for a <=nq*n_probe-element set)
    cells = sorted({r["cell"] for r in probed.select("cell").distinct().collect()})
    table = spark.read.parquet(index.path).where(F.col("cell").isin(cells))
    adc = make_adc_score_udf(index.codebooks)
    cand = (
        table.join(probed, "cell")
        .where(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id", "neighbor_id",
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
    if corpus is None:
        raise ValueError("refine > 0 needs the raw corpus frame (codes-only index)")
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
            "query_id", "neighbor_id",
            score(F.col("__qv__"), F.col("__cv__")).alias("score"),
        )
    )
    return (
        exact.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "score")
    )


def _encode_rows(corpus: DataFrame, index: IvfPqIndex) -> DataFrame:
    id_col, vec_col = index.meta["id_col"], index.meta["vec_col"]
    assign = make_cell_assign_udf(index.centroids)
    enc = make_pq_encode_udf(index.codebooks)
    return corpus.select(
        F.col(id_col).alias("neighbor_id"),
        assign(F.col(vec_col)).alias("cell"),
        enc(F.col(vec_col)).alias("pq_code"),
    )


def _write_sidecar(index: IvfPqIndex) -> None:
    os.makedirs(index.path, exist_ok=True)
    buf = io.BytesIO()
    np.savez(buf, centroids=index.centroids, codebooks=index.codebooks)
    with open(os.path.join(index.path, _SIDECAR), "wb") as f:
        f.write(buf.getvalue())
    with open(os.path.join(index.path, _META), "w") as f:
        json.dump(index.meta, f)
