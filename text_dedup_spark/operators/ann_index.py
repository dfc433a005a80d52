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
- the SIDECAR: centroids + PQ codebooks + params + build-time cell
  distribution in one ``.npz`` next to the table (a few MB at any corpus
  size — 4096 cells x 64 dims + 8x256 codewords), read/written through
  the Hadoop FileSystem API so it lives on the SAME filesystem as the
  table (local, HDFS, s3a, ...) rather than the driver's local disk;
- ``append``: new vectors encode with the FROZEN trainers (no retrain, no
  touch of existing cells' files) and land as additional files inside
  their cells' directories — cost scales with the new data only, matching
  ``stage_dedup_incremental``'s contract for the dedup tables;
- maintenance: ``compact_ivfpq_index`` merges each cell's accumulated
  append files into one (Iceberg ``rewrite_data_files`` analog, swap via
  FileSystem.rename so probes never see a half-written cell) and
  ``ivfpq_drift_report`` compares per-cell fill now vs at build time —
  the rebuild trigger for an index that lives through months of appends.

Reference anchor: the reference has no ANN surface at all (its nearest
analog is the band-hash checkpoint CSV, minhash_spark_onlyHash.py:383);
this is part of the beyond-parity embedding tier (SURVEY §2 A6/ANN rows).
"""

from __future__ import annotations

import io
import json
import posixpath
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


def _hadoop_fs(spark: SparkSession, path_str: str):
    """(FileSystem, Path) for ``path_str`` resolved through the session's
    Hadoop conf — the sidecar/meta blobs ride the SAME filesystem as the
    parquet table (local, HDFS, s3a, ...), not the driver's local disk."""
    jvm = spark._jvm
    jpath = jvm.org.apache.hadoop.fs.Path(path_str)
    fs = jpath.getFileSystem(spark._jsc.hadoopConfiguration())
    return fs, jpath


def _fs_write_bytes(spark: SparkSession, path_str: str, data: bytes) -> None:
    fs, jpath = _hadoop_fs(spark, path_str)
    out = fs.create(jpath, True)
    try:
        out.write(bytearray(data))
    finally:
        out.close()


def _fs_read_bytes(spark: SparkSession, path_str: str) -> bytes:
    fs, jpath = _hadoop_fs(spark, path_str)
    stream = fs.open(jpath)
    try:
        sink = spark._jvm.java.io.ByteArrayOutputStream()
        spark._jvm.org.apache.hadoop.io.IOUtils.copyBytes(stream, sink, 65536, False)
        return bytes(sink.toByteArray())
    finally:
        stream.close()


@dataclass(frozen=True)
class IvfPqIndex:
    path: str
    centroids: np.ndarray  # (n_centroids, dim) unit rows
    codebooks: np.ndarray  # (m, 2**nbits, dim/m)
    meta: dict
    built_cells: dict | None = None  # cell -> row count at build time

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
    spark = corpus.sparkSession
    # build-time per-cell fill (read back from the written table: exact,
    # one column-pruned scan of the fresh codes) — the drift report's
    # training-distribution anchor
    built = {
        int(r["cell"]): int(r["n"])
        for r in spark.read.parquet(path).groupBy("cell").agg(
            F.count(F.lit(1)).alias("n")).collect()  # <= n_centroids rows
    }
    idx = IvfPqIndex(
        path=path, centroids=cents, codebooks=codebooks,
        meta={**idx.meta, "built_rows": int(sum(built.values()))},
        built_cells=built,
    )
    _write_sidecar(spark, idx)
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
    meta = json.loads(
        _fs_read_bytes(spark, posixpath.join(path, _META)).decode("utf-8"))
    blob = np.load(io.BytesIO(_fs_read_bytes(spark, posixpath.join(path, _SIDECAR))))
    built = (
        {int(c): int(n) for c, n in zip(blob["cell_ids"], blob["cell_counts"])}
        if "cell_ids" in blob.files
        else None  # pre-drift-report sidecar: no build-time distribution
    )
    return IvfPqIndex(
        path=path, centroids=blob["centroids"],
        codebooks=blob["codebooks"], meta=meta, built_cells=built,
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


def _write_sidecar(spark: SparkSession, index: IvfPqIndex) -> None:
    built = index.built_cells or {}
    cell_ids = np.array(sorted(built), dtype=np.int64)
    buf = io.BytesIO()
    np.savez(
        buf, centroids=index.centroids, codebooks=index.codebooks,
        cell_ids=cell_ids,
        cell_counts=np.array([built[c] for c in cell_ids], dtype=np.int64),
    )
    _fs_write_bytes(spark, posixpath.join(index.path, _SIDECAR), buf.getvalue())
    _fs_write_bytes(
        spark, posixpath.join(index.path, _META),
        json.dumps(index.meta).encode("utf-8"),
    )


def compact_ivfpq_index(spark: SparkSession, index: IvfPqIndex) -> dict:
    """Merge each cell's accumulated small files into ONE file per cell —
    the index analog of Iceberg's ``rewrite_data_files``. Repeated
    ``append`` calls leave one file per (append job task, cell); months of
    appends turn every probe into a many-small-files scan. The rewrite is
    a single shuffle: hash-repartition by ``cell`` puts each cell's rows
    in exactly one task, so ``partitionBy("cell")`` emits one file per
    cell. Data lands in a sibling temp dir first and the cell directories
    are swapped via FileSystem.rename, so probes never see a half-written
    cell; the sidecar/meta blobs are untouched (codes are re-laid-out,
    never re-encoded). Returns {files_before, files_after, rows}."""
    table = spark.read.parquet(index.path)
    files_before = table.select(F.input_file_name()).distinct().count()
    rows = table.count()
    tmp = index.path.rstrip("/") + "__compact_tmp"
    table.repartition("cell").write.mode("overwrite").partitionBy(
        "cell").parquet(tmp)
    fs, root = _hadoop_fs(spark, index.path)
    jpath = spark._jvm.org.apache.hadoop.fs.Path
    for st in fs.listStatus(jpath(tmp)):
        name = st.getPath().getName()
        if not name.startswith("cell="):
            continue
        dst = jpath(root, name)
        fs.delete(dst, True)
        fs.rename(st.getPath(), dst)
    fs.delete(jpath(tmp), True)
    files_after = (
        spark.read.parquet(index.path).select(F.input_file_name())
        .distinct().count()
    )
    return {"files_before": files_before, "files_after": files_after,
            "rows": rows}


def ivfpq_drift_report(spark: SparkSession, index: IvfPqIndex) -> DataFrame:
    """Per-cell fill now vs at build time: ``(cell, built_rows,
    current_rows, built_frac, current_frac, drift)`` where ``drift`` =
    current_frac - built_frac. Appends encode with FROZEN trainers, so
    when the appended distribution shifts, rows pile into cells the
    centroids under-represent and recall sags; 0.5 * sum(|drift|) (total
    variation distance, one agg over <= n_centroids rows) is the rebuild
    trigger a maintenance job should alarm on. One column-pruned scan of
    the code table; everything else is <= n_centroids rows."""
    if index.built_cells is None:
        raise ValueError(
            "index sidecar predates drift tracking — rebuild to record the "
            "build-time cell distribution")
    built_total = max(1, sum(index.built_cells.values()))
    built_df = spark.createDataFrame(
        [(int(c), int(n)) for c, n in sorted(index.built_cells.items())],
        "cell int, built_rows long",
    )
    cur = spark.read.parquet(index.path).groupBy("cell").agg(
        F.count(F.lit(1)).alias("current_rows"))
    joined = built_df.join(cur, "cell", "full_outer").select(
        "cell",
        F.coalesce("built_rows", F.lit(0)).alias("built_rows"),
        F.coalesce("current_rows", F.lit(0)).alias("current_rows"),
    )
    total = joined.agg(F.sum("current_rows")).collect()[0][0] or 1
    return joined.select(
        "cell", "built_rows", "current_rows",
        (F.col("built_rows") / F.lit(float(built_total))).alias("built_frac"),
        (F.col("current_rows") / F.lit(float(total))).alias("current_frac"),
        (
            F.col("current_rows") / F.lit(float(total))
            - F.col("built_rows") / F.lit(float(built_total))
        ).alias("drift"),
    ).orderBy("cell")
