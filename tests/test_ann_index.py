"""Persisted IVF-PQ index (operators/ann_index.py): build / load / probe /
append, with the disk layout doing the scan pruning.

Correctness oracle: a driver-side numpy re-derivation PARAMETERIZED BY THE
INDEX'S OWN sidecar trainers (centroids + codebooks) — candidate cells,
ADC lookup scores, shortlist, exact refine all recomputed independently of
the Spark probe path (same technique as kernel/oracle_values.py, without
the k-means replication hazard since both sides read identical arrays).
"""

from __future__ import annotations

import glob
import os

import numpy as np
import pytest

from text_dedup_spark.operators.ann import (
    adc_scores_numpy,
    pq_codes_numpy,
)
from text_dedup_spark.operators.ann_index import (
    append_to_ivfpq_index,
    build_ivfpq_index,
    ivfpq_index_topk,
    load_ivfpq_index,
)

N, DIM, NC = 400, 32, 16


def formatted_plan(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def _vectors(n, seed, start=0):
    rng = np.random.RandomState(seed)
    mat = rng.normal(size=(n, DIM)).astype(np.float32)
    return [(start + i, mat[i].tolist()) for i in range(n)]


@pytest.fixture(scope="module")
def built(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("annidx") / "idx")
    rows = _vectors(N, seed=3)
    corpus = spark.createDataFrame(rows, ["vec_id", "embedding"])
    index = build_ivfpq_index(
        corpus, path, n_centroids=NC, m=8, nbits=8)
    return path, rows, corpus, index


def _numpy_topk(index, rows, query_rows, k, n_probe, refine):
    """Independent probe/ADC/refine on the sidecar trainers."""
    ids = np.array([i for i, _ in rows], dtype=np.int64)
    mat = np.array([v for _, v in rows], dtype=np.float64)
    unit = mat / np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-300)
    cells = (unit @ index.centroids.T).argmax(axis=1)
    codes = pq_codes_numpy(mat, index.codebooks)
    norms = np.linalg.norm(mat, axis=1)
    out = []
    for qid, qv in query_rows:
        q = np.asarray(qv, dtype=np.float64)
        qu = q / max(np.linalg.norm(q), 1e-300)
        probe = np.argsort(-(qu @ index.centroids.T))[: min(n_probe, NC)]
        cand = np.flatnonzero(np.isin(cells, probe) & (ids != qid))
        adc = adc_scores_numpy(
            np.broadcast_to(qu, (cand.size, DIM)).copy(),
            codes[cand], index.codebooks)
        adc = np.sign(adc) * np.floor(np.abs(adc) * 1e6 + 0.5) / 1e6
        order = sorted(range(cand.size), key=lambda i: (-adc[i], ids[cand[i]]))
        if refine:
            short = cand[[i for i in order[: max(refine, k)]]]
            dots = mat[short] @ q
            sc = dots / np.maximum(norms[short] * np.linalg.norm(q), 1e-300)
            sc = np.sign(sc) * np.floor(np.abs(sc) * 1e6 + 0.5) / 1e6
            order2 = sorted(range(short.size), key=lambda i: (-sc[i], ids[short[i]]))
            out += [(qid, int(ids[short[i]]), r + 1, float(sc[i]))
                    for r, i in enumerate(order2[:k])]
        else:
            out += [(qid, int(ids[cand[i]]), r + 1, float(adc[i]))
                    for r, i in enumerate(order[:k])]
    return set(out)


def test_roundtrip_and_probe_matches_numpy(spark, built):
    path, rows, corpus, index = built
    loaded = load_ivfpq_index(spark, path)
    assert np.array_equal(loaded.centroids, index.centroids)
    assert np.array_equal(loaded.codebooks, index.codebooks)

    queries = corpus.where("vec_id < 4")
    got = {tuple(r) for r in
           ivfpq_index_topk(spark, loaded, queries, 5, n_probe=4).collect()}
    exp = _numpy_topk(loaded, rows, [r for r in rows if r[0] < 4], 5, 4, 0)
    assert got == exp


def test_refined_probe_matches_numpy_and_needs_corpus(spark, built):
    path, rows, corpus, index = built
    queries = corpus.where("vec_id < 4")
    got = {tuple(r) for r in ivfpq_index_topk(
        spark, index, queries, 5, n_probe=4, refine=20, corpus=corpus).collect()}
    exp = _numpy_topk(index, rows, [r for r in rows if r[0] < 4], 5, 4, 20)
    assert got == exp
    with pytest.raises(ValueError, match="corpus"):
        ivfpq_index_topk(spark, index, queries, 5, refine=20)


def test_probe_scan_is_partition_pruned(spark, built):
    """The whole point of the on-disk IVF layout: the probed-cell filter
    reaches the parquet source as a partition filter, so the scan reads
    n_probe/n_centroids of the table (cell dirs prove the layout)."""
    path, rows, corpus, index = built
    assert len(glob.glob(os.path.join(path, "cell=*"))) > NC // 2
    queries = corpus.where("vec_id < 2")
    plan = formatted_plan(
        ivfpq_index_topk(spark, index, queries, 5, n_probe=2))
    scan = [ln for ln in plan.splitlines() if "PartitionFilters" in ln]
    assert scan and any("cell" in ln for ln in scan)
    # the literal IN-filter, not a catch-all
    assert not any("PartitionFilters: []" in ln for ln in scan)


def test_append_is_o_new_and_visible(spark, built):
    path, rows, corpus, index = built
    before = {f for f in glob.glob(os.path.join(path, "cell=*", "*"))}
    new_rows = _vectors(40, seed=11, start=10_000)
    append_to_ivfpq_index(
        index, spark.createDataFrame(new_rows, ["vec_id", "embedding"]))
    after = {f for f in glob.glob(os.path.join(path, "cell=*", "*"))}
    # append only ADDS files — nothing existing rewritten (O(new) contract)
    assert before <= after and len(after) > len(before)

    all_rows = rows + new_rows
    queries = spark.createDataFrame(
        [r for r in new_rows[:3]], ["vec_id", "embedding"])
    got = {tuple(r) for r in
           ivfpq_index_topk(spark, index, queries, 5, n_probe=4).collect()}
    exp = _numpy_topk(index, all_rows, new_rows[:3], 5, 4, 0)
    assert got == exp

def test_compact_one_file_per_cell_same_topk(spark, built):
    """Verdict r4 #7: append-then-compact returns identical top-k, and the
    rewrite leaves exactly one file per cell directory."""
    from text_dedup_spark.operators.ann_index import compact_ivfpq_index

    path, rows, corpus, index = built
    extra = _vectors(40, seed=23, start=20_000)
    append_to_ivfpq_index(
        index, spark.createDataFrame(extra, ["vec_id", "embedding"]))
    queries = corpus.where("vec_id < 3")
    before = {tuple(r) for r in
              ivfpq_index_topk(spark, index, queries, 5, n_probe=4).collect()}
    assert any(
        len(glob.glob(os.path.join(d, "*.parquet"))) > 1
        for d in glob.glob(os.path.join(path, "cell=*"))
    ), "appends should have produced multi-file cells to compact"

    stats = compact_ivfpq_index(spark, index)
    assert stats["files_after"] < stats["files_before"]
    for d in glob.glob(os.path.join(path, "cell=*")):
        assert len(glob.glob(os.path.join(d, "*.parquet"))) == 1
    # no half-written temp left behind
    assert not glob.glob(path.rstrip("/") + "__compact_tmp")

    after = {tuple(r) for r in
             ivfpq_index_topk(spark, index, queries, 5, n_probe=4).collect()}
    assert after == before
    # row count preserved exactly
    assert spark.read.parquet(path).count() == stats["rows"]


def test_drift_report_tracks_appends(spark, built):
    """built_frac reflects the sidecar's build-time distribution; appends
    move current_frac away from it and the drift column shows the gap."""
    from pyspark.sql import functions as F

    from text_dedup_spark.operators.ann_index import ivfpq_drift_report

    path, rows, corpus, index = built
    loaded = load_ivfpq_index(spark, path)  # sidecar round-trips the counts
    assert loaded.built_cells == index.built_cells
    assert sum(index.built_cells.values()) == N

    rep = ivfpq_drift_report(spark, loaded).collect()
    total_current = sum(r["current_rows"] for r in rep)
    assert total_current == spark.read.parquet(path).count() > N  # appends landed
    assert sum(r["built_rows"] for r in rep) == N
    for r in rep:
        assert abs(
            r["drift"] - (r["current_frac"] - r["built_frac"])) < 1e-12
    tvd = sum(abs(r["drift"]) for r in rep) / 2
    assert 0.0 <= tvd <= 1.0

    df = ivfpq_drift_report(spark, loaded)
    assert df.columns == [
        "cell", "built_rows", "current_rows",
        "built_frac", "current_frac", "drift"]
    # same-seed appends barely move the distribution
    got_tvd = df.agg((F.sum(F.abs(F.col("drift"))) / 2).alias("t")).collect()[0]["t"]
    assert abs(got_tvd - tvd) < 1e-12


def test_sidecar_rides_hadoop_fs_scheme_path(spark, tmp_path):
    """ADVICE r4: sidecar/meta must go through the Hadoop FileSystem API so
    a non-driver-local index path works. An explicit ``file:`` URI exercises
    that routing end to end (local open() on the raw string would fail)."""
    path = "file://" + str(tmp_path / "fsidx")
    rows = _vectors(120, seed=7)
    corpus = spark.createDataFrame(rows, ["vec_id", "embedding"])
    index = build_ivfpq_index(corpus, path, n_centroids=8, m=4, nbits=8)
    loaded = load_ivfpq_index(spark, path)
    assert np.array_equal(loaded.centroids, index.centroids)
    assert loaded.built_cells == index.built_cells
    got = ivfpq_index_topk(
        spark, loaded, corpus.where("vec_id < 2"), 3, n_probe=3).count()
    assert got == 6
