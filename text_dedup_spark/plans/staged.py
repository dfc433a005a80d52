"""The 3-stage checkpointed MinHash pipeline — the fork's TB-scale path
(SURVEY §3.2), rebuilt on typed checkpoint tables.

Stage A  hash    per dataset: id-stamp the corpus, compute signatures, write
                 ``<ds>__withid`` (id-stamped snapshot, checkpoint 1) and
                 ``<ds>__bands`` (id, band, band_hash — checkpoint 2).
                 Replaces minhash_spark_onlyHash.py (driver readlines /
                 single-partition row_number / b64 CSV all gone).
Stage B  dedup   global, across datasets: one multi-path scan of all band
                 checkpoints -> edges -> connected components -> ``clusters``
                 (id, component — checkpoint 3).
                 Replaces minhash_spark_loadHashAndDedup.py.
Stage C  remove  per dataset: left_anti/left_semi split against ``clusters``
                 -> ``<ds>__kept`` / ``<ds>__removed``.
                 Replaces minhash_spark_onlyRemove.py (incl. its rm_df bug).

Resume: every stage is idempotent (overwrite) and ``run_staged`` skips a
stage whose outputs already exist unless ``force`` — restartable from any of
the three checkpoints, the reference's PREV_ID side-channel file replaced by
dense id offsets carried in the id-stamped snapshots themselves.

Cross-job id disjointness: Stage A takes ``start_id`` (= 1 + max id of the
previously stamped dataset, ids.max_id) exactly like PREV_ID
(onlyHash.py:307-309) but stored in data, not a local file.
"""

from __future__ import annotations

import uuid

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..config import MinHashConfig
from ..operators.apply import split_survivors
from ..operators.cc import connected_components
from ..operators.ids import ID, assign_dense_ids, max_id
from ..operators.lsh import band_rows, candidate_edges
from .metrics import Timer, log_metric, log_partition_lineage


def withid_name(ds: str) -> str:
    return f"{ds}__withid"


def bands_name(ds: str) -> str:
    return f"{ds}__bands"


def stage_hash(
    catalog,
    df: DataFrame,
    text_col: str,
    cfg: MinHashConfig,
    dataset: str,
    start_id: int = 0,
    run_id: str | None = None,
    short_doc_policy: str = "cluster",
    bucket_by_id: int | None = None,
) -> int:
    """Returns max assigned id (next dataset starts at max+1).

    ``bucket_by_id``: write the id-stamped snapshot hash-bucketed on id into
    that many buckets. Stage C's survivor split then joins it against an
    equally-bucketed cluster table with NO exchange — the wide corpus rows
    (payload bytes at 100 TB) never reshuffle after this one write."""
    run_id = run_id or uuid.uuid4().hex
    t = Timer()
    with t("hash"):
        stamped = assign_dense_ids(df, ID, start=start_id)
        if bucket_by_id:
            catalog.write_bucketed(stamped, withid_name(dataset), ID, bucket_by_id)
            stamped = catalog.read_bucketed(withid_name(dataset))
        else:
            catalog.write(stamped, withid_name(dataset))
            stamped = catalog.read(withid_name(dataset))  # read back: one compute
        bands = band_rows(stamped, text_col, cfg, ID, short_doc_policy=short_doc_policy)
        catalog.write(bands, bands_name(dataset))
    written = catalog.read(bands_name(dataset))
    rows_in = stamped.count()
    rows_out = written.count()
    log_metric(catalog, run_id, "hash", dataset, rows_in, rows_out, t.elapsed_times["hash"])
    log_partition_lineage(catalog, run_id, f"hash:{dataset}", written)
    return max_id(stamped, ID)


def stage_dedup(
    catalog,
    datasets: list[str],
    run_id: str | None = None,
    clusters_table: str = "clusters",
    hot_threshold: int | None = None,
    bucket_by_id: int | None = None,
) -> DataFrame:
    run_id = run_id or uuid.uuid4().hex
    t = Timer()
    with t("dedup"):
        bands = catalog.read_many([bands_name(ds) for ds in datasets])
        edges = candidate_edges(bands, ID, hot_threshold=hot_threshold)
        assignments = connected_components(edges, ID)
        if bucket_by_id:
            catalog.write_bucketed(assignments, clusters_table, ID, bucket_by_id)
        else:
            catalog.write(assignments, clusters_table)
    out = (catalog.read_bucketed if bucket_by_id else catalog.read)(clusters_table)
    log_metric(
        catalog, run_id, "dedup", ",".join(datasets), bands.count(), out.count(),
        t.elapsed_times["dedup"],
    )
    log_partition_lineage(catalog, run_id, "dedup", out)
    return out


def stage_dedup_incremental(
    catalog,
    old_datasets: list[str],
    new_datasets: list[str],
    run_id: str | None = None,
    clusters_table: str = "clusters",
    hot_threshold: int | None = None,
    bucket_by_id: int | None = None,
) -> DataFrame:
    """Stage B for GROWING corpora: fold newly hashed datasets into an
    existing cluster table without re-clustering the whole corpus.

    Exactness argument (assignments are proven bit-equal to a full
    ``stage_dedup`` over old+new in tests/test_staged_pipeline.py):
    - only LSH buckets containing at least one NEW id can generate edges
      that did not exist before, so the bucket-min aggregation runs over
      just those buckets (semi-join of all band rows against the distinct
      new (band, band_hash) keys — for hit buckets it sees the same
      old+new membership the full pass would);
    - connectivity among old-only rows is carried by the previous
      assignment table itself, replayed as (id -> component) edges: CC of
      a roots-absent star assignment reproduces exactly its components;
    - a new row bridging two old clusters merges them in the combined CC,
      and component ids stay the global cluster-min either way.

    Scale shape: the expensive parts — signature hashing of old datasets
    (skipped: checkpoints) and the bucket-min shuffle over the full corpus
    (now only hit buckets) — scale with the NEW data volume, not the
    corpus. The old band checkpoints are still scanned once (narrow
    columns) to find hit-bucket members; the prior assignment table
    re-enters CC as edges (O(duplicates), << corpus)."""
    bands_new = catalog.read_many([bands_name(ds) for ds in new_datasets])
    bands_old = catalog.read_many([bands_name(ds) for ds in old_datasets])
    return _fold_new_bands(
        catalog, bands_old, bands_new, ",".join(new_datasets), run_id,
        clusters_table, hot_threshold, bucket_by_id)


def stage_dedup_incremental_snapshot(
    catalog,
    since_snapshot_id: int | None,
    run_id: str | None = None,
    bands_table: str = "bands",
    clusters_table: str = "clusters",
    hot_threshold: int | None = None,
    bucket_by_id: int | None = None,
    to_snapshot_id: int | None = None,
) -> DataFrame:
    """Snapshot-checkpointed Stage B for a SINGLE growing bands table
    (NativeIcebergCatalog backends): old bands = time-travel read at the
    last folded snapshot, new bands = the incremental append scan since it
    — no per-dataset band checkpoints, no rescan of consumed history at
    plan time (planning opens only the new appends' manifests).

    The consumption loop is: append freshly hashed bands to
    ``bands_table``; pin ``to = catalog.current_snapshot_id(bands_table)``;
    fold ``(since, to]``; checkpoint ``to``. Pinning ``to`` makes the fold
    immune to appends racing in behind it. Exactness matches
    ``stage_dedup_incremental`` — same fold core, proven bit-equal to a
    full ``stage_dedup`` in tests."""
    if to_snapshot_id is None:
        to_snapshot_id = catalog.current_snapshot_id(bands_table)
    bands_new = catalog.read_incremental(
        bands_table, since_snapshot_id, to_snapshot_id)
    if since_snapshot_id is None:
        bands_old = bands_new.limit(0)
    else:
        bands_old = catalog.read_at(bands_table, since_snapshot_id)
    return _fold_new_bands(
        catalog, bands_old, bands_new,
        f"{bands_table}@({since_snapshot_id},{to_snapshot_id}]", run_id,
        clusters_table, hot_threshold, bucket_by_id)


def _fold_new_bands(
    catalog,
    bands_old: DataFrame,
    bands_new: DataFrame,
    source_desc: str,
    run_id: str | None,
    clusters_table: str,
    hot_threshold: int | None,
    bucket_by_id: int | None,
) -> DataFrame:
    run_id = run_id or uuid.uuid4().hex
    t = Timer()
    with t("dedup_inc"):
        hit = bands_new.select("band", "band_hash").distinct()
        relevant = bands_old.join(hit, ["band", "band_hash"], "left_semi").unionByName(
            bands_new.select(*bands_old.columns)
        )
        new_edges = candidate_edges(relevant, ID, hot_threshold=hot_threshold)
        if catalog.exists(clusters_table):
            prev = (catalog.read_bucketed if catalog.is_bucketed(clusters_table)
                    else catalog.read)(clusters_table)
            edges = new_edges.unionByName(prev.select(
                F.col(ID).alias("src"), F.col("component").alias("dst")))
        else:  # first fold of a fresh corpus: nothing to carry
            edges = new_edges
        assignments = connected_components(edges, ID)
        # overwrite-in-place would drop the old table before the plan that
        # reads it runs: stage through a temp checkpoint, then swap
        tmp = f"{clusters_table}__incoming"
        if bucket_by_id:
            catalog.write_bucketed(assignments, tmp, ID, bucket_by_id)
            catalog.write_bucketed(catalog.read_bucketed(tmp), clusters_table, ID, bucket_by_id)
        else:
            catalog.write(assignments, tmp)
            catalog.write(catalog.read(tmp), clusters_table)
    out = (catalog.read_bucketed if bucket_by_id else catalog.read)(clusters_table)
    log_metric(
        catalog, run_id, "dedup_inc", source_desc,
        bands_new.count(), out.count(), t.elapsed_times["dedup_inc"],
    )
    log_partition_lineage(catalog, run_id, "dedup_inc", out)
    return out


def stage_remove(
    catalog,
    dataset: str,
    run_id: str | None = None,
    clusters_table: str = "clusters",
) -> tuple[int, int]:
    """Returns (kept_rows, removed_rows). When both the id-stamped snapshot
    and the cluster table were written bucketed on id (stage_hash/stage_dedup
    ``bucket_by_id``), the anti/semi joins below are exchange-free — proven
    by plan assertion in tests/test_bucketed.py."""
    run_id = run_id or uuid.uuid4().hex
    t = Timer()
    with t("remove"):
        rd = lambda n: (  # noqa: E731
            catalog.read_bucketed(n) if catalog.is_bucketed(n) else catalog.read(n)
        )
        corpus = rd(withid_name(dataset))
        clusters = rd(clusters_table)
        kept, removed = split_survivors(corpus, clusters, ID)
        catalog.write(kept, f"{dataset}__kept")
        catalog.write(removed, f"{dataset}__removed")
    kept_n = catalog.read(f"{dataset}__kept").count()
    removed_n = catalog.read(f"{dataset}__removed").count()
    log_metric(catalog, run_id, "remove", dataset, kept_n + removed_n, kept_n, t.elapsed_times["remove"])
    return kept_n, removed_n


def run_staged(
    catalog,
    inputs: dict[str, DataFrame],
    text_col: str,
    cfg: MinHashConfig | None = None,
    force: bool = False,
    bucket_by_id: int | None = None,
) -> dict[str, tuple[int, int]]:
    """Full A->B->C run over named datasets, resuming past completed
    checkpoints. Returns per-dataset (kept, removed) counts."""
    cfg = (cfg or MinHashConfig()).resolve()
    run_id = uuid.uuid4().hex

    next_id = 0
    for ds, df in inputs.items():
        if force or not (catalog.exists(withid_name(ds)) and catalog.exists(bands_name(ds))):
            next_id = stage_hash(
                catalog, df, text_col, cfg, ds, start_id=next_id, run_id=run_id,
                bucket_by_id=bucket_by_id,
            ) + 1
        else:
            next_id = max_id(catalog.read(withid_name(ds)), ID) + 1

    if force or not catalog.exists("clusters"):
        stage_dedup(catalog, list(inputs), run_id=run_id, bucket_by_id=bucket_by_id)

    results = {}
    for ds in inputs:
        if force or not (catalog.exists(f"{ds}__kept") and catalog.exists(f"{ds}__removed")):
            results[ds] = stage_remove(catalog, ds, run_id=run_id)
        else:
            results[ds] = (
                catalog.read(f"{ds}__kept").count(),
                catalog.read(f"{ds}__removed").count(),
            )
    return results


def audit_split_vs_merged(
    catalog,
    datasets: list[str],
    text_col: str,
    cfg: MinHashConfig,
    short_doc_policy: str = "cluster",
) -> dict:
    """Checkpoint-fidelity audit (show_splitHashesDiff.py:276-297 as a
    production tool, not just a test): the union of the per-dataset band
    checkpoints must equal the bands of the merged id-stamped corpus hashed
    in one pass. Returns diff counts, computed distributed (exceptAll both
    ways — no driver materialization of the band sets; the reference
    subtracts RDDs then collects)."""
    from functools import reduce

    ck = reduce(
        DataFrame.unionByName,
        [catalog.read(bands_name(ds)) for ds in datasets],
    ).select(ID, "band", "band_hash")
    merged = reduce(
        DataFrame.unionByName,
        [catalog.read(withid_name(ds)) for ds in datasets],
    )
    fresh = band_rows(
        merged, text_col, cfg, ID, short_doc_policy=short_doc_policy
    ).select(ID, "band", "band_hash")
    only_ck = ck.exceptAll(fresh).count()
    only_fresh = fresh.exceptAll(ck).count()
    return {
        "checkpoint_rows": ck.count(),
        "only_in_checkpoint": only_ck,
        "only_in_fresh": only_fresh,
        "ok": only_ck == 0 and only_fresh == 0,
    }
