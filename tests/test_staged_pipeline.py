"""3-stage checkpointed pipeline: end-to-end equivalence with the one-shot
pipeline, resume-from-checkpoint idempotence, and the reference's own
split-vs-merged fidelity property (show_splitHashesDiff.py:296-297)."""

import pytest

from text_dedup_spark.config import MinHashConfig
from text_dedup_spark.kernel.oracle import minhash_oracle
from text_dedup_spark.operators.ids import ID
from text_dedup_spark.operators.lsh import band_rows
from text_dedup_spark.plans.staged import bands_name, run_staged, withid_name
from text_dedup_spark.sources.catalog import ParquetCatalog

from conftest import synth_corpus

CFG = MinHashConfig(ngram_size=3, num_perm=16, threshold=0.7)


@pytest.fixture()
def catalog(spark, tmp_path):
    return ParquetCatalog(spark, str(tmp_path / "warehouse"))


def _inputs(spark):
    corpus = synth_corpus(200, seed=11)
    half = len(corpus) // 2
    ds_a = spark.createDataFrame([(t,) for _, t in corpus[:half]], "text string")
    ds_b = spark.createDataFrame([(t,) for _, t in corpus[half:]], "text string")
    return corpus, {"a": ds_a, "b": ds_b}


def test_staged_matches_oracle_and_resumes(spark, catalog):
    corpus, inputs = _inputs(spark)
    results = run_staged(catalog, inputs, "text", CFG)

    # oracle over the stamped ids (read back the actual id assignment)
    stamped = []
    for ds in inputs:
        for r in catalog.read(withid_name(ds)).collect():
            stamped.append((r[ID], r["text"]))
    assert len(stamped) == len(corpus)
    ids = [i for i, _ in stamped]
    assert sorted(ids) == list(range(len(corpus)))  # dense, cross-dataset disjoint

    oracle = minhash_oracle(stamped, CFG)
    expect_removed = set(oracle.components().keys())
    clusters = catalog.read("clusters")
    got_map = {r[ID]: r["component"] for r in clusters.collect()}
    assert got_map == oracle.components()

    total_kept = sum(k for k, _ in results.values())
    total_removed = sum(r for _, r in results.values())
    assert total_removed == len(expect_removed)
    assert total_kept == len(corpus) - len(expect_removed)

    # resume: wipe nothing, run again -> all checkpoints reused, same counts
    results2 = run_staged(catalog, inputs, "text", CFG)
    assert results2 == results

    # resume from checkpoint 2: delete only the cluster + stage-C outputs
    import shutil

    for name in ["clusters", "a__kept", "a__removed", "b__kept", "b__removed"]:
        shutil.rmtree(catalog.path(name))
    results3 = run_staged(catalog, inputs, "text", CFG)
    assert results3 == results


def test_split_vs_merged_hash_fidelity(spark, catalog):
    # hashing datasets separately then unioning band rows must equal hashing
    # the union (the reference's own fidelity check for the staged scheme)
    corpus, inputs = _inputs(spark)
    run_staged(catalog, inputs, "text", CFG)
    split_bands = {
        (r[ID], r["band"], r["band_hash"])
        for ds in inputs
        for r in catalog.read(bands_name(ds)).collect()
    }
    merged_corpus = catalog.read(withid_name("a")).unionByName(
        catalog.read(withid_name("b"))
    )
    merged_bands = {
        (r[ID], r["band"], r["band_hash"])
        for r in band_rows(merged_corpus, "text", CFG, ID).collect()
    }
    assert split_bands == merged_bands


def test_metrics_and_lineage_written(spark, catalog):
    _, inputs = _inputs(spark)
    run_staged(catalog, inputs, "text", CFG)
    metrics = catalog.read("metrics")
    stages = {r["stage"] for r in metrics.collect()}
    assert {"hash", "dedup", "remove"} <= stages
    lineage = catalog.read("lineage")
    assert lineage.count() > 0
    assert set(lineage.columns) == {"run_id", "stage", "partition", "rows"}


def test_incremental_dedup_equals_full_recompute(spark, tmp_path):
    """Folding a new dataset into an existing cluster table
    (stage_dedup_incremental) must produce EXACTLY the assignments of a
    full stage_dedup over all band checkpoints."""
    from text_dedup_spark.plans.staged import (
        run_staged,
        stage_dedup,
        stage_dedup_incremental,
        stage_hash,
    )

    corpus = synth_corpus(180, seed=31)
    third = len(corpus) // 3
    cfg = MinHashConfig(num_perm=64)
    ds = {
        "a": spark.createDataFrame([(t,) for _, t in corpus[:third]], "text string"),
        "b": spark.createDataFrame(
            [(t,) for _, t in corpus[third : 2 * third]], "text string"
        ),
    }
    # the new dataset overlaps BOTH old datasets (synth_corpus duplicates
    # reference random source docs) plus fresh material
    new_df = spark.createDataFrame(
        [(t,) for _, t in corpus[2 * third :]], "text string"
    )

    cat = ParquetCatalog(spark, str(tmp_path / "wh"))
    run_staged(cat, ds, "text", cfg)
    from text_dedup_spark.operators.ids import max_id
    start = max_id(cat.read(withid_name("b")), ID) + 1
    stage_hash(cat, new_df, "text", cfg, "c", start_id=start)

    inc = stage_dedup_incremental(cat, ["a", "b"], ["c"])
    inc_set = {(r[ID], r["component"]) for r in inc.collect()}

    full = stage_dedup(cat, ["a", "b", "c"], clusters_table="clusters_full")
    full_set = {(r[ID], r["component"]) for r in full.collect()}
    assert inc_set == full_set and len(inc_set) > 0


def test_incremental_dedup_merges_old_clusters(spark, tmp_path):
    """A new row whose bands bridge two previously-distinct clusters must
    merge them — pinned with hand-built band checkpoints (deterministic
    bucket collisions, no MinHash probability involved)."""
    from text_dedup_spark.plans.staged import stage_dedup, stage_dedup_incremental

    cat = ParquetCatalog(spark, str(tmp_path / "wh"))
    old = spark.createDataFrame(
        [(1, 0, 111), (2, 0, 111),   # cluster A via bucket 111
         (3, 0, 222), (4, 0, 222),   # cluster B via bucket 222
         (9, 0, 999)],               # singleton
        f"{ID} long, band int, band_hash long",
    )
    cat.write(old, bands_name("old"))
    stage_dedup(cat, ["old"])
    before = {(r[ID], r["component"]) for r in cat.read("clusters").collect()}
    assert before == {(2, 1), (4, 3)}

    bridge = spark.createDataFrame(
        [(10, 0, 111), (10, 0, 222)], f"{ID} long, band int, band_hash long"
    )
    cat.write(bridge, bands_name("newds"))
    inc = stage_dedup_incremental(cat, ["old"], ["newds"])
    got = {(r[ID], r["component"]) for r in inc.collect()}
    assert got == {(2, 1), (3, 1), (4, 1), (10, 1)}  # A+B+bridge merged; 9 untouched

    full = stage_dedup(cat, ["old", "newds"], clusters_table="clusters_full")
    assert got == {(r[ID], r["component"]) for r in full.collect()}


def test_snapshot_incremental_dedup_equals_full(spark, tmp_path):
    """Snapshot-checkpointed Stage B over ONE growing Iceberg bands table
    (stage_dedup_incremental_snapshot): each fold consumes exactly the
    appended delta (read_incremental) against a time-travel read of the
    already-folded history, and the final assignments are bit-equal to a
    full stage_dedup over all band checkpoints."""
    from text_dedup_spark.operators.ids import max_id
    from text_dedup_spark.plans.staged import (
        stage_dedup,
        stage_dedup_incremental_snapshot,
        stage_hash,
    )
    from text_dedup_spark.sources.iceberg import NativeIcebergCatalog

    corpus = synth_corpus(150, seed=13)
    cfg = MinHashConfig(num_perm=64)
    cat = NativeIcebergCatalog(spark, str(tmp_path / "wh"))
    third = len(corpus) // 3
    batches = [corpus[:third], corpus[third: 2 * third], corpus[2 * third:]]
    start, mark, inc = 0, None, None
    for i, batch in enumerate(batches):
        df = spark.createDataFrame([(t,) for _, t in batch], "text string")
        stage_hash(cat, df, "text", cfg, f"d{i}", start_id=start)
        start = max_id(cat.read(withid_name(f"d{i}")), ID) + 1
        cat.append(cat.read(bands_name(f"d{i}")), "bands")
        to = cat.current_snapshot_id("bands")
        inc = stage_dedup_incremental_snapshot(cat, mark, to_snapshot_id=to)
        mark = to
    inc_set = {(r[ID], r["component"]) for r in inc.collect()}
    full = stage_dedup(cat, ["d0", "d1", "d2"], clusters_table="clusters_full")
    full_set = {(r[ID], r["component"]) for r in full.collect()}
    assert inc_set == full_set and len(inc_set) > 0
