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
