"""Staged (checkpointed, resumable) image+caption pipeline tests:
- result equals the one-shot image_dedup survivors on the same input;
- resume skips completed stages (checkpoints untouched);
- metrics + per-partition lineage rows recorded."""

from __future__ import annotations

import os

import pytest

from text_dedup_spark.config import MinHashConfig, SimHashConfig
from text_dedup_spark.plans.image_pipeline import image_dedup
from text_dedup_spark.plans.staged_image import run_staged_image
from text_dedup_spark.sources.catalog import ParquetCatalog
from text_dedup_spark.sources.synth import images_table

MC = MinHashConfig(ngram_size=5, num_perm=64, threshold=0.7)
SC = SimHashConfig(f=64, bit_diff=3, num_bucket=4, ngram=3)


@pytest.fixture(scope="module")
def images(spark):
    return images_table(spark, 300, seed=42).persist()


def test_staged_matches_one_shot(spark, images, tmp_path_factory):
    base = str(tmp_path_factory.mktemp("ckpt"))
    catalog = ParquetCatalog(spark, base)
    out = run_staged_image(catalog, {"imgs": images}, MC, SC)
    kept_staged = {
        r["image_id"] for r in catalog.read("imgs__kept").select("image_id").collect()
    }
    res = image_dedup(images, MC, SC)
    kept_oneshot = {r["image_id"] for r in res.kept.select("image_id").collect()}
    assert kept_staged == kept_oneshot
    assert out["imgs"][0] == len(kept_staged)
    assert out["imgs"][0] + out["imgs"][1] == 300


def test_staged_resume_skips_completed(spark, images, tmp_path_factory):
    base = str(tmp_path_factory.mktemp("ckpt2"))
    catalog = ParquetCatalog(spark, base)
    run_staged_image(catalog, {"imgs": images}, MC, SC)
    # record checkpoint mtimes, re-run, nothing rewritten
    paths = [catalog.path(n) + "/_SUCCESS"
             for n in ("imgs__feats", "imgs__bands", "clusters", "imgs__kept")]
    mtimes = [os.path.getmtime(p) for p in paths]
    out = run_staged_image(catalog, {"imgs": images}, MC, SC)
    assert [os.path.getmtime(p) for p in paths] == mtimes
    assert out["imgs"][0] + out["imgs"][1] == 300


def test_staged_metrics_and_lineage(spark, images, tmp_path_factory):
    base = str(tmp_path_factory.mktemp("ckpt3"))
    catalog = ParquetCatalog(spark, base)
    run_staged_image(catalog, {"imgs": images}, MC, SC)
    metrics = catalog.read("metrics")
    stages = {r["stage"] for r in metrics.select("stage").collect()}
    assert {"features", "cluster", "apply"} <= stages
    lineage = catalog.read("lineage")
    assert lineage.count() > 0
    assert {"run_id", "stage"} <= set(lineage.columns)


def test_staged_cross_dataset_dedup(spark, tmp_path_factory):
    """Duplicates that span datasets must be caught by the global cluster
    stage — the whole point of the reference's split-hash/global-dedup
    scheme (SURVEY §3.2). Dataset B = a re-keyed copy of half of A's rows:
    exact byte duplicates across datasets."""
    from pyspark.sql import functions as F

    base = images_table(spark, 100, seed=42).persist()
    a = base
    b = base.where(F.col("image_id") < "img-0000000050").withColumn(
        "image_id", F.concat(F.lit("dsB-"), F.col("image_id"))
    )
    catalog = ParquetCatalog(spark, str(tmp_path_factory.mktemp("xds")))
    out = run_staged_image(catalog, {"A": a, "B": b}, MC, SC)
    kept_a, removed_a = out["A"]
    kept_b, removed_b = out["B"]
    assert kept_a + removed_a == 100 and kept_b + removed_b == 50
    # Correct invariant: ONE survivor per merged cluster. Exact-byte
    # clusters span datasets (and slots within a group), so across both
    # outputs every distinct byte-content must appear EXACTLY once.
    kept_all = catalog.read("A__kept").select("bytes").unionByName(
        catalog.read("B__kept").select("bytes")
    )
    kept_hashes = [r[0] for r in kept_all.select(F.sha2("bytes", 256)).collect()]
    assert len(kept_hashes) == len(set(kept_hashes))  # no content kept twice
    all_hashes = {
        r[0]
        for r in base.select(F.sha2("bytes", 256)).collect()
    }
    # every distinct input content still represented (clusters keep one)...
    # unless a near-dup modality merged distinct contents into one cluster,
    # in which case kept <= distinct contents
    assert set(kept_hashes) <= all_hashes
    assert len(set(kept_hashes)) >= len(all_hashes) * 0.5
