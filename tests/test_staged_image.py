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
