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


def test_staged_features_flag_policy(spark, tmp_path):
    """stage_features(undecodable='flag') checkpoints decode_ok; the
    cluster stage excludes flagged rows from the phash modality but they
    still dedup by exact bytes."""
    from text_dedup_spark.config import MinHashConfig, SimHashConfig
    from text_dedup_spark.plans.staged_image import (
        bands_name,
        feats_name,
        stage_apply,
        stage_cluster,
        stage_features,
    )
    from text_dedup_spark.sources.catalog import ParquetCatalog
    from text_dedup_spark.sources.jpeg import encode_jpeg_baseline
    from text_dedup_spark.sources.png import encode_png

    import numpy as np
    from pyspark.sql import functions as F

    def rand_img(seed):
        rng = np.random.RandomState(seed)
        return (rng.rand(32, 32, 3) * 255).astype(np.uint8)

    def undecodable(img):
        data = bytearray(encode_jpeg_baseline(img, 1))
        sof = data.index(b"\xff\xc0")
        data[sof + 1] = 0xCA  # progressive arithmetic: valid format, no codec
        # (SOF9 sequential arithmetic DECODES as of round 4)
        return bytes(data)

    def cap(i):
        rng = np.random.RandomState(500 + i)
        return " ".join(f"v{rng.randint(100000)}" for _ in range(30))

    rows = []
    for i in range(5):
        rows.append((f"g{i}", bytearray(encode_png(rand_img(i))), 32, 32, "png", cap(i), 0))
    pb = undecodable(rand_img(77))
    rows.append(("p0", bytearray(pb), 32, 32, "jpeg", cap(100), 0))
    rows.append(("p1", bytearray(pb), 32, 32, "jpeg", cap(100), 0))  # exact clone
    schema = "image_id string, bytes binary, w int, h int, fmt string, caption string, phash long"
    df = spark.createDataFrame(rows, schema)

    catalog = ParquetCatalog(spark, str(tmp_path / "ck_flag"))
    mc = MinHashConfig(ngram_size=5, num_perm=64, threshold=0.7)
    stage_features(catalog, df, mc, "d1", phash_source="pixels", undecodable="flag")
    feats = catalog.read(feats_name("d1"))
    assert "decode_ok" in feats.columns
    flagged = {r["image_id"] for r in feats.where(~F.col("decode_ok")).collect()}
    assert flagged == {"p0", "p1"}
    assert feats.where(F.col("decode_ok") & F.col("phash").isNull()).count() == 0

    stage_cluster(catalog, ["d1"], SimHashConfig(f=64, bit_diff=3, num_bucket=4, ngram=3))
    kept_n, removed_n = stage_apply(catalog, df, "d1")
    kept = {r["image_id"] for r in catalog.read("d1__kept").collect()}
    # the byte-exact undecodable clone is removed via the exact modality
    assert ("p0" in kept) != ("p1" in kept)
    assert {f"g{i}" for i in range(5)} <= kept
    assert kept_n + removed_n == 7


def test_image_dedup_identical_across_deployments():
    """The north-star job returns the SAME survivors on a REAL
    multi-executor deployment (local-cluster: separate executor JVMs,
    socket shuffles, package shipped via spark.submit.pyFiles from the
    deploy zip) as on the single-JVM local[k] proxy — deployment topology
    cannot change answers. Uses its own sessions (not the shared fixture)
    because master/pyFiles are session-level."""
    import os
    import subprocess
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    script = """
import sys
sys.path.insert(0, %(repo)r)
from text_dedup_spark.sources.session import build_session
from text_dedup_spark.config import MinHashConfig, SimHashConfig
from text_dedup_spark.plans.image_pipeline import image_dedup
from text_dedup_spark.sources.synth import images_table

spark = build_session(master=%(master)r, shuffle_partitions=4,
                      app_name="xdeploy", extra_conf=%(conf)r)
imgs = images_table(spark, 4000, seed=11).persist()
imgs.count()
res = image_dedup(imgs, MinHashConfig(ngram_size=5, num_perm=64, threshold=0.7),
                  SimHashConfig(f=64, bit_diff=3, num_bucket=4, ngram=3),
                  phash_source="pixels", hot_threshold=50_000)
ids = sorted(r["image_id"] for r in res.kept.select("image_id").collect())
import hashlib
print("KEPT", len(ids), hashlib.sha256("|".join(ids).encode()).hexdigest())
spark.stop()
"""

    def run(master, conf):
        out = subprocess.run(
            [sys.executable, "-c", script % {"repo": repo, "master": master, "conf": conf}],
            capture_output=True, text=True, check=True, cwd=repo,
        )
        return [l for l in out.stdout.splitlines() if l.startswith("KEPT")][-1]

    sys.path.insert(0, os.path.join(repo, "tools"))
    try:
        from make_pyfiles import build as build_zip
    finally:
        sys.path.pop(0)
    zip_path = build_zip("/tmp/spark_graft_pyfiles/text_dedup_spark_test.zip")

    local = run("local[4]", {"spark.sql.adaptive.enabled": "false"})
    cluster = run(
        "local-cluster[2,2,3072]",
        {
            "spark.sql.adaptive.enabled": "false",
            "spark.executor.memory": "2g",
            "spark.submit.pyFiles": zip_path,
        },
    )
    assert local == cluster  # same survivor ids, same order, same hash


def test_combined_phash_embedding_udf_parity(spark):
    """One-decode combined UDF must equal the two separate UDFs bit-for-bit
    (phash) / value-for-value (embedding)."""
    import numpy as np

    from text_dedup_spark.functions.image_udf import (
        image_embedding,
        phash_embedding_from_bytes,
        phash_from_bytes,
    )
    from text_dedup_spark.sources.png import encode_png

    rng = np.random.RandomState(37)
    rows = [
        (i, bytearray(encode_png(rng.randint(0, 256, size=(h, w, 3)).astype("uint8"))), "png")
        for i, (h, w) in enumerate([(16, 16), (32, 24), (7, 5), (9, 40)])
    ]
    df = spark.createDataFrame(rows, "img_id long, bytes binary, fmt string")
    combined = {
        r["img_id"]: (r["pe"]["phash"], r["pe"]["embedding"])
        for r in df.select(
            "img_id", phash_embedding_from_bytes("bytes", "fmt").alias("pe")
        ).collect()
    }
    separate = {
        r["img_id"]: (r["ph"], r["emb"])
        for r in df.select(
            "img_id",
            phash_from_bytes("bytes", "fmt").alias("ph"),
            image_embedding("bytes", "fmt").alias("emb"),
        ).collect()
    }
    assert combined == separate


def test_staged_image_fourth_modality(spark, tmp_path):
    """Staged pipeline with pixel_embedding_eps: the embedding lives in the
    feats CHECKPOINT (stage B decodes nothing) and the ramp-overlay pair
    that defeats the phash Hamming budget is collapsed."""
    import numpy as np

    from text_dedup_spark.config import MinHashConfig
    from text_dedup_spark.plans.staged_image import run_staged_image
    from text_dedup_spark.sources.catalog import ParquetCatalog
    from text_dedup_spark.sources.png import encode_png

    def block_image(seed):
        rng = np.random.RandomState(seed)
        levels = rng.randint(40, 216, size=(8, 8))
        base = np.repeat(np.repeat(levels, 4, 0), 4, 1)
        base = np.clip(base + rng.randint(-6, 7, size=(32, 32)), 0, 235)
        return np.stack([base] * 3, axis=2).astype(np.uint8)

    base = block_image(27)
    ramp = np.linspace(0, 30, 32).astype(np.int32)[None, :, None]
    variant = np.clip(base.astype(np.int32) + ramp, 0, 255).astype(np.uint8)
    imgs = [base, variant] + [block_image(s) for s in (301, 302, 303)]
    rows = [
        (f"img-{i}", bytearray(encode_png(img)), "png",
         f"unique caption {i} " + "pad " * 20, 0)
        for i, img in enumerate(imgs)
    ]
    df = spark.createDataFrame(
        rows, "image_id string, bytes binary, fmt string, caption string, phash long"
    )
    cat = ParquetCatalog(spark, str(tmp_path / "wh4"))
    out = run_staged_image(
        cat, {"d": df}, minhash_cfg=MinHashConfig(num_perm=32),
        phash_source="pixels", pixel_embedding_eps=0.98,
        embedding_n_clusters=2,  # must sit well below the corpus size
    )
    assert out["d"] == (4, 1)
    feats = cat.read("d__feats")
    assert "emb" in feats.columns and feats.count() == 5
    removed = {r["image_id"] for r in cat.read("d__removed").collect()}
    assert removed == {"img-1"}
