"""Synthetic image table, PNG codec, multimodal UDFs, and the combined
image+caption dedup suite with planted-truth recall."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from text_dedup_spark.config import MinHashConfig, SimHashConfig
from text_dedup_spark.functions.image_udf import image_meta, make_resize_udf, phash_from_bytes
from text_dedup_spark.kernel.union_find import UnionFind
from text_dedup_spark.plans.image_pipeline import image_dedup, verify_fidelity
from text_dedup_spark.sources.png import decode_png, encode_png, phash64, psnr
from text_dedup_spark.sources.synth import images_table, truth_table

N = 200  # 20 groups
MINHASH_CFG = MinHashConfig(ngram_size=5, num_perm=64, threshold=0.7)
SIMHASH_CFG = SimHashConfig(f=64, bit_diff=3, num_bucket=4, ngram=3)


@pytest.fixture(scope="module")
def images(spark):
    return images_table(spark, N, seed=42).persist()


@pytest.fixture(scope="module")
def truth(spark):
    return truth_table(spark, N, seed=42).persist()


def test_png_roundtrip_and_psnr():
    rng = np.random.RandomState(0)
    arr = rng.randint(0, 256, (16, 24, 3), dtype=np.uint8)
    assert (decode_png(encode_png(arr)) == arr).all()
    assert psnr(arr, arr) == float("inf")


def test_table_is_deterministic_and_schema_exact(spark, images):
    again = images_table(spark, N, seed=42)
    a = {r["image_id"]: (bytes(r["bytes"]), r["caption"], r["phash"]) for r in images.collect()}
    b = {r["image_id"]: (bytes(r["bytes"]), r["caption"], r["phash"]) for r in again.collect()}
    assert a == b
    assert images.count() == N
    assert [(f.name, f.dataType.simpleString()) for f in images.schema.fields] == [
        ("image_id", "string"), ("bytes", "binary"), ("w", "int"), ("h", "int"),
        ("fmt", "string"), ("caption", "string"), ("phash", "bigint"),
    ]


def test_stored_phash_matches_recomputed(spark, images):
    df = images.withColumn("rephash", phash_from_bytes("bytes", "fmt"))
    assert df.where(F.col("rephash") != F.col("phash")).count() == 0


def test_image_meta_and_resize(spark, images):
    meta = images.select("image_id", image_meta("bytes", "fmt").alias("m")).select(
        "image_id", "m.dec_w", "m.dec_h", "m.mean_luma"
    )
    rows = meta.collect()
    assert all(r["dec_w"] == 32 and r["dec_h"] == 32 for r in rows)
    assert all(0 < r["mean_luma"] < 255 for r in rows)

    resize = make_resize_udf(8, 8)
    small = images.limit(5).select(resize("bytes", "fmt").alias("small")).collect()
    for r in small:
        arr = decode_png(bytes(r["small"]))
        assert arr.shape == (8, 8, 3)


def _planted_pairs(truth_rows, cluster_col):
    byc = {}
    for r in truth_rows:
        byc.setdefault(r[cluster_col], []).append(r["image_id"])
    pairs = set()
    for members in byc.values():
        ms = sorted(members)
        for i in range(len(ms)):
            for j in range(i + 1, len(ms)):
                pairs.add((ms[i], ms[j]))
    return pairs


def _detected_pairs(corpus_rows, assign_rows, id_col="__id__"):
    id2img = {r[id_col]: r["image_id"] for r in corpus_rows}
    uf = UnionFind()
    for x in id2img:
        uf.find(x)
    for r in assign_rows:
        uf.union(r[id_col], r["component"])
    pairs = set()
    for c in uf.clusters().values():
        ms = sorted(id2img[x] for x in c)
        for i in range(len(ms)):
            for j in range(i + 1, len(ms)):
                pairs.add((ms[i], ms[j]))
    return pairs


def test_image_dedup_recall_on_planted_truth(spark, images, truth):
    res = image_dedup(images, MINHASH_CFG, SIMHASH_CFG)
    corpus_rows = res.corpus.select("__id__", "image_id").collect()
    truth_rows = truth.collect()

    # exact modality: recall 1.0 required (bytes are identical)
    got = _detected_pairs(corpus_rows, res.exact.collect())
    planted = _planted_pairs(truth_rows, "exact_cluster")
    assert planted <= got

    # caption near-dups: slot 1 (identical caption) + slot 2 (light edits)
    got_c = _detected_pairs(corpus_rows, res.caption_clusters.collect())
    planted_c = _planted_pairs(truth_rows, "caption_cluster")
    recall_c = len(planted_c & got_c) / len(planted_c)
    assert recall_c >= 0.99, recall_c

    # image near-dups via phash Hamming<=3: slot 1 (identical) + slot 3
    got_i = _detected_pairs(corpus_rows, res.image_clusters.collect())
    planted_i = _planted_pairs(truth_rows, "image_cluster")
    recall_i = len(planted_i & got_i) / len(planted_i)
    assert recall_i >= 0.99, recall_i

    # survivor accounting: kept + removed-by-merged == N, one rep per cluster
    assert res.kept.count() < N
    assert res.kept.select("image_id").distinct().count() == res.kept.count()


def test_fidelity_verifier_passes_identity_and_catches_corruption(spark, images):
    ok = verify_fidelity(images, images)
    assert ok.count() == 0

    # corrupt one caption -> flagged
    bad = images.withColumn(
        "caption",
        F.when(F.col("image_id") == "img-0000000000", F.lit("corrupted")).otherwise(
            F.col("caption")
        ),
    )
    flagged = verify_fidelity(images, bad).collect()
    assert {r["image_id"] for r in flagged} == {"img-0000000000"}


def _pair_set(comp_rows, idmap):
    from collections import defaultdict

    comp = defaultdict(set)
    for r in comp_rows:
        comp[r["component"]].add(r["__id__"])
        comp[r["component"]].add(r["component"])
    out = set()
    for members in comp.values():
        mm = sorted(idmap[m] for m in members)
        out.update((mm[i], mm[j]) for i in range(len(mm)) for j in range(i + 1, len(mm)))
    return out


def _truth_pair_set(truth_rows, col):
    from collections import defaultdict

    comp = defaultdict(set)
    for r in truth_rows:
        comp[r[col]].add(r["image_id"])
    out = set()
    for members in comp.values():
        mm = sorted(members)
        out.update((mm[i], mm[j]) for i in range(len(mm)) for j in range(i + 1, len(mm)))
    return out


def test_precision_and_recall_with_short_doc_policy(spark, images, truth):
    """With short docs excluded from banding (they carry no shingle
    evidence), caption MinHash achieves P=1.0 R=1.0 on the planted truth;
    the parity default ('cluster') reproduces the reference's degenerate
    all-short-docs mega-cluster instead (SURVEY §7.4)."""
    res = image_dedup(images, MINHASH_CFG, SIMHASH_CFG, short_doc_policy="keep")
    idmap = {r["__id__"]: r["image_id"] for r in res.corpus.select("__id__", "image_id").collect()}
    got = _pair_set(res.caption_clusters.collect(), idmap)
    want = _truth_pair_set(truth.collect(), "caption_cluster")
    assert got == want  # precision 1.0 AND recall 1.0

    res_parity = image_dedup(images, MINHASH_CFG, SIMHASH_CFG)
    idmap2 = {r["__id__"]: r["image_id"] for r in res_parity.corpus.select("__id__", "image_id").collect()}
    got2 = _pair_set(res_parity.caption_clusters.collect(), idmap2)
    assert want <= got2           # recall still 1.0
    assert len(got2) > len(want)  # plus the degenerate short-doc cluster
