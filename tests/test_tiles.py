"""Crop/partial-duplicate detection via tile phashes."""

import numpy as np
from pyspark.sql import functions as F

from text_dedup_spark.functions.image_udf import tile_phashes
from text_dedup_spark.operators.tiles import crop_match_edges
from text_dedup_spark.sources.png import encode_png, phash64


def _img(seed, h=32, w=48):
    return np.random.default_rng(seed).integers(0, 256, (h, w, 3), dtype=np.uint8)


def _tiles_df(spark, imgs):
    rows = [(iid, encode_png(a), "png") for iid, a in imgs]
    df = spark.createDataFrame(rows, "image_id string, bytes binary, fmt string")
    return df.select(
        "image_id", F.posexplode(tile_phashes("bytes", "fmt")).alias("tile", "fp")
    )


def test_tile_phashes_match_kernel(spark):
    a = _img(0)
    t = {r["tile"]: r["fp"] for r in _tiles_df(spark, [("a", a)]).collect()}
    h2, w2 = 16, 24

    def s64(x):
        return x - (1 << 64) if x >= (1 << 63) else x

    assert t[0] == s64(phash64(a))
    assert t[1] == s64(phash64(a[:h2, :w2]))
    assert t[4] == s64(phash64(a[h2:, w2:]))
    assert len(t) == 5
    # tiny image: full-frame hash only
    tiny = {r["tile"] for r in _tiles_df(spark, [("t", _img(1, 12, 12))]).collect()}
    assert tiny == {0}


def test_crop_match_planted(spark):
    hosts = [(f"host-{i}", _img(i)) for i in range(6)]
    crops = []
    for i, (hid, a) in enumerate(hosts[:4]):
        q = i % 4
        h2, w2 = 16, 24
        quad = [a[:h2, :w2], a[:h2, w2:], a[h2:, :w2], a[h2:, w2:]][q]
        crops.append((f"crop-{i}", quad, q))
    tiles = _tiles_df(spark, hosts + [(cid, img) for cid, img, _ in crops])
    edges = crop_match_edges(tiles, "image_id").collect()
    got = {(r["crop_id"], r["host_id"], r["host_tile"]): r["dist"] for r in edges}
    want = {(f"crop-{i}", f"host-{i}", q + 1): 0 for i, (_, _, q) in enumerate(crops)}
    assert got == want  # exactly the planted matches, dist 0, no FPs


def test_crop_match_identical_crop_collapse(spark):
    a = _img(9)
    quad = a[:16, :24]
    # three identical crops: query-side collapse must still return ALL of
    # them (re-expansion), plus the crop-vs-crop exact matches
    imgs = [("host-x", a), ("c1", quad), ("c2", quad), ("c3", quad)]
    edges = crop_match_edges(_tiles_df(spark, imgs), "image_id").collect()
    by_crop = {}
    for r in edges:
        by_crop.setdefault(r["crop_id"], set()).add((r["host_id"], r["host_tile"]))
    for c in ("c1", "c2", "c3"):
        assert ("host-x", 1) in by_crop[c], c
