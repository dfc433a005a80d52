"""Semantic dedup (SemDeDup) vs a pure-python all-pairs oracle.

With n_clusters=1 the within-cell approximation vanishes, so the operator
must match a brute-force rounded-cosine union-find EXACTLY (groups and
survivors). Separate tests pin the keep policy, the identical-vector
collapse path, scaled copies (cosine 1.0 without byte equality), zero
vectors, and the multi-cell plumbing on well-separated blobs.
"""

import numpy as np
import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, FloatType, LongType, StructField, StructType

from text_dedup_spark.operators.semdedup import semantic_dedup

SCHEMA = StructType(
    [
        StructField("vec_id", LongType()),
        StructField("embedding", ArrayType(FloatType())),
    ]
)


def make_df(spark, ids, vecs):
    rows = [(int(i), [float(x) for x in v]) for i, v in zip(ids, vecs)]
    return spark.createDataFrame(rows, SCHEMA).repartition(4)


def round_half_up(x, digits=6):
    s = 10.0**digits
    return np.sign(x) * np.floor(np.abs(x) * s + 0.5) / s


def py_groups(ids, vecs, eps):
    """Brute-force: all-pairs rounded cosine >= eps -> union-find groups.
    Matches the engine's numerics: float32 storage, float64 math, guarded
    norms (zero vectors have self-similarity 0)."""
    mat = np.array(vecs, dtype=np.float32).astype(np.float64)
    mat /= np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-300)
    sims = round_half_up(mat @ mat.T)
    n = len(ids)
    parent = list(range(n))

    def find(i):
        while parent[i] != i:
            parent[i] = parent[parent[i]]
            i = parent[i]
        return i

    for i in range(n):
        for j in range(i + 1, n):
            if sims[i, j] >= eps:
                ri, rj = find(i), find(j)
                if ri != rj:
                    parent[ri] = rj
    groups = {}
    for i in range(n):
        groups.setdefault(find(i), []).append(ids[i])
    return [sorted(g) for g in groups.values() if len(g) > 1]


def py_min_id_assignments(ids, vecs, eps):
    out = set()
    for g in py_groups(ids, vecs, eps):
        root = min(g)
        out.update((i, root) for i in g if i != root)
    return out


def collect_assignments(df):
    return {(r["vec_id"], r["component"]) for r in df.collect()}


def test_single_cell_matches_bruteforce(spark):
    rng = np.random.RandomState(11)
    vecs = list(rng.normal(size=(40, 8)))
    # planted structure: exact copies, scaled copies, light perturbations
    vecs.append(vecs[3].copy())
    vecs.append(vecs[3] * 2.0)
    vecs.append(vecs[7] + rng.normal(scale=1e-3, size=8))
    vecs.append(vecs[12].copy())
    vecs.append(vecs[12].copy())
    ids = list(range(100, 100 + len(vecs)))
    rng.shuffle(ids)

    got = collect_assignments(
        semantic_dedup(
            make_df(spark, ids, vecs), eps=0.98, n_clusters=1, keep="min_id"
        )
    )
    assert got == py_min_id_assignments(ids, vecs, eps=0.98)


def test_scaled_copies_group_without_byte_equality(spark):
    rng = np.random.RandomState(3)
    base = rng.normal(size=16)
    vecs = [base, base * 2.0, base * 0.5] + list(rng.normal(size=(10, 16)))
    ids = list(range(len(vecs)))
    got = collect_assignments(
        semantic_dedup(make_df(spark, ids, vecs), eps=0.99, n_clusters=2, keep="min_id")
    )
    assert got == {(1, 0), (2, 0)}


def test_identical_collapse_lone_group_and_zero_vectors(spark):
    rng = np.random.RandomState(5)
    copies = 200
    v = rng.normal(size=12)
    vecs = [v.copy() for _ in range(copies)] + list(rng.normal(size=(20, 12)))
    vecs += [np.zeros(12), np.zeros(12)]  # never grouped: self-cosine 0
    ids = list(range(len(vecs)))
    rng.shuffle(ids)
    id_of = {i: ids[i] for i in range(len(vecs))}

    got = collect_assignments(
        semantic_dedup(make_df(spark, ids, vecs), eps=0.999, n_clusters=4, keep="low")
    )
    copy_ids = sorted(id_of[i] for i in range(copies))
    root = copy_ids[0]  # equal centroid-sims tie-break to min id
    assert got == {(i, root) for i in copy_ids[1:]}


def test_keep_low_keeps_farthest_from_centroid(spark):
    # one tight duplicate group at three distinct angles to the centroid,
    # plus fillers that pin the centroid near the x-axis
    group = [
        [1.0, 0.00, 0.0],
        [1.0, 0.06, 0.0],
        [1.0, 0.12, 0.0],  # farthest from centroid -> the keep="low" survivor
    ]
    fillers = [[1.0, -0.5, 0.0], [1.0, -0.8, 0.35], [0.9, -0.6, -0.35]]
    vecs = group + fillers
    ids = [10, 11, 12, 50, 51, 52]
    df = make_df(spark, ids, vecs)
    low = collect_assignments(
        semantic_dedup(df, eps=0.995, n_clusters=1, keep="low")
    )
    assert low == {(10, 12), (11, 12)}
    high = collect_assignments(
        semantic_dedup(df, eps=0.995, n_clusters=1, keep="high")
    )
    assert high == {(11, 10), (12, 10)}


def test_multi_cell_blobs(spark):
    """Well-separated orthogonal blobs with planted near-dups: every
    planted pair must group (the pair is near-identical, so it shares a
    cell under any centroid layout) and no cross-blob pair may ever group
    (cosine across blobs ~ 0 << eps)."""
    rng = np.random.RandomState(9)
    dim, blobs, per = 16, 5, 12
    vecs, ids = [], []
    expected = set()
    for b in range(blobs):
        axis = np.zeros(dim)
        axis[b] = 1.0
        for i in range(per):
            ids.append(b * 100 + i)
            vecs.append(axis * 10 + rng.normal(scale=0.5, size=dim))
        # planted near-dup of this blob's first member
        ids.append(b * 100 + 99)
        vecs.append(vecs[-per] + rng.normal(scale=1e-3, size=dim))
        expected.add((b * 100 + 99, b * 100))
    got = collect_assignments(
        semantic_dedup(
            make_df(spark, ids, vecs), eps=0.999, n_clusters=blobs, keep="min_id"
        )
    )
    assert got == expected


def test_bad_keep_policy_rejected(spark):
    with pytest.raises(ValueError):
        semantic_dedup(make_df(spark, [0], [np.ones(4)]), eps=0.9, keep="best")


# --- image-space semantic dedup (image_embedding -> semantic_dedup) --------


def _block_image(seed):
    """32x32 image with strong 8x8 block structure (levels 40..215 + small
    pixel noise) — the regime where the centered block-mean embedding has
    high variance and affine/smooth perturbations stay near cosine 1."""
    rng = np.random.RandomState(seed)
    levels = rng.randint(40, 216, size=(8, 8))
    base = np.repeat(np.repeat(levels, 4, 0), 4, 1)
    base = np.clip(base + rng.randint(-6, 7, size=(32, 32)), 0, 235)
    return np.stack([base] * 3, axis=2).astype(np.uint8)


def test_image_semantic_dedup_catches_what_phash_misses(spark):
    """A smooth column-ramp overlay (+0..30) flips SIX phash bits (so the
    Hamming-<=3 phash dedup misses the pair) but keeps the block-intensity
    correlation at 0.984 — the embedding tier groups it at eps=0.98."""
    from text_dedup_spark.functions.image_udf import image_embedding
    from text_dedup_spark.sources.png import encode_png, phash64

    base = _block_image(27)
    ramp = np.linspace(0, 30, 32).astype(np.int32)[None, :, None]
    variant = np.clip(base.astype(np.int32) + ramp, 0, 255).astype(np.uint8)
    assert bin(phash64(base) ^ phash64(variant)).count("1") > 3  # phash misses
    others = [_block_image(s) for s in (101, 102, 103, 104)]

    rows = [
        (i, encode_png(img), "png")
        for i, img in enumerate([base, variant] + others)
    ]
    df = spark.createDataFrame(rows, "img_id long, bytes binary, fmt string")
    embedded = df.select(
        "img_id", image_embedding("bytes", "fmt").alias("embedding")
    )
    got = {
        (r["img_id"], r["component"])
        for r in semantic_dedup(
            embedded, eps=0.98, id_col="img_id", n_clusters=2, keep="min_id"
        ).collect()
    }
    assert got == {(1, 0)}


def test_image_embedding_affine_brightness_invariant(spark):
    """Gain (x2) and offset (+30) variants embed to the SAME direction
    (centered block means scale/translate exactly), so they group at
    cosine 1.0; flat images embed to the zero vector and never group."""
    from text_dedup_spark.functions.image_udf import image_embedding
    from text_dedup_spark.sources.png import encode_png

    rng = np.random.RandomState(13)
    base = rng.randint(10, 121, size=(16, 16, 3)).astype(np.uint8)
    gain = (base * 2).astype(np.uint8)          # <= 240, no clipping
    offset = (base + 30).astype(np.uint8)       # <= 150, no clipping
    flat1 = np.full((16, 16, 3), 77, np.uint8)
    flat2 = np.full((16, 16, 3), 200, np.uint8)
    distinct = rng.randint(10, 121, size=(16, 16, 3)).astype(np.uint8)
    rows = [
        (i, encode_png(img), "png")
        for i, img in enumerate([base, gain, offset, flat1, flat2, distinct])
    ]
    df = spark.createDataFrame(rows, "img_id long, bytes binary, fmt string")
    embedded = df.select(
        "img_id", image_embedding("bytes", "fmt").alias("embedding")
    )
    got = {
        (r["img_id"], r["component"])
        for r in semantic_dedup(
            embedded, eps=0.99, id_col="img_id", n_clusters=2, keep="min_id"
        ).collect()
    }
    assert got == {(1, 0), (2, 0)}


def test_hot_cell_blocked_path_matches_bruteforce(spark):
    """cell_cap forces the blocked-edges + distributed-CC path (no task
    holds the whole cell); output must equal both the pure-python oracle
    and the single-task path on the same input."""
    rng = np.random.RandomState(17)
    vecs = list(rng.normal(size=(120, 6)))
    for s in (2, 9, 9, 30):  # planted copies / near-copies
        vecs.append(np.asarray(vecs[s]) * rng.uniform(0.5, 2.0))
    ids = list(range(len(vecs)))
    rng.shuffle(ids)
    df = make_df(spark, ids, vecs)

    blocked = collect_assignments(
        semantic_dedup(df, eps=0.95, n_clusters=1, keep="min_id", cell_cap=30)
    )
    single = collect_assignments(
        semantic_dedup(df, eps=0.95, n_clusters=1, keep="min_id", cell_cap=None)
    )
    assert blocked == single == py_min_id_assignments(ids, vecs, eps=0.95)

    # keep policy flows through the big-cell path too (csim join)
    b_low = collect_assignments(
        semantic_dedup(df, eps=0.95, n_clusters=1, keep="low", cell_cap=30)
    )
    s_low = collect_assignments(
        semantic_dedup(df, eps=0.95, n_clusters=1, keep="low", cell_cap=None)
    )
    assert b_low == s_low


def test_mixed_small_and_big_cells(spark):
    """Two well-separated blobs, one above and one below the cap: the big
    blob takes the blocked path, the small one the single-task path, and
    the union must equal the uncapped run."""
    rng = np.random.RandomState(23)
    vecs, ids = [], []
    big_axis, small_axis = np.zeros(8), np.zeros(8)
    big_axis[0] = 10.0
    small_axis[4] = 10.0
    for i in range(60):
        ids.append(i)
        vecs.append(big_axis + rng.normal(scale=0.4, size=8))
    for i in range(10):
        ids.append(1000 + i)
        vecs.append(small_axis + rng.normal(scale=0.4, size=8))
    vecs.append(vecs[0] * 1.5)  # planted dup in the big blob
    ids.append(5000)
    vecs.append(vecs[60] * 2.0)  # planted dup in the small blob
    ids.append(6000)
    df = make_df(spark, ids, vecs)
    capped = collect_assignments(
        semantic_dedup(df, eps=0.999, n_clusters=2, keep="min_id", cell_cap=30)
    )
    uncapped = collect_assignments(
        semantic_dedup(df, eps=0.999, n_clusters=2, keep="min_id", cell_cap=None)
    )
    assert capped == uncapped
    assert (5000, 0) in capped and (6000, 1000) in capped


def test_image_pipeline_fourth_modality(spark):
    """The opt-in pixel-embedding modality collapses a ramp-overlay pair
    the 3-modality pipeline misses (6 flipped phash bits > bit_diff 3,
    different bytes, different captions)."""
    from text_dedup_spark.config import MinHashConfig
    from text_dedup_spark.plans.image_pipeline import image_dedup
    from text_dedup_spark.sources.png import encode_png

    base = _block_image(27)
    ramp = np.linspace(0, 30, 32).astype(np.int32)[None, :, None]
    variant = np.clip(base.astype(np.int32) + ramp, 0, 255).astype(np.uint8)
    others = [_block_image(s) for s in (201, 202, 203)]
    rows = []
    for i, img in enumerate([base, variant] + others):
        rows.append((f"img-{i}", bytearray(encode_png(img)), "png",
                     f"unique caption number {i} " + "pad " * 20, 0))
    df = spark.createDataFrame(
        rows, "image_id string, bytes binary, fmt string, caption string, phash long"
    )
    cfg = MinHashConfig(num_perm=32)

    three = image_dedup(df, minhash_cfg=cfg, phash_source="pixels")
    assert three.kept.count() == 5  # ramp pair NOT collapsed

    four = image_dedup(
        df, minhash_cfg=cfg, phash_source="pixels", pixel_embedding_eps=0.98,
        embedding_n_clusters=2,
    )
    kept_ids = {r["image_id"] for r in four.kept.select("image_id").collect()}
    assert kept_ids == {"img-0", "img-2", "img-3", "img-4"}  # variant removed
