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
