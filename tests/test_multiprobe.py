"""Multi-probe sign-LSH (Lv et al. 2007): probe-0 compatibility with the
single-probe index, candidate-superset monotonicity, and measured recall
gain vs brute force at a fixed corpus-side index."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from text_dedup_spark.operators.ann import (
    brute_force_topk,
    lsh_topk,
    make_multiprobe_lsh_udf,
    make_sign_lsh_udf,
)

NBITS, N_TABLES, SEED = 14, 2, 7


def _vectors(spark, n, dim=16, seed=123):
    rng = np.random.RandomState(seed)
    mat = rng.normal(size=(n, dim))
    rows = [(i, [float(x) for x in mat[i]]) for i in range(n)]
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_probe0_matches_single_probe_buckets(spark):
    df = _vectors(spark, 50)
    single = make_sign_lsh_udf(NBITS, N_TABLES, SEED)
    multi = make_multiprobe_lsh_udf(NBITS, N_TABLES, SEED, n_probes=4)
    rows = df.select(
        "vec_id",
        single(F.col("embedding")).alias("s"),
        multi(F.col("embedding")).alias("m"),
    ).collect()
    for r in rows:
        # table-major layout: probe 0 of table t sits at m[t * n_probes]
        assert [r["m"][t * 4] for t in range(N_TABLES)] == r["s"]
        # single-bit flips are distinct from the base and from each other
        for t in range(N_TABLES):
            probes = r["m"][t * 4 : (t + 1) * 4]
            assert len(set(probes)) == 4


def test_n_probes_cap():
    with pytest.raises(ValueError):
        make_multiprobe_lsh_udf(8, 2, 1, n_probes=10)


def _topk_sets(df, k=10):
    out = {}
    for r in df.collect():
        out.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    return out


def _planted_corpus(spark, n_base=200, n_queries=30, n_near=8, dim=16, seed=5):
    """Base vectors + n_near genuine near-copies (cos ~0.97) of each query
    base — so brute-force truth is dominated by real neighbors and recall
    measures something."""
    rng = np.random.RandomState(seed)
    base = rng.normal(size=(n_base, dim))
    rows = [(i, [float(x) for x in base[i]]) for i in range(n_base)]
    nid = n_base
    for q in range(n_queries):
        for _ in range(n_near):
            v = base[q] + 0.15 * rng.normal(size=dim)
            rows.append((nid, [float(x) for x in v]))
            nid += 1
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_multiprobe_recall_monotone_and_improves(spark):
    corpus = _planted_corpus(spark)
    queries = corpus.where(F.col("vec_id") < 30)
    truth = _topk_sets(brute_force_topk(corpus, queries, 10))

    common = dict(k=10, nbits=NBITS, n_tables=N_TABLES, seed=SEED)
    single = _topk_sets(lsh_topk(corpus, queries, **common))
    multi = _topk_sets(lsh_topk(corpus, queries, n_probes=8, **common))

    def recall(pred):
        hits = sum(len(pred.get(q, set()) & t) for q, t in truth.items())
        return hits / sum(len(t) for t in truth.values())

    r1, r8 = recall(single), recall(multi)
    # candidate superset => per-query recall never drops
    for q, t in truth.items():
        assert len(multi.get(q, set()) & t) >= len(single.get(q, set()) & t)
    # and at 2 tables x 14 bits the extra probes must buy real recall
    assert r8 > r1
    assert r8 >= 0.8, (r1, r8)
