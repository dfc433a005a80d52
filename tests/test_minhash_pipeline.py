"""Distributed MinHash-LSH pipeline vs the single-node UnionFind oracle:
cluster partitions must match EXACTLY (=> dup-pair recall 1.0 ≥ 0.99)."""

import pytest

from text_dedup_spark.config import MinHashConfig
from text_dedup_spark.kernel.oracle import minhash_oracle
from text_dedup_spark.kernel.union_find import UnionFind
from text_dedup_spark.operators.cc import connected_components
from text_dedup_spark.operators.lsh import band_rows, candidate_edges
from text_dedup_spark.plans.minhash_pipeline import minhash_dedup

from conftest import synth_corpus

CFG = MinHashConfig(ngram_size=3, num_perm=32, threshold=0.7)


def clusters_from_assignments(rows, all_ids):
    uf = UnionFind()
    for x in all_ids:
        uf.find(x)
    for r in rows:
        uf.union(r[0], r[1])
    return {frozenset(c) for c in uf.clusters().values() if len(c) > 1}


def dup_pairs(cluster_sets):
    pairs = set()
    for c in cluster_sets:
        members = sorted(c)
        for i, a in enumerate(members):
            for b in members[i + 1 :]:
                pairs.add((a, b))
    return pairs


@pytest.fixture(scope="module")
def corpus():
    return synth_corpus(300, seed=42)


def test_minhash_matches_oracle_clusters(spark, corpus):
    df = spark.createDataFrame(corpus, "doc_id long, text string")
    res = minhash_dedup(df, "text", CFG, id_col="doc_id")
    got = res.assignments.collect()

    oracle = minhash_oracle(corpus, CFG)
    expect_components = oracle.components()

    got_map = {r["doc_id"]: r["component"] for r in got}
    assert got_map == expect_components

    # cluster partitions as sets (representative-invariant)
    all_ids = [i for i, _ in corpus]
    got_clusters = clusters_from_assignments(
        [(r["doc_id"], r["component"]) for r in got], all_ids
    )
    exp_clusters = {frozenset(c) for c in oracle.clusters().values() if len(c) > 1}
    assert got_clusters == exp_clusters

    # dup-pair recall (the BASELINE.json metric) is therefore exactly 1.0
    assert dup_pairs(got_clusters) == dup_pairs(exp_clusters)


def test_survivors_are_cluster_minima(spark, corpus):
    df = spark.createDataFrame(corpus, "doc_id long, text string")
    res = minhash_dedup(df, "text", CFG, id_col="doc_id")
    kept_ids = {r["doc_id"] for r in res.kept.select("doc_id").collect()}
    removed_ids = {r["doc_id"] for r in res.removed.select("doc_id").collect()}

    oracle = minhash_oracle(corpus, CFG)
    all_ids = {i for i, _ in corpus}
    expect_removed = set(oracle.components().keys())
    assert removed_ids == expect_removed
    assert kept_ids == all_ids - expect_removed
    assert kept_ids | removed_ids == all_ids
    # exactly one representative (the min) per cluster survives
    for c in oracle.clusters().values():
        assert min(c) in kept_ids
        assert all(x in removed_ids for x in c if x != min(c))


def test_short_docs_form_one_degenerate_cluster(spark):
    # all docs shorter than the shingle size share the all-MAX_HASH signature
    docs = [(0, "one two"), (5, "three four"), (9, ""), (3, "x"), (7, "a much longer document with plenty of distinct tokens to shingle properly here")]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    res = minhash_dedup(df, "text", MinHashConfig(ngram_size=5, num_perm=16, threshold=0.7), id_col="doc_id")
    rows = {(r["doc_id"], r["component"]) for r in res.assignments.collect()}
    assert rows == {(3, 0), (5, 0), (9, 0)}  # all short docs -> min id 0


def test_no_duplicates_yields_empty_assignments(spark):
    docs = [
        (1, "alpha beta gamma delta epsilon zeta eta theta"),
        (2, "iota kappa lambda mu nu xi omicron pi rho sigma"),
        (3, "tau upsilon phi chi psi omega one more doc here"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    res = minhash_dedup(df, "text", MinHashConfig(ngram_size=2, num_perm=16, threshold=0.9), id_col="doc_id")
    assert res.assignments.count() == 0
    assert res.kept.count() == 3


def test_edges_match_reference_star_expansion(spark, corpus):
    # every bucket contributes (n, min) edges only — verify against a direct
    # recomputation from the oracle's buckets
    df = spark.createDataFrame(corpus, "doc_id long, text string")
    bands = band_rows(df, "text", CFG, "doc_id")
    edges = {(r["src"], r["dst"]) for r in candidate_edges(bands, "doc_id").collect()}

    from text_dedup_spark.kernel.minhash import band_bytes, generate_permutations, minhash_signature

    cfg = CFG.resolve()
    perms = generate_permutations(cfg.num_perm, cfg.seed)
    buckets = {}
    for idx, text in corpus:
        sig = minhash_signature(text, cfg.num_perm, cfg.ngram_size, perms)
        for b_i, h in enumerate(band_bytes(sig, cfg.ranges)):
            buckets.setdefault((b_i, h), []).append(idx)
    expect = set()
    for nodes in buckets.values():
        if len(nodes) <= 1:
            continue
        mn = min(nodes)
        expect.update((n, mn) for n in nodes if n != mn)
    assert edges == expect


def test_hot_bucket_path_identical_edges(spark):
    """candidate_edges with the hot-bucket broadcast path must emit exactly
    the same edge set as the plain join, on a corpus engineered so one
    bucket holds most rows (all-short-docs all-MAX_HASH signature)."""
    from text_dedup_spark.config import MinHashConfig
    from text_dedup_spark.operators.lsh import band_rows, candidate_edges

    rows = [(i, "xy") for i in range(40)] + [
        (100 + i, f"alpha beta gamma delta epsilon word{i} zeta eta theta") for i in range(20)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    bands = band_rows(df, "text", MinHashConfig(num_perm=16).resolve(), "doc_id").persist()
    plain = {(r["src"], r["dst"]) for r in candidate_edges(bands, "doc_id").collect()}
    hot = {
        (r["src"], r["dst"])
        for r in candidate_edges(bands, "doc_id", hot_threshold=5).collect()
    }
    bands.unpersist()
    assert plain == hot and len(plain) >= 39


def test_assignments_invariant_to_partitioning(spark):
    """Cluster assignments must be identical regardless of input
    partitioning and shuffle-partition count (distributed determinism —
    min-id representatives and content-derived keys everywhere)."""
    from text_dedup_spark.config import MinHashConfig
    from text_dedup_spark.plans.minhash_pipeline import minhash_dedup
    from tests.conftest import synth_corpus

    rows = synth_corpus(120, seed=13)
    base = spark.createDataFrame(rows, "doc_id long, text string")
    cfg = MinHashConfig(ngram_size=3, num_perm=16, threshold=0.7)

    def run(df):
        res = minhash_dedup(df, "text", cfg, id_col="doc_id")
        return {(r["doc_id"], r["component"]) for r in res.assignments.collect()}

    a = run(base.repartition(2))
    old = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "13")
        b = run(base.repartition(11, "doc_id"))
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)
    assert a == b and len(a) > 0


def test_cc_pre_contraction_identical_and_fewer_iterations(spark):
    """VERDICT r2 #6: hash-to-min pre-contraction must produce byte-identical
    assignments (UnionFind oracle) while cutting serial loop iterations on
    LSH-shaped edge sets (star edges + chains)."""
    import random

    from text_dedup_spark.kernel.union_find import UnionFind
    from text_dedup_spark.operators import cc as ccmod

    rng = random.Random(42)
    edges = []
    # star clusters (the LSH shape): members point at a bucket min
    for c in range(40):
        base = c * 100
        for m in range(1, rng.randint(2, 8)):
            edges.append((base + m * 7, base))
    # chains (worst case for star convergence)
    for c in range(5):
        base = 10_000 + c * 100
        for i in range(6):
            edges.append((base + i + 1, base + i))
    # a few cross-links merging clusters
    edges += [(100, 7), (203, 307), (10_001, 405)]
    df = spark.createDataFrame(edges, "src long, dst long").repartition(4)

    uf = UnionFind()
    for s, d in edges:
        uf.union(s, d)
    expect = {}
    nodes = {n for e in edges for n in e}
    for n in nodes:
        root = uf.find(n)
        if root != n:
            expect[n] = root

    runs = {}
    for rounds in (0, 1, 2):
        got = {
            r[0]: r[1]
            for r in connected_components(df, "id", pre_contract=rounds).collect()
        }
        assert got == expect, rounds
        runs[rounds] = ccmod.LAST_RUN_STATS["iterations"]
    # measured drop: contraction rounds can only cut serial iterations;
    # two rounds strictly beat none on this chain-heavy graph
    assert runs[1] <= runs[0], runs
    assert runs[2] < runs[0], runs

    # LSH-shaped edges (stars pairwise-bridged through members — the shape
    # overlapping buckets produce): ONE contraction round drops the loop's
    # iteration count (measured 3 -> 2)
    star_edges = []
    for c in range(30):
        base = c * 50
        for m in range(1, 6):
            star_edges.append((base + m, base))
        if c % 2 == 1:
            star_edges.append((base + 1, (c - 1) * 50 + 2))
    sdf = spark.createDataFrame(star_edges, "src long, dst long").repartition(4)
    uf2 = UnionFind()
    for s, d in star_edges:
        uf2.union(s, d)
    expect2 = {}
    for n in {n for e in star_edges for n in e}:
        r = uf2.find(n)
        if r != n:
            expect2[n] = r
    sruns = {}
    for rounds in (0, 1):
        got2 = {
            r[0]: r[1]
            for r in connected_components(sdf, "id", pre_contract=rounds).collect()
        }
        assert got2 == expect2, rounds
        sruns[rounds] = ccmod.LAST_RUN_STATS["iterations"]
    assert sruns[1] < sruns[0], sruns


def test_cc_pre_contraction_empty_and_pair_edges(spark):
    from text_dedup_spark.operators.cc import connected_components

    empty = spark.createDataFrame([], "src long, dst long")
    assert connected_components(empty, "id", pre_contract=1).count() == 0
    pair = spark.createDataFrame([(5, 2)], "src long, dst long")
    got = connected_components(pair, "id", pre_contract=1).collect()
    assert [(r[0], r[1]) for r in got] == [(5, 2)]


def test_fused_star_round_equals_small_of_large(spark):
    """_fused_star_round must be ROW-SET identical to
    small_star(large_star(a)) on randomized graphs (stars, chains, cliques,
    cross-links, duplicate edges), and the fused CC loop must produce the
    UnionFind-oracle assignments (VERDICT r3 #6)."""
    import random

    from text_dedup_spark.kernel.union_find import UnionFind
    from text_dedup_spark.operators import cc as ccmod

    rng = random.Random(1234)
    for trial in range(6):
        edges = set()
        for c in range(rng.randint(2, 20)):  # stars
            base = c * 97
            for m in range(1, rng.randint(2, 7)):
                edges.add((base + m * 3, base))
        for c in range(rng.randint(0, 4)):  # chains
            base = 5_000 + c * 50
            for i in range(rng.randint(2, 8)):
                edges.add((base + i + 1, base + i))
        k = rng.randint(2, 5)  # one clique
        edges.update(
            (9_000 + i, 9_000 + j) for i in range(k) for j in range(i)
        )
        nodes = sorted({n for e in edges for n in e})
        for _ in range(rng.randint(0, 5)):  # cross-links
            edges.add((rng.choice(nodes), rng.choice(nodes)))
        edges = [(u, v) for u, v in edges if u != v]
        edges += edges[: rng.randint(0, 3)]  # duplicate rows
        a = spark.createDataFrame(edges, "u long, v long").repartition(4)

        fused = {tuple(r) for r in ccmod._fused_star_round(a).collect()}
        classic = {
            tuple(r)
            for r in ccmod._small_star(ccmod._large_star(a)).collect()
        }
        assert fused == classic, trial

        uf = UnionFind()
        for u, v in edges:
            uf.union(u, v)
        expect = uf.components()
        df = spark.createDataFrame(edges, "src long, dst long")
        for mode in (True, False):
            got = {
                r[0]: r[1]
                for r in connected_components(df, "id", fused=mode).collect()
            }
            assert got == expect, (trial, mode)
