"""Text stats, language ID, Jaccard verification, ANN search."""

import math
import random

import pytest
from pyspark.sql import functions as F

from text_dedup_spark.functions.langid import detect_language, langid
from text_dedup_spark.kernel.minhash import jaccard_ngrams, tokenize
from text_dedup_spark.operators.ann import (
    brute_force_topk,
    embedding_near_pairs,
    lsh_topk,
)
from text_dedup_spark.operators.jaccard import jaccard_dedup_edges, shingles_expr, verify_pairs
from text_dedup_spark.operators.textstats import (
    doc_fingerprint,
    doc_stats,
    quality_score,
    repetition_stats,
)


def test_doc_stats_basic(spark):
    df = spark.createDataFrame(
        [(1, "The quick brown fox, jumps!"), (2, ""), (3, "a b")],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in doc_stats(df, "text", "doc_id").collect()}
    assert rows[1]["n_tokens"] == 5
    assert rows[1]["n_chars"] == 27
    assert rows[1]["punct_ratio"] == round(2 / 27, 4)
    assert rows[1]["stopword_ratio"] == round(1 / 5, 4)  # 'The'
    assert rows[2]["n_tokens"] == 0 and rows[2]["avg_token_len"] == 0.0
    assert rows[3]["avg_token_len"] == 1.0


def _repetition_oracle(text):
    """Pure-Python restatement of the repetition_stats definitions."""
    import re
    from collections import Counter

    lines = [ln.strip() for ln in text.split("\n")]
    lines = [ln for ln in lines if ln]
    lc = Counter(lines)
    n_lines = len(lines)
    dup = n_lines - len(lc)
    line_chars = sum(len(ln) for ln in lines)
    dup_chars = sum((c - 1) * len(ln) for ln, c in lc.items())
    toks = [t.lower() for t in re.findall(r"[A-Za-z_0-9]+", text)]
    tok_chars = sum(len(t) for t in toks)

    def top(n):
        grams = Counter(
            " ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)
        )
        best = max(
            (c * (len(g) - (n - 1)) for g, c in grams.items()), default=0
        )
        return round(min(best / tok_chars, 1.0), 4) if tok_chars else 0.0

    return {
        "n_lines": n_lines,
        "dup_line_frac": round(dup / n_lines, 4) if n_lines else 0.0,
        "dup_line_char_frac": round(dup_chars / line_chars, 4) if line_chars else 0.0,
        "top_2gram_char_frac": top(2),
        "top_3gram_char_frac": top(3),
    }


def test_repetition_stats_planted(spark):
    docs = [
        (1, "a b\na b\nc d"),                 # duplicate line
        (2, "foo bar foo bar foo bar baz"),   # dominant 2-gram
        (3, ""),                              # empty doc
        (4, "single"),                        # < 2 tokens: gram fracs 0
        (5, "x\n  \nx\ny"),                   # whitespace-only line dropped
        (6, "spam spam spam spam spam"),      # max repetition
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {r["doc_id"]: r.asDict() for r in repetition_stats(df, "text", "doc_id").collect()}
    for did, text in docs:
        want = _repetition_oracle(text)
        for k, v in want.items():
            assert got[did][k] == v, (did, k, got[did][k], v)
    # planted expectations, independent of the oracle restatement
    assert got[1]["dup_line_frac"] == round(1 / 3, 4)
    assert got[2]["top_2gram_char_frac"] == round(18 / 21, 4)
    assert got[6]["top_2gram_char_frac"] == 1.0  # overlapping runs clamp
    assert got[3] == {
        "doc_id": 3, "n_lines": 0, "dup_line_frac": 0.0,
        "dup_line_char_frac": 0.0, "top_2gram_char_frac": 0.0,
        "top_3gram_char_frac": 0.0,
    }


def test_repetition_stats_random_vs_oracle(spark):
    rng = random.Random(7)
    vocab = ["aa", "b", "ccc", "dddd", "e_1", "f2"]
    docs = []
    for i in range(60):
        n_ln = rng.randint(0, 6)
        lns = [
            " ".join(rng.choice(vocab) for _ in range(rng.randint(0, 8)))
            for _ in range(n_ln)
        ]
        if lns and rng.random() < 0.5:
            lns.append(rng.choice(lns))  # plant a duplicate line
        docs.append((i, "\n".join(lns)))
    df = spark.createDataFrame(docs, "doc_id long, text string").repartition(4)
    got = {r["doc_id"]: r.asDict() for r in repetition_stats(df, "text", "doc_id").collect()}
    for did, text in docs:
        want = _repetition_oracle(text)
        for k, v in want.items():
            assert got[did][k] == v, (did, k, got[did][k], v)


def test_quality_and_fingerprint(spark):
    df = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog and keeps running for a while longer"),
            (2, "!!!! ???? ;;;; ::::"),
        ],
        "doc_id long, text string",
    )
    q = {r["doc_id"]: r["quality"] for r in quality_score(df, "text", "doc_id").collect()}
    assert q[1] > q[2]
    fp = {r["doc_id"]: r["fingerprint"] for r in doc_fingerprint(df, "text", "doc_id").collect()}
    assert len(fp[1]) == 16 and fp[1] != fp[2]
    # identical text -> identical fingerprint
    df2 = spark.createDataFrame([(3, "same"), (4, "same")], "doc_id long, text string")
    fps = [r["fingerprint"] for r in doc_fingerprint(df2, "text", "doc_id").collect()]
    assert fps[0] == fps[1]


def test_langid(spark):
    assert detect_language("the cat sat on the mat and the dog ran over the field") == "en"
    assert detect_language("der hund lief über das feld und der fuchs sprang") == "de"
    assert detect_language("") == "und"
    # script-range short circuits + extended profile table
    assert detect_language("кошка спит на диване пока собака бегает по полю") == "ru"
    assert detect_language("猫在沙发上睡觉而狗在绿色的田野里奔跑玩耍") == "zh"
    assert detect_language("고양이는 소파에서 자고 개는 들판을 달리고 있다") == "ko"
    assert detect_language("猫はソファーで寝ていて、犬は野原を走っています") == "ja"
    assert detect_language("القطة نائمة على الأريكة بينما يركض الكلب") == "ar"
    assert detect_language("il gatto dorme sul divano mentre il cane corre") == "it"
    assert detect_language("o gato dorme no sofá enquanto o cachorro corre") == "pt"
    # gibberish below the cosine floor -> und, not a random profile
    assert detect_language("xq zk wv jj qq pp zz kk xx") == "und"
    df = spark.createDataFrame(
        [(1, "the quick brown fox jumps over the lazy dog in the field"),
         (2, "el perro corre sobre el campo y el zorro salta sobre los animales")],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r["lang"] for r in df.select("doc_id", langid("text").alias("lang")).collect()}
    assert got[1] == "en" and got[2] == "es"


def test_shingles_and_jaccard_match_kernel(spark):
    texts = [
        (0, "the quick brown fox jumps over the lazy dog"),
        (1, "the quick brown fox leaps over the lazy dog"),
        (2, "one two"),
    ]
    df = spark.createDataFrame(texts, "doc_id long, text string")
    rows = {r["doc_id"]: set(r["sh"]) for r in df.select(
        "doc_id", shingles_expr(F.col("text"), 3).alias("sh")).collect()}
    for i, t in texts:
        assert rows[i] == tokenize(t, 3), i

    edges = spark.createDataFrame([(1, 0)], "src long, dst long")
    out = verify_pairs(df, edges, "text", 3, 0.0, "doc_id").collect()
    assert len(out) == 1
    expect = jaccard_ngrams(texts[1][1], texts[0][1], 3)
    assert out[0]["jaccard"] == round(expect, 6)


def test_jaccard_dedup_edges(spark):
    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa " * 3
    docs = [(0, base), (1, base + " lambda"), (2, "totally different words here entirely unrelated")]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    from text_dedup_spark.config import MinHashConfig

    edges = jaccard_dedup_edges(df, "text", 3, 0.7, MinHashConfig(ngram_size=3, num_perm=32, threshold=0.7), "doc_id").collect()
    pairs = {(r["src"], r["dst"]) for r in edges}
    assert (1, 0) in pairs
    assert all(2 not in p for p in pairs)


@pytest.fixture(scope="module")
def vectors(spark):
    rng = random.Random(42)
    rows = []
    for i in range(120):
        rows.append((i, [rng.gauss(0, 1) for _ in range(16)]))
    # planted near-duplicates: 110..119 are tiny perturbations of 0..9
    for j in range(10):
        base = rows[j][1]
        rows.append((110 + j, [x + rng.gauss(0, 0.01) for x in base]))
    rows = rows[:110] + rows[120:]  # keep ids 0..109 + 110..119
    df = spark.createDataFrame([(i, [float(x) for x in v]) for i, v in rows],
                               "vec_id long, embedding array<float>")
    return df.persist()


def _cosine(a, b):
    dot = sum(x * y for x, y in zip(a, b))
    na = math.sqrt(sum(x * x for x in a))
    nb = math.sqrt(sum(x * x for x in b))
    return dot / (na * nb)


def test_brute_force_topk_matches_python(spark, vectors):
    data = {r["vec_id"]: list(r["embedding"]) for r in vectors.collect()}
    queries = vectors.where(F.col("vec_id") < 3)
    got = brute_force_topk(vectors, queries, 5).collect()
    by_q = {}
    for r in got:
        by_q.setdefault(r["query_id"], []).append((r["rank"], r["neighbor_id"], r["score"]))
    for q in range(3):
        scored = sorted(
            ((round(_cosine(data[q], v), 6), -i) for i, v in data.items() if i != q),
            reverse=True,
        )
        expect = [(-negi) for s, negi in scored[:5]]
        gotlist = [n for _, n, _ in sorted(by_q[q])]
        assert gotlist == expect, q


def test_lsh_topk_finds_planted_neighbors(spark, vectors):
    queries = vectors.where(F.col("vec_id") < 10)
    got = lsh_topk(vectors, queries, 1, nbits=8, n_tables=12)
    top1 = {r["query_id"]: r["neighbor_id"] for r in got.collect()}
    hits = sum(1 for q in range(10) if top1.get(q) == 110 + q)
    assert hits >= 9, top1  # >=90% recall@1 on planted near-identical pairs


def test_embedding_near_pairs(spark, vectors):
    exact = {
        (r["id_a"], r["id_b"])
        for r in embedding_near_pairs(vectors, 0.99, approximate=False).collect()
    }
    assert exact == {(j, 110 + j) for j in range(10)}
    approx = {
        (r["id_a"], r["id_b"])
        for r in embedding_near_pairs(vectors, 0.99, approximate=True, nbits=8, n_tables=12).collect()
    }
    assert len(approx & exact) >= 9
    assert approx <= exact  # verification step admits no false positives


def test_exact_near_pairs_with_empty_blocks(spark):
    """Regression: with more blocks than occupied hash slots, some block-pair
    groups have an empty left or right side. The empty-right case used to be
    misread as a diagonal group (duplicating within-block pairs) and the
    empty-left case crashed on np.linalg.norm of a 1-D empty array."""
    from text_dedup_spark.operators.ann import _exact_near_pairs_blocked

    rng = random.Random(7)
    rows = [(i, [rng.gauss(0, 1) for _ in range(8)]) for i in range(6)]
    rows.append((100, [x + rng.gauss(0, 0.001) for x in rows[0][1]]))  # near-dup of 0
    df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in rows],
        "vec_id long, embedding array<float>",
    )
    # n_blocks=16 >> 7 vectors guarantees empty blocks on both sides
    got = _exact_near_pairs_blocked(df, 0.99, n_blocks=16).collect()
    pairs = [(r["id_a"], r["id_b"]) for r in got]
    assert sorted(pairs) == [(0, 100)]
    assert len(pairs) == len(set(pairs))  # no duplicated emissions

    # and the planted-truth corpus at default n_blocks still matches the
    # unblocked definition (every unordered pair exactly once)
    data = {i: v for i, v in rows}
    expect = set()
    for a in data:
        for b in data:
            if a < b and _cosine(data[a], data[b]) >= 0.99:
                expect.add((a, b))
    assert set(pairs) == expect


def test_empty_corpus_through_pipelines(spark):
    from text_dedup_spark.config import MinHashConfig, SimHashConfig
    from text_dedup_spark.operators.cc import connected_components
    from text_dedup_spark.operators.exact import exact_dedup
    from text_dedup_spark.operators.simhash_dedup import simhash_assignments_from_text
    from text_dedup_spark.plans.minhash_pipeline import minhash_dedup

    empty = spark.createDataFrame([], "doc_id long, text string")
    res = minhash_dedup(empty, "text", MinHashConfig(num_perm=16), id_col="doc_id")
    assert res.kept.count() == 0 and res.assignments.count() == 0
    assert exact_dedup(empty, "text", "doc_id").count() == 0
    assert simhash_assignments_from_text(
        empty, "text", SimHashConfig(), "doc_id"
    ).count() == 0
    edges = spark.createDataFrame([], "src long, dst long")
    assert connected_components(edges, "doc_id").count() == 0


def test_degenerate_short_doc_bucket(spark):
    """All-short-docs corpus: every signature is all-MAX_HASH (spark-script
    ngrams semantics) -> ONE giant bucket; the bucket-min aggregation must
    still produce exactly n-1 star edges and one survivor."""
    from text_dedup_spark.config import MinHashConfig
    from text_dedup_spark.plans.minhash_pipeline import minhash_dedup

    docs = spark.createDataFrame(
        [(i, "ab") for i in range(50)], "doc_id long, text string"
    )
    res = minhash_dedup(docs, "text", MinHashConfig(num_perm=16), id_col="doc_id")
    assert res.kept.count() == 1
    assert res.assignments.count() == 49


def test_audit_false_positives(spark):
    """Exact duplicates audit at jaccard 1.0 (zero false positives); a
    planted LSH false positive (dissimilar doc wired into a cluster) is
    flagged."""
    from pyspark.sql import functions as F

    from text_dedup_spark.operators.audit import audit_false_positives, audit_summary

    docs = spark.createDataFrame(
        [
            (0, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
            (1, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
            (2, "totally different words with nothing shared at all here now"),
        ],
        "doc_id long, text string",
    )
    assigns = spark.createDataFrame([(1, 0), (2, 0)], "doc_id long, component long")
    audited = audit_false_positives(docs, assigns, "text", "doc_id", n=3, threshold=0.7)
    rows = {r["doc_id"]: r for r in audited.collect()}
    assert rows[1]["jaccard"] == 1.0 and not rows[1]["is_false_positive"]
    assert rows[2]["jaccard"] == 0.0 and rows[2]["is_false_positive"]
    s = audit_summary(audited).collect()[0]
    assert s["n_members"] == 2 and s["n_false_positive"] == 1 and s["fp_rate"] == 0.5


def test_catalyst_shingles_match_kernel_tokenize(spark):
    """The Catalyst shingle expression (jaccard/audit operators) and the
    python kernel tokenizer (minhash signatures) must agree on the shingle
    SET for any text — including unicode, newlines, and short docs — or the
    two layers would disagree about similarity."""
    from pyspark.sql import functions as F

    from text_dedup_spark.kernel.minhash import tokenize
    from text_dedup_spark.operators.jaccard import shingles_expr

    texts = [
        "plain ascii words here for shingling",
        "newlines\nare\nreplaced\nby the tokenizer maybe",
        "unicode: héllo wörld — em-dash, 中文字符 and emoji 🙂 mixed in",
        "tabs\tand  double  spaces",
        "short doc",
        "",
        "under_scores and digits 123 mix_99 fine",
    ]
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], "i long, text string")
    rows = df.select("i", shingles_expr(F.col("text"), 3).alias("sh")).collect()
    got = {r["i"]: set(r["sh"]) for r in rows}
    for i, t in enumerate(texts):
        assert got[i] == tokenize(t, 3), (i, t, got[i], tokenize(t, 3))


def test_ivf_and_lsh_recall_vs_brute_force(spark):
    """Approximate ANN tiers must reach high recall@10 against the exact
    baseline on CLUSTERED vectors (the workload approximate indexes exist
    for; near-uniform random vectors have no cell structure to exploit and
    any IVF degrades toward its probe fraction there)."""
    import numpy as np
    from pyspark.sql import functions as F

    from text_dedup_spark.operators.ann import brute_force_topk, ivf_topk, lsh_topk

    rng = np.random.RandomState(3)
    centers = rng.randn(20, 32)
    rows = []
    for i in range(600):
        c = centers[i % 20]
        v = c + rng.randn(32) * 0.15
        rows.append((i, [float(x) for x in v]))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    queries = emb.where(F.col("vec_id") < 20)
    exact = brute_force_topk(emb, queries, 10)
    truth = {}
    for r in exact.collect():
        truth.setdefault(r["query_id"], set()).add(r["neighbor_id"])

    def recall(df):
        got = {}
        for r in df.collect():
            got.setdefault(r["query_id"], set()).add(r["neighbor_id"])
        hits = sum(len(got.get(q, set()) & t) for q, t in truth.items())
        return hits / sum(len(t) for t in truth.values())

    r_ivf = recall(ivf_topk(emb, queries, 10, n_centroids=32, n_probe=8))
    r_lsh = recall(lsh_topk(emb, queries, 10, nbits=10, n_tables=8))
    assert r_ivf >= 0.9, r_ivf
    assert r_lsh >= 0.9, r_lsh
    # Lloyd-refined centroids hold recall with HALF the probes (the
    # per-query scan fraction — the lever that matters at corpus scale)
    r_trained = recall(
        ivf_topk(emb, queries, 10, n_centroids=32, n_probe=4, kmeans_iterations=2)
    )
    assert r_trained >= 0.95, r_trained


def test_near_pairs_identical_hot_group_bounded(spark):
    """VERDICT r2 #1: a corpus with a 10k-identical-embedding group (the
    dedup-corpus shape) must NOT produce a quadratic bucket self-join. The
    collapse reduces the bucket join to one row per distinct vector, and
    the intra-group expansion is threshold-gated BEFORE materializing
    member pairs."""
    from text_dedup_spark.operators.ann import _collapse_identical_vectors

    n_hot = 10_000
    base = [1.0, 2.0, 3.0, 4.0]
    rng = random.Random(3)
    rows = [(i, base) for i in range(n_hot)]
    rows += [
        (n_hot + i, [rng.gauss(0, 1) for _ in range(4)]) for i in range(50)
    ]
    df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in rows],
        "vec_id long, embedding array<float>",
    )
    reps, members = _collapse_identical_vectors(df, "vec_id", "embedding")
    # candidate volume bound: the bucket self-join sees 51 distinct
    # vectors, not 10050 rows (old plan: ~10^8 candidate rows on one key)
    assert reps.count() == 51
    assert members.count() == 10_050
    # threshold above any cosine: completes fast, zero rows, and the g^2
    # intra expansion never materializes (gated on the rep self-score)
    out = embedding_near_pairs(df, 1.01, approximate=True, nbits=8, n_tables=4)
    assert out.count() == 0
    # capped members for top-k expansion: k+1 smallest ids per group
    reps_c, members_c = _collapse_identical_vectors(
        df, "vec_id", "embedding", member_cap=6
    )
    assert members_c.where(F.col("rep") == 0).count() == 6


def test_near_pairs_collapse_matches_exact(spark):
    """Approximate near-pairs with identical-vector groups must still emit
    every qualifying member pair (cross-group AND intra-group) with the
    same scores as the exact blocked path."""
    rng = random.Random(11)
    base_a = [rng.gauss(0, 1) for _ in range(8)]
    base_b = [x + rng.gauss(0, 0.005) for x in base_a]  # near-dup of A
    base_c = [rng.gauss(0, 1) for _ in range(8)]  # unrelated
    rows = []
    # group A: ids 0,5,9 identical; group B: ids 2,7 identical; C: 3
    for i in (0, 5, 9):
        rows.append((i, base_a))
    for i in (2, 7):
        rows.append((i, base_b))
    rows.append((3, base_c))
    for i in range(20, 40):  # noise
        rows.append((i, [rng.gauss(0, 1) for _ in range(8)]))
    df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in rows],
        "vec_id long, embedding array<float>",
    )
    exact = {
        (r["id_a"], r["id_b"]): r["score"]
        for r in embedding_near_pairs(df, 0.99, approximate=False).collect()
    }
    approx = {
        (r["id_a"], r["id_b"]): r["score"]
        for r in embedding_near_pairs(
            df, 0.99, approximate=True, nbits=6, n_tables=12
        ).collect()
    }
    # intra pairs of both groups + all cross pairs A x B must be present
    for pair in [(0, 5), (0, 9), (5, 9), (2, 7), (0, 2), (0, 7), (2, 5), (5, 7), (2, 9), (7, 9)]:
        assert pair in approx, pair
    assert set(approx) <= set(exact)
    for p, s in approx.items():
        assert abs(s - exact[p]) < 1e-9, (p, s, exact[p])
    # no duplicated emissions
    out_rows = embedding_near_pairs(df, 0.99, approximate=True, nbits=6, n_tables=12).collect()
    pairs = [(r["id_a"], r["id_b"]) for r in out_rows]
    assert len(pairs) == len(set(pairs))


def test_lsh_topk_with_tied_corpus_groups(spark):
    """Top-k over a corpus with identical-vector groups: member expansion +
    (score desc, id asc) ranking must match brute force exactly, including
    the self-exclusion of a query that sits inside a tied group."""
    rng = random.Random(5)
    tied = [rng.gauss(0, 1) for _ in range(8)]
    rows = [(i, tied) for i in range(6)]  # ids 0..5 identical
    rows += [(10 + i, [rng.gauss(0, 1) for _ in range(8)]) for i in range(30)]
    df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in rows],
        "vec_id long, embedding array<float>",
    ).persist()
    queries = df.where(F.col("vec_id").isin(0, 12))
    exact = brute_force_topk(df, queries, 4)
    # coarse buckets + many tables: every pair collides somewhere at this
    # seed, so the approximate result must equal brute force exactly
    got = lsh_topk(df, queries, 4, nbits=3, n_tables=32)
    want = {(r["query_id"], r["rank"]): (r["neighbor_id"], r["score"]) for r in exact.collect()}
    have = {(r["query_id"], r["rank"]): (r["neighbor_id"], r["score"]) for r in got.collect()}
    # query 0 is inside the tied group: its top-4 is co-members 1,2,3,4 at
    # score 1.0 — the member-level self-exclusion must keep those
    assert have[(0, 1)][0] == 1 and abs(have[(0, 1)][1] - 1.0) < 1e-9
    for key, (nid, score) in want.items():
        assert key in have, key
        assert have[key][0] == nid, (key, have[key], nid)
        assert abs(have[key][1] - score) < 1e-9
    df.unpersist()


def test_reassign_survivors_best_score(spark):
    from text_dedup_spark.operators.apply import reassign_survivors, split_survivors

    # clusters: {1,2,3} (min-id root 1), {10,11}; 99 is a singleton
    assigns = spark.createDataFrame(
        [(2, 1), (3, 1), (11, 10)], "doc_id long, component long"
    )
    scores = spark.createDataFrame(
        [(1, 5.0), (2, 9.0), (3, 9.0), (10, 1.0), (11, 7.0), (99, 0.0)],
        "doc_id long, score double",
    )
    out = reassign_survivors(assigns, scores, "doc_id", "score")
    rows = {r["doc_id"]: r["component"] for r in out.collect()}
    # cluster 1: best score 9.0 tie between 2 and 3 -> min id 2 survives
    assert rows == {1: 2, 3: 2, 10: 11}
    # roots-absent invariant holds -> split_survivors keeps exactly the best
    df = scores.select("doc_id")
    kept, removed = split_survivors(df, out, "doc_id")
    assert {r["doc_id"] for r in kept.collect()} == {2, 11, 99}
    # ascending policy: keep the WORST score (min), ties -> min id
    out2 = reassign_survivors(assigns, scores, "doc_id", "score", descending=False)
    rows2 = {r["doc_id"]: r["component"] for r in out2.collect()}
    assert rows2 == {2: 1, 3: 1, 11: 10}


def test_modality_disagreement_kinds(spark):
    """Crafted phash longs + captions: consistent dups flag nothing;
    same-caption/different-image and same-image/different-caption each
    flag exactly once with the verified Hamming distance."""
    from text_dedup_spark.operators.audit import modality_disagreement

    # phash regions are mutually >= 24 bits apart so only the PLANTED
    # relations hold (an earlier fixture accidentally made 0/0b111/0b110
    # genuine near-dups — the operator correctly flagged them)
    def s64(x):  # two's-complement signed long for the phash column
        return x - (1 << 64) if x >= (1 << 63) else x

    a = 0x0F0F0F0F0F0F0F0F
    b1 = s64(0xF0F0F0F0F0F0F0F0)
    c1 = 0x00000000FFFFFFFF
    d1 = s64(0xFFFFFFFF00000000)
    rows = [
        (1, "cap1", a),            # consistent dup pair (with 2)
        (2, "cap1", a),
        (3, "cap2", b1),           # same caption, image 16 bits apart
        (4, "cap2", b1 ^ 0xFFFF),
        (5, "cap3", c1),           # image 1 bit apart, captions differ
        (6, "cap4", c1 ^ 1),
        (7, "cap5", d1),           # unrelated (28 bits from anything)
        (8, "cap6", d1 ^ 0x0F0F0F0F0F0F0F0F),
    ]
    feats = spark.createDataFrame(rows, "img_id long, caption string, phash long")
    got = {
        (r["id_a"], r["id_b"], r["kind"], r["hamming"])
        for r in modality_disagreement(feats, "img_id").collect()
    }
    assert got == {
        (3, 4, "caption_dup_image_diff", 16),
        (5, 6, "image_dup_caption_diff", 1),
    }


def test_modality_disagreement_hot_caption_is_linear(spark):
    """A boilerplate caption shared by n rows emits at most n-1 star pairs,
    never the quadratic pair set."""
    from pyspark.sql import functions as F

    from text_dedup_spark.operators.audit import modality_disagreement

    n = 2000
    feats = spark.range(n).select(
        F.col("id").alias("img_id"),
        F.lit("same boilerplate caption").alias("caption"),
        # alternate between two far-apart phash values -> every star pair
        # with the rep (id 0) where the member has the other value flags
        (F.when(F.col("id") % 2 == 0, F.lit(0)).otherwise(F.lit(0xFFFF)))
        .cast("long").alias("phash"),
    )
    out = modality_disagreement(feats, "img_id")
    flagged = out.where(out.kind == "caption_dup_image_diff").count()
    assert flagged == n // 2  # odd ids vs rep 0; never ~n^2/4 cross pairs


def test_dedup_report_planted_and_empty(spark):
    from text_dedup_spark.operators.apply import dedup_report

    df = spark.createDataFrame(
        [(1, "aaaa"), (2, "aaaa"), (3, "bb"), (4, "aaaa"), (5, "cc")],
        "doc_id long, text string",
    )
    assigns = spark.createDataFrame([(2, 1), (4, 1)], "doc_id long, component long")
    row = dedup_report(df, assigns, "doc_id", text_col="text").collect()[0]
    assert (row["n_docs"], row["n_removed"], row["n_clusters"],
            row["max_cluster_size"]) == (5, 2, 1, 3)
    assert abs(row["removed_frac"] - 0.4) < 1e-9
    assert abs(row["removed_char_frac"] - 8 / 16) < 1e-9

    empty = spark.createDataFrame([], "doc_id long, component long")
    row = dedup_report(df, empty, "doc_id").collect()[0]
    assert (row["n_removed"], row["n_clusters"], row["max_cluster_size"]) == (0, 0, 0)
    assert "removed_char_frac" not in row.asDict()
