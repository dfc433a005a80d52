"""Token-budget sampling vs a pure-Python oracle, across bucket seams."""

import random
import re

from text_dedup_spark.operators.sampling import sample_token_budget


def _oracle(docs, budget):
    """docs: (doc_id, lang, text); PREFIX rule — the running total always
    advances, so the kept set is the maximal id-ordered prefix per group
    (no greedy skip-and-refill: cum is monotone, selection is a prefix)."""
    kept = {}
    cums = {}
    for did, lang, text in sorted(docs):
        n = len(re.findall(r"[A-Za-z_0-9]+", text))
        cums[lang] = cums.get(lang, 0) + n
        if cums[lang] <= budget:
            kept[did] = (n, cums[lang])
    return kept


def test_sample_token_budget_planted(spark):
    docs = [
        (1, "en", "a b c"),        # 3 -> cum 3
        (2, "en", "d e f g"),      # 4 -> cum 7
        (3, "en", "h i j k l"),    # 5 -> would be 12 > 10: excluded
        (4, "en", "m"),            # later doc NOT revisited (prefix rule)
        (10, "de", "x y"),         # independent budget per group
    ]
    df = spark.createDataFrame(docs, "doc_id long, lang string, text string")
    got = {r["doc_id"]: (r["n_tokens"], r["cum_tokens"])
           for r in sample_token_budget(df, "text", "doc_id", 10).collect()}
    assert got == _oracle(docs, 10)
    assert 3 not in got and 4 not in got and got[10] == (2, 2)


def test_sample_token_budget_bucket_seams(spark):
    rng = random.Random(5)
    langs = ["en", "de", "fr"]
    docs = [
        (i, rng.choice(langs), " ".join("w" for _ in range(rng.randint(0, 9))))
        for i in range(200)
    ]
    df = spark.createDataFrame(docs, "doc_id long, lang string, text string").repartition(8)
    for budget in (0, 17, 120, 10_000):
        # bucket_size=16 forces many cross-bucket prefix compositions
        got = {r["doc_id"]: (r["n_tokens"], r["cum_tokens"])
               for r in sample_token_budget(
                   df, "text", "doc_id", budget, bucket_size=16).collect()}
        assert got == _oracle(docs, budget), budget
