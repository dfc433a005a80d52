"""Benchmark decontamination (n-gram overlap) vs a pure-Python oracle."""

import random
import re

from text_dedup_spark.operators.decontaminate import decontaminate


def _grams(text, n):
    toks = [t.lower() for t in re.findall(r"[A-Za-z_0-9]+", text)]
    return {" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)}


def _oracle(corpus, bench, n):
    bg = set().union(*(_grams(t, n) for t in bench)) if bench else set()
    return {i: len(_grams(t, n) & bg) for i, t in corpus}


def test_decontaminate_planted(spark):
    bench_text = "alpha beta gamma delta epsilon zeta eta theta"
    corpus = [
        # contains an exact 5-token benchmark window (case-varied)
        (1, "noise BEFORE Alpha Beta GAMMA delta EPSILON and after"),
        (2, "completely unrelated words nothing shared here at all"),
        (3, bench_text),                       # the benchmark doc itself
        (4, "alpha beta gamma"),               # shorter than n: clean
        (5, ""),                               # empty: clean
    ]
    df = spark.createDataFrame(corpus, "doc_id long, text string")
    bench = spark.createDataFrame([(bench_text,)], "text string")
    out = {
        r["doc_id"]: r
        for r in decontaminate(df, bench, "text", "doc_id", n=5).collect()
    }
    want = _oracle(corpus, [bench_text], 5)
    for did, _ in corpus:
        assert out[did]["n_contaminated_grams"] == want[did], did
        assert out[did]["contaminated"] == (want[did] > 0)
    assert out[1]["contaminated"] and not out[2]["contaminated"]
    assert not out[4]["contaminated"] and not out[5]["contaminated"]
    # original corpus columns survive
    assert out[3]["text"] == bench_text


def test_decontaminate_random_vs_oracle(spark):
    rng = random.Random(11)
    vocab = "aa bb cc dd ee ff gg hh".split()
    corpus = [
        (i, " ".join(rng.choice(vocab) for _ in range(rng.randint(0, 20))))
        for i in range(80)
    ]
    bench_texts = [t for i, t in corpus if i % 13 == 0]
    df = spark.createDataFrame(corpus, "doc_id long, text string").repartition(4)
    bench = spark.createDataFrame([(t,) for t in bench_texts], "text string")
    n = 4
    want = _oracle(corpus, bench_texts, n)
    for hash_grams in (True, False):
        out = {
            r["doc_id"]: r["n_contaminated_grams"]
            for r in decontaminate(
                df, bench, "text", "doc_id", n=n, hash_grams=hash_grams
            ).collect()
        }
        assert out == want, hash_grams


def test_decontaminate_empty_benchmark(spark):
    df = spark.createDataFrame([(1, "a b c d e")], "doc_id long, text string")
    bench = spark.createDataFrame([], "text string")
    rows = decontaminate(df, bench, "text", "doc_id", n=2).collect()
    assert rows[0]["contaminated"] is False
