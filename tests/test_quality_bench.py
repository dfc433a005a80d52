"""Labelled fuzzy-duplicate P/R/F1 (VERDICT r2 #4): the reference's
pinecone evidence class (README.md:203-211, benchmarks/pinecone.ipynb
cells 6-16) reproduced on a deterministic paraphrase-grade corpus at the
same config (ngram 5, num_perm 256, threshold 0.7) and the same macro
per-document metric.

Published full-size numbers (n_groups=800, BENCH/QUALITY.md + README):
  MinHash        P 0.9501  R 0.9441  F1 0.9471   (reference: 0.9464/0.9446/0.9455)
  SimHash swept  P 0.9467  R 0.9403  F1 0.9435   (reference swept: 0.9011/0.6959/0.7853)
  SemDeDup       P 0.9413  R 0.9361  F1 0.9387   (hashed-shingle embeddings, eps 0.8)
"""

from text_dedup_spark.plans.quality_bench import (
    labelled_fuzzy_corpus,
    run_quality_bench,
    score_assignments,
)


def test_scoring_formula_against_hand_truth(spark):
    """The macro metric itself, pinned on a hand-checked micro case."""
    docs = spark.createDataFrame([(i,) for i in range(6)], "doc_id long")
    # truth groups: {0,1,2}, {3,4}; 5 singleton
    truth = spark.createDataFrame([(0, 1), (0, 2), (1, 2), (3, 4)], "id_a long, id_b long")
    # prediction: cluster {0,1} found, {3,4} found, 2 missed
    assigns = spark.createDataFrame([(1, 0), (4, 3)], "doc_id long, component long")
    got = score_assignments(docs, assigns, truth, "doc_id")
    # per-doc (reference formula):
    #   0: pred {1} label {1,2} -> p 1,   r 1/2
    #   1: pred {0} label {0,2} -> p 1,   r 1/2
    #   2: pred {}  label {0,1} -> p 0,   r 0
    #   3: pred {4} label {4}   -> p 1,   r 1
    #   4: pred {3} label {3}   -> p 1,   r 1
    #   5: pred {}  label {}    -> p 0 (reference quirk), r 1
    assert abs(got["precision"] - 4 / 6) < 1e-4
    assert abs(got["recall"] - 4 / 6) < 1e-4
    assert got["n_docs"] == 6


def test_labelled_fuzzy_quality_reference_comparable(spark):
    """MinHash must score in the reference's published band on the fuzzy
    labelled corpus; swept SimHash must beat the reference's swept SimHash
    F1. Smaller n_groups than the published run for test wall time —
    thresholds hold with margin at this size (measured)."""
    out = run_quality_bench(spark, n_groups=300)
    mh = out["minhash"]
    assert mh["precision"] >= 0.92, mh
    assert mh["recall"] >= 0.92, mh
    assert mh["f1"] >= 0.92, mh
    sw = out["simhash_swept"]
    assert sw["f1"] >= 0.85, sw  # reference swept SimHash: 0.7853
    # the embedding tier must land in the same band on the same corpus
    # (full-size measured 0.9387; margin for the smaller test corpus)
    assert out["semdedup"]["f1"] >= 0.90, out["semdedup"]
    # the fuzzy tail is real: the un-swept default must NOT be perfect
    assert out["simhash"]["f1"] < 0.9


def test_corpus_is_deterministic(spark):
    d1, t1 = labelled_fuzzy_corpus(spark, 40, seed=7)
    d2, t2 = labelled_fuzzy_corpus(spark, 40, seed=7)
    assert sorted(r["doc_id"] for r in d1.collect()) == sorted(r["doc_id"] for r in d2.collect())
    assert {tuple(r) for r in t1.collect()} == {tuple(r) for r in t2.collect()}
    h1 = {r["doc_id"]: r["text"] for r in d1.collect()}
    h2 = {r["doc_id"]: r["text"] for r in d2.collect()}
    assert h1 == h2
