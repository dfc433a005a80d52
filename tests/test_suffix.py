"""Substring dedup kernel vs a naive dict-counting oracle, plus the Spark
operator end-to-end."""

import random

from text_dedup_spark.config import SuffixConfig
from text_dedup_spark.kernel.substr import dedup_documents, duplicate_segments
from text_dedup_spark.kernel.intervals import merge_intervals
from text_dedup_spark.operators.suffix import remove_duplicate_substrings


def naive_duplicate_segments(data: bytes, k: int):
    """O(n*k) oracle: dict-count every k-gram, mark spans of repeated ones."""
    counts = {}
    for i in range(len(data) - k + 1):
        counts[data[i : i + k]] = counts.get(data[i : i + k], 0) + 1
    spans = [(i, i + k) for i in range(len(data) - k + 1) if counts[data[i : i + k]] >= 2]
    return merge_intervals(spans, "overlapping")


def test_duplicate_segments_matches_naive_random():
    rng = random.Random(42)
    for trial in range(20):
        n = rng.randint(0, 400)
        alphabet = b"abcd" if trial % 2 else b"ab"  # small alphabet -> many dups
        data = bytes(rng.choice(alphabet) for _ in range(n))
        for k in (3, 7, 20):
            assert duplicate_segments(data, k) == naive_duplicate_segments(data, k), (
                trial,
                k,
            )


def test_duplicate_segments_planted_passage():
    passage = b"X" * 0 + b"this exact shared passage is long enough to trip the detector"
    a = b"unique prefix one " + passage + b" unique suffix one"
    b_ = b"completely different start " + passage + b" another ending"
    blob = a + b_
    k = 30
    segs = duplicate_segments(blob, k)
    assert segs == naive_duplicate_segments(blob, k)
    # the planted passage is covered
    start = len(b"unique prefix one ")
    assert any(s <= start and start + len(passage) <= e for s, e in segs)


def test_dedup_documents_blanks_shared_passage():
    passage = "the quick brown fox jumps over the lazy dog many many times over"
    docs = [
        (0, "first doc intro " + passage + " first doc tail"),
        (1, "second doc has other words " + passage + " and ends differently"),
        (2, "totally unrelated content without any repeats at all here"),
    ]
    out = dedup_documents(docs, k=30)
    assert out[2][1] == docs[2][1] and out[2][2] == 0
    assert passage not in out[0][1] or passage not in out[1][1]
    assert out[0][2] > 0 and out[1][2] > 0


def test_empty_and_short_inputs():
    assert duplicate_segments(b"", 5) == []
    assert duplicate_segments(b"abc", 5) == []
    assert dedup_documents([], 10) == []
    assert dedup_documents([(3, "short")], 10) == [(3, "short", 0)]


def test_spark_operator_global_scope(spark):
    passage = "a long shared passage that appears inside several documents verbatim"
    docs = [
        (0, "doc zero begins " + passage + " doc zero ends"),
        (1, "doc one other start " + passage + " doc one finish"),
        (2, "unique short document"),
        (3, passage),  # becomes empty -> filtered (P8)
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    cfg = SuffixConfig(k=30, global_scope=True)
    out = remove_duplicate_substrings(df, "text", cfg, "doc_id").collect()
    got = {r["doc_id"]: (r["text"], r["dup_bytes"]) for r in out}
    # doc 3 blanked entirely and filtered
    assert 3 not in got
    assert set(got) == {0, 1, 2}
    assert got[2] == ("unique short document", 0)
    # oracle comparison on the concatenated corpus
    expect = {i: (t, d) for i, t, d in dedup_documents(docs, 30)}
    for i in (0, 1, 2):
        assert got[i] == expect[i]


def _global_oracle(docs, k, strategy="overlapping"):
    """The exact single-stream pass over the id-ordered concatenation —
    what global_scope=True must reproduce distributed."""
    rows = dedup_documents(sorted(docs), k, strategy)
    return {i: (t, d) for i, t, d in rows if len(t) > 0}


def _run_global(spark, docs, k, n_parts, **kw):
    df = spark.createDataFrame(docs, "doc_id long, text string")
    cfg = SuffixConfig(k=k, global_scope=True)
    out = remove_duplicate_substrings(
        df, "text", cfg, "doc_id", num_partitions=n_parts, **kw
    ).collect()
    return {r["doc_id"]: (r["text"], r["dup_bytes"]) for r in out}


def test_global_distributed_cross_partition_dups(spark):
    """Each copy of the planted passage is unique within its partition —
    only the cross-partition hash exchange can find them."""
    rng = random.Random(7)
    passage = (
        "this shared passage is considerably longer than the threshold so "
        "that the substring detector must blank it out wherever it appears"
    )
    docs = []
    for i in range(60):
        filler = " ".join(rng.choice(["red", "green", "blue", "cyan"]) for _ in range(25))
        text = filler
        if i in (3, 31, 57):  # far apart -> land in different range partitions
            text = filler[:20] + " " + passage + " " + filler[20:]
        docs.append((i, text))
    expect = _global_oracle(docs, 60)
    for n_parts in (1, 3, 7):
        got = _run_global(spark, docs, 60, n_parts)
        assert got == expect, n_parts


def test_global_distributed_seam_straddles(spark):
    """Identical docs everywhere: every partition seam sits inside a
    duplicated region, so straddling grams must be hashed and their spans
    mapped back as clipped per-partition ranges."""
    t = "every document carries exactly this same sentence content here"
    docs = [(i, t) for i in range(24)]
    expect = _global_oracle(docs, 50)
    for n_parts in (1, 4, 6):
        got = _run_global(spark, docs, 50, n_parts)
        assert got == expect, n_parts


def test_global_distributed_cogroup_path(spark):
    """broadcast_notify_max=0 forces the cogroup delivery branch; results
    must be identical to the broadcast branch and the oracle."""
    rng = random.Random(9)
    passage = "a duplicated stretch of text well past the threshold length used here"
    docs = []
    for i in range(40):
        filler = " ".join(rng.choice(["ein", "zwei", "drei"]) for _ in range(20))
        docs.append((i, filler + (" " + passage if i % 7 == 0 else "")))
    expect = _global_oracle(docs, 50)
    got = _run_global(spark, docs, 50, 5, broadcast_notify_max=0)
    assert got == expect


def test_global_distributed_mixed_and_empty_docs(spark):
    """Empty docs, tiny partitions (num_partitions > docs), and a doc that
    becomes empty after cleaning — all through the distributed path."""
    passage = "the repeated chunk of bytes that is longer than the threshold k here"
    docs = [
        (0, "prefix " + passage + " suffix"),
        (1, ""),
        (2, passage),  # blanked entirely -> filtered
        (3, "wholly unique line with no duplicate content at all in it"),
        (4, ""),
    ]
    expect = _global_oracle(docs, 40)
    for n_parts in (2, 8):
        got = _run_global(spark, docs, 40, n_parts)
        assert got == expect, n_parts


def test_spark_operator_partition_local_determinism(spark):
    rng = random.Random(1)
    passage = "shared block of text long enough for the k threshold to trigger"
    docs = []
    for i in range(40):
        base = " ".join(rng.choice(["alpha", "beta", "gamma", "delta"]) for _ in range(20))
        if i % 4 == 0:
            base += " " + passage
        docs.append((i, base))
    df = spark.createDataFrame(docs, "doc_id long, text string")
    cfg = SuffixConfig(k=40)
    out1 = {
        (r["doc_id"], r["text"])
        for r in remove_duplicate_substrings(df, "text", cfg, "doc_id", num_partitions=2).collect()
    }
    out2 = {
        (r["doc_id"], r["text"])
        for r in remove_duplicate_substrings(df, "text", cfg, "doc_id", num_partitions=2).collect()
    }
    assert out1 == out2
