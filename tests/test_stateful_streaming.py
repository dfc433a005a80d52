"""applyInPandasWithState near-dup operator: the custom-stateful streaming
path (SURVEY §2.9). Semantics pinned here:

- planted near-dups flag to the EARLIEST live source, matching the batch
  SimHash operator's assignments on star-shaped corpora (cross-mode
  equivalence, same kernels);
- state is watermark-bounded across micro-batches (checkpoint restart):
  a near-dup arriving after its source expired is NOT flagged;
- the per-bucket capacity cap evicts oldest-first with deterministic
  re-flagging (the streaming hot-bucket defense).
"""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from text_dedup_spark.config import SimHashConfig
from text_dedup_spark.kernel.simhash import hamming_distance, simhash_signature
from text_dedup_spark.streaming.stateful import (
    collapse_near_dup_flags,
    streaming_simhash_near_dup,
)

CFG = SimHashConfig(f=64, bit_diff=3, num_bucket=4, ngram=3)

SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("text", StringType()),
        StructField("ts", TimestampType()),
    ]
)

_T0 = datetime.datetime(2026, 1, 1, 12, 0, 0)


def _t(minutes: float) -> datetime.datetime:
    return _T0 + datetime.timedelta(minutes=minutes)


ANCHOR = (
    "the quick brown fox jumps over the lazy dog while seventeen engineers "
    "review a distributed deduplication pipeline for image caption pairs"
)
NEAR = ANCHOR + " today"  # tiny char-3-gram delta
FAR = (
    "completely different subject matter entirely unrelated to the corpus "
    "zebra quantum violin eleven purple cascading metrics"
)


def _assert_planted_distances() -> None:
    a = simhash_signature(ANCHOR, CFG.f, CFG.ngram)
    n = simhash_signature(NEAR, CFG.f, CFG.ngram)
    f = simhash_signature(FAR, CFG.f, CFG.ngram)
    assert hamming_distance(a, n) <= CFG.bit_diff, hamming_distance(a, n)
    assert hamming_distance(a, f) > CFG.bit_diff, hamming_distance(a, f)


def _run(spark, tmp_path, rows, name, in_dir="stream_in", sink="memory", **kwargs):
    path = str(tmp_path / in_dir)
    spark.createDataFrame(rows, SCHEMA).coalesce(1).write.mode("append").parquet(path)
    stream = spark.readStream.schema(SCHEMA).parquet(path)
    flags = streaming_simhash_near_dup(
        stream, "text", "ts", CFG, id_col="doc_id", **kwargs
    )
    writer = flags.writeStream.outputMode("append").option(
        "checkpointLocation", str(tmp_path / f"ckpt_{name}")
    ).trigger(availableNow=True)
    if sink == "memory":
        q = writer.format("memory").queryName(name).start()
    else:  # parquet: the memory sink cannot recover from a checkpoint, so
        # multi-batch (restart) tests need a fault-tolerant file sink
        q = writer.format("parquet").start(str(tmp_path / f"out_{name}"))
    q.awaitTermination(180)
    return None


def _collapsed(spark, name, tmp_path=None):
    src = (
        spark.read.parquet(str(tmp_path / f"out_{name}"))
        if tmp_path is not None
        else spark.table(name)
    )
    return {
        r["doc_id"]: r["dup_src"]
        for r in collapse_near_dup_flags(src, id_col="doc_id").collect()
    }


def test_planted_flags_match_batch_assignments(spark, tmp_path):
    """Star corpus: streaming collapsed flags == batch SimHash assignments
    (same kernels, same config; anchor = earliest ts AND min id)."""
    _assert_planted_distances()
    rows = [
        (0, ANCHOR, _t(0)),
        (1, ANCHOR, _t(1)),  # exact dup
        (2, NEAR, _t(2)),  # near dup (Hamming <= bit_diff)
        (3, FAR, _t(3)),  # unrelated
    ]
    _run(spark, tmp_path, rows, "near_flags")
    got = _collapsed(spark, "near_flags")
    assert got == {0: None, 1: 0, 2: 0, 3: None}

    from text_dedup_spark.operators.simhash_dedup import (
        simhash_assignments_from_text,
    )

    batch = {
        r["doc_id"]: r["component"]
        for r in simhash_assignments_from_text(
            spark.createDataFrame(rows, SCHEMA), "text", CFG, "doc_id"
        ).collect()
    }
    stream_nonnull = {k: v for k, v in got.items() if v is not None}
    assert stream_nonnull == batch


def test_watermark_expires_state_across_batches(spark, tmp_path):
    """Batch 1 advances the watermark past the anchor; batch 2's near-dup of
    the anchor is NOT flagged (state pruned), while a near-dup of the
    still-live row is."""
    _assert_planted_distances()
    # batch 1: anchor at t0; FAR at t0+30min pushes watermark to t0+20min
    _run(
        spark, tmp_path,
        [(0, ANCHOR, _t(0)), (1, FAR, _t(30))],
        "wm_flags", sink="parquet", watermark="10 minutes",
    )
    # batch 2 (same checkpoint): near-dup of the expired anchor + exact dup
    # of the live FAR row
    _run(
        spark, tmp_path,
        [(2, NEAR, _t(31)), (3, FAR, _t(32))],
        "wm_flags", sink="parquet", watermark="10 minutes",
    )
    got = _collapsed(spark, "wm_flags", tmp_path)
    assert got[0] is None and got[1] is None
    assert got[2] is None  # source expired -> not flagged
    assert got[3] == 1  # source still within watermark


def test_late_rows_are_dropped_not_fatal(spark, tmp_path):
    """Pin the late-data contract (measured, Spark 4.1): rows behind the
    watermark are filtered BEFORE applyInPandasWithState, so a very late
    row (t0-60min against a watermark at t0+20min) silently disappears —
    the query completes, emits nothing for it, and never reaches the
    operator's timeout-vs-watermark edge (the operator still clamps its
    timeout above the watermark as defense-in-depth for short-watermark
    configs)."""
    _run(
        spark, tmp_path,
        [(0, ANCHOR, _t(0)), (1, FAR, _t(30))],
        "late_flags", sink="parquet", watermark="10 minutes",
    )
    _run(
        spark, tmp_path,
        [(2, ANCHOR, _t(-60))],
        "late_flags", sink="parquet", watermark="10 minutes",
    )
    got = _collapsed(spark, "late_flags", tmp_path)
    assert got == {0: None, 1: None}  # late row dropped, query alive


def test_randomized_corpus_matches_pure_python_oracle(spark, tmp_path):
    """Seeded random corpus (mixed clones, near-dups, singletons) vs a
    pure-Python replication of the operator's exact semantics: per bucket
    key, match each row (event-time order) against earlier live rows with
    Hamming <= bit_diff, earliest source wins; collapse = min source over
    buckets. Kernel bucket keys == Catalyst bucket keys is pinned
    elsewhere; this pins the STATE MACHINE on a non-star graph."""
    import random

    from text_dedup_spark.kernel.simhash import (
        create_permutations,
        simhash_signature,
    )

    rng = random.Random(1234)
    vocab = [f"tok{i}" for i in range(500)]
    rows, texts = [], []
    doc_id = 0
    for _ in range(15):
        base = " ".join(rng.choice(vocab) for _ in range(40))
        variants = [base]
        for _ in range(rng.randint(0, 3)):
            kind = rng.random()
            if kind < 0.4:
                variants.append(base)  # clone
            elif kind < 0.8:
                variants.append(base + " " + rng.choice(vocab))  # near
            else:
                variants.append(
                    " ".join(rng.choice(vocab) for _ in range(40))
                )  # unrelated text inside the group
        for v in variants:
            rows.append((doc_id, v, _t(doc_id)))  # ids ascend with ts
            texts.append(v)
            doc_id += 1
    _run(spark, tmp_path, rows, "rand_flags")
    got = _collapsed(spark, "rand_flags")

    # pure-python oracle of the streaming semantics (single batch: wm=0,
    # no pruning; default cap never reached at this size)
    perms = create_permutations(CFG.f, CFG.bit_diff, CFG.num_bucket)
    sigs = [simhash_signature(t, CFG.f, CFG.ngram) for t in texts]
    buckets: dict = {}
    expect: dict = {}
    for i, s in enumerate(sigs):
        best = None
        keys = [(pi, p.bucket_key(s)) for pi, p in enumerate(perms)]
        for k in keys:
            for j, sj in buckets.get(k, []):
                if hamming_distance(s, sj) <= CFG.bit_diff:
                    best = j if best is None else min(best, j)
                    break  # entries are in arrival order; earliest wins
        for k in keys:
            buckets.setdefault(k, []).append((i, s))
        expect[i] = best
    assert got == expect


def test_capacity_cap_evicts_oldest(spark, tmp_path):
    """max_state_per_bucket=2 over 5 identical-signature rows: each row
    flags to the earliest STILL-LIVE entry, oldest evicted first."""
    rows = [(i, ANCHOR, _t(i)) for i in range(5)]
    _run(spark, tmp_path, rows, "cap_flags", max_state_per_bucket=2)
    got = _collapsed(spark, "cap_flags")
    # r0 first-seen; r1->r0; r2->r0 then r0 evicted; r3->r1 (earliest live
    # after [r1, r2]) then r1 evicted; r4->r2
    assert got == {0: None, 1: 0, 2: 0, 3: 1, 4: 2}


# --- embedding-tier twin: streaming_embedding_near_dup ----------------------

import numpy as np
from pyspark.sql.types import ArrayType, FloatType

from text_dedup_spark.streaming.stateful import streaming_embedding_near_dup

EMB_SCHEMA = StructType(
    [
        StructField("vec_id", LongType()),
        StructField("embedding", ArrayType(FloatType())),
        StructField("ts", TimestampType()),
    ]
)

_RNG = np.random.RandomState(41)
_U = _RNG.normal(size=32)
_U /= np.linalg.norm(_U)
_W = _RNG.normal(size=32)
_W /= np.linalg.norm(_W)


def _vrow(vid, vec, minutes):
    return (vid, [float(x) for x in vec], _t(minutes))


def _run_emb(spark, tmp_path, rows, name, sink="memory", **kwargs):
    path = str(tmp_path / "emb_in")
    spark.createDataFrame(rows, EMB_SCHEMA).coalesce(1).write.mode("append").parquet(path)
    stream = spark.readStream.schema(EMB_SCHEMA).parquet(path)
    flags = streaming_embedding_near_dup(
        stream, "embedding", "ts", eps=0.99, id_col="vec_id", **kwargs
    )
    writer = flags.writeStream.outputMode("append").option(
        "checkpointLocation", str(tmp_path / f"ckpt_{name}")
    ).trigger(availableNow=True)
    if sink == "memory":
        q = writer.format("memory").queryName(name).start()
    else:
        q = writer.format("parquet").start(str(tmp_path / f"out_{name}"))
    q.awaitTermination(180)


def _collapsed_emb(spark, name, tmp_path=None):
    src = (
        spark.read.parquet(str(tmp_path / f"out_{name}"))
        if tmp_path is not None
        else spark.table(name)
    )
    return {
        r["vec_id"]: r["dup_src"]
        for r in collapse_near_dup_flags(src, id_col="vec_id").collect()
    }


def test_embedding_stream_flags_earliest_live_source(spark, tmp_path):
    """Scaled copies (cosine exactly 1.0, different bytes) flag to the
    earliest live source; an orthogonal row never flags."""
    rows = [
        _vrow(10, _U, 0),
        _vrow(11, _U * 1.5, 1),
        _vrow(12, _W, 1),
        _vrow(13, _U * 0.5, 2),
    ]
    _run_emb(spark, tmp_path, rows, "embflags")
    got = _collapsed_emb(spark, "embflags")
    assert got == {10: None, 11: 10, 12: None, 13: 10}


def test_embedding_stream_watermark_expiry_across_restart(spark, tmp_path):
    """State is watermark-bounded across checkpoint restarts: a scaled copy
    arriving long after its source's event time is NOT flagged (the source
    expired), while a fresh in-window pair still flags."""
    # batch 1: anchor at t0; the _W row at t0+30min pushes the watermark to
    # t0+20min, past the anchor
    _run_emb(spark, tmp_path, [_vrow(20, _U, 0), _vrow(22, _W, 30)],
             "embexp", sink="parquet", watermark="10 minutes")
    # batch 2 (same checkpoint): copy of the EXPIRED anchor not flagged;
    # copy of the still-live _W row flagged
    _run_emb(
        spark, tmp_path,
        [_vrow(21, _U * 2.0, 31), _vrow(23, _W * 1.5, 32)],
        "embexp", sink="parquet", watermark="10 minutes",
    )
    got = _collapsed_emb(spark, "embexp", tmp_path)
    assert got == {20: None, 21: None, 22: None, 23: 22}
