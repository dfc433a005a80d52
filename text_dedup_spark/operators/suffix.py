"""Suffix-array-equivalent substring dedup operator.

Reference pipeline (suffix_array.py:274-358, SURVEY §2.7): concatenate the
corpus into one byte stream, external SA tools find >= k-byte duplicate
ranges, `restore` maps them into documents, ranges are blanked out and empty
docs dropped.

Spark mapping, two scopes:

- ``global_scope=False`` (partition-local): `mapInPandas` passes of the
  vectorized rolling-hash kernel (kernel/substr.py). Each task concatenates
  ITS partition; cross-partition duplicate substrings fall to the
  MinHash/exact layers. ``repartition(col)`` by a stable key (not
  round-robin) makes the output deterministic for a given partition count.

- ``global_scope=True`` (distributed global): reproduces the reference's
  whole-corpus single-stream semantics WITHOUT a single-task stage. The
  global stream is defined as the id-ordered concatenation (deterministic,
  partition-count-invariant). Three rounds:

  1. range-partition by id; each partition emits its distinct 128-bit
     k-gram hashes with counts capped at 2, plus its first/last k-1 bytes
     (the seam material, <= 2(k-1) bytes per partition);
  2. the driver hashes the seam-straddling grams (all their bytes are
     within k-1 of a seam, hence inside the collected heads/tails); a
     groupBy (h1,h2) totals counts; every partition learns which of its
     locally-unique grams are duplicated elsewhere (left_semi join), and
     duplicated straddle spans become explicit pre-clipped local ranges;
  3. each partition unions byte-exact local dup positions with
     hash-matched cross-partition positions and seam ranges, then runs the
     same restore/merge/clean algebra as the single-stream pass.

  Exactness: segments are maximal runs of the covered-byte set, and
  partition seams coincide with document boundaries — where `restore`
  splits segments anyway — so clipping coverage at partition edges yields
  per-doc ranges identical to the single-stream pass. Partition-local dups
  stay byte-exact; cross-partition matching is 128-bit-hash exact
  (collision odds < 1e-10 at 10^14 grams).

  Scale shape: no stage exceeds partition-sized memory; the shuffles are
  one range repartition of (id, text) and ONE gram-space exchange
  (~28 bytes per distinct gram through a groupBy whose aggregate yields
  both the dup test and the notifications). Notifications are raw
  (partition, position) pairs — a notified gram is by definition locally
  unique, so its one position identifies it — which makes the finalize
  pass hash-free. When the notification set is small (the common case) it
  is broadcast and stage 3 is a second pass over the already-partitioned,
  persisted input — no second corpus shuffle; otherwise a cogroup delivers
  notifications partition-aligned.
"""

from __future__ import annotations

from typing import Iterator, List, Tuple

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from ..config import SuffixConfig
from ..kernel.substr import (
    dedup_documents,
    distinct_hash_counts,
    positions_to_segments,
    straddle_coverage,
    straddle_grams,
)
from .ids import ID

_PART = "__part__"


def _out_schema(id_col: str, text_col: str) -> StructType:
    return StructType(
        [
            StructField(id_col, LongType()),
            StructField(text_col, StringType()),
            StructField("dup_bytes", LongType()),
        ]
    )


def remove_duplicate_substrings(
    df: DataFrame,
    text_col: str,
    cfg: SuffixConfig | None = None,
    id_col: str = ID,
    num_partitions: int | None = None,
    broadcast_notify_max: int = 2_000_000,
) -> DataFrame:
    """Returns (id, <text_col> cleaned, dup_bytes). Empty survivors are
    filtered (suffix_array.py:354-357 / P8)."""
    cfg = cfg or SuffixConfig()
    if cfg.global_scope:
        return _global_distributed(
            df, text_col, cfg, id_col, num_partitions, broadcast_notify_max
        )
    schema = _out_schema(id_col, text_col)
    k, strategy = cfg.k, cfg.merge_strategy

    def process(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # whole-partition pass: concatenate the partition's batches so the
        # dedup scope is the partition, not the Arrow batch
        parts = list(batches)
        if not parts:
            return
        pdf = pd.concat(parts, ignore_index=True)
        docs = list(zip(pdf[id_col].tolist(), pdf[text_col].fillna("").tolist()))
        rows = dedup_documents(docs, k, strategy)
        for s in range(0, len(rows), 10_000):  # bounded yields (hash_scan)
            yield pd.DataFrame(
                rows[s : s + 10_000], columns=[id_col, text_col, "dup_bytes"])

    selected = df.select(id_col, text_col)
    if num_partitions is not None:
        selected = selected.repartition(num_partitions, F.col(id_col))
    cleaned = selected.mapInPandas(process, schema)
    return cleaned.where(F.length(F.col(text_col)) > 0)


def _global_distributed(
    df: DataFrame,
    text_col: str,
    cfg: SuffixConfig,
    id_col: str,
    num_partitions: int | None,
    broadcast_notify_max: int,
) -> DataFrame:
    from pyspark import StorageLevel

    spark = df.sparkSession
    k, strategy = cfg.k, cfg.merge_strategy
    if num_partitions is not None:
        n_parts = num_partitions
    else:
        # small inputs get few partitions (each extra task costs fixed
        # scheduling + python-worker spin-up across this operator's three
        # jobs — measured: a 3 MB corpus runs 2.4x faster at 8 partitions
        # than at 32); large inputs get full parallelism. Catalyst's plan
        # statistics give a free byte estimate; ~512 KB of text per
        # partition amortizes the per-task overhead, and the
        # defaultParallelism clamp takes over as soon as the corpus can
        # feed every core.
        est = None
        try:
            # private JVM accessor, stable across Spark 3.0-4.1 (the
            # queryExecution/optimizedPlan/stats chain is part of the
            # semi-public QueryExecution API); guarded — any failure falls
            # back to the partition-count heuristic below
            est = int(df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes())
        except Exception:
            pass
        par = spark.sparkContext.defaultParallelism
        if est and 0 < est < (1 << 60):  # unknown stats default to huge
            # stats track on-disk (compressed) bytes; text expands ~4-6x,
            # so a 256 KB divisor targets ~1-1.5 MB of text per partition.
            # Two measured forces set that size (100x scale run): the
            # partition-local SA kernel is superlinear in blob size, so a
            # corpus that outgrows cores x ~1 MB must get MORE partitions
            # (waves of small tasks: 376 s at 32 x 10 MB blobs vs 272 s
            # at 320 x 1 MB on the same 32 cores, identical output) —
            # hence NO core-count clamp — while per-task overhead across
            # this operator's three jobs punishes over-partitioning
            # (sub-300 KB blobs ran 2x slower at 30 MB corpus scale). The
            # 512 ceiling only bounds sandbox scheduling overhead; a real
            # cluster's defaultParallelism exceeds it anyway.
            n_parts = max(4, min(-(-est // (256 * 1024)), max(par, 512)))
        else:
            n_parts = max(1, min(df.rdd.getNumPartitions(), par))

    part = (
        df.select(id_col, text_col)
        .repartitionByRange(n_parts, F.col(id_col))
        .sortWithinPartitions(id_col)
        .withColumn(_PART, F.spark_partition_id())
        .persist(StorageLevel.MEMORY_AND_DISK)
    )

    seam_schema = StructType(
        [
            StructField(_PART, IntegerType()),
            StructField("blen", LongType()),
            StructField("head", BinaryType()),
            StructField("tail", BinaryType()),
        ]
    )

    # All three partition scans (seam, hash, finalize) must assemble BYTE-
    # IDENTICAL blobs or notification positions mis-map. Sorting by
    # (id, text) makes the blob deterministic even under duplicate ids and
    # job-to-job arrival-order differences: rows with equal keys have equal
    # bytes, so their relative order cannot change the blob.
    def seam_scan(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        parts_ = list(batches)
        if not parts_:
            return
        pdf = pd.concat(parts_, ignore_index=True).sort_values([id_col, text_col], kind="stable")
        pid = int(pdf[_PART].iloc[0])
        blob = b"".join(t.encode("utf-8") for t in pdf[text_col].fillna(""))
        if len(blob) == 0:
            return
        m = min(len(blob), k - 1)
        yield pd.DataFrame(
            {_PART: [pid], "blen": [len(blob)], "head": [blob[:m]], "tail": [blob[-m:]]}
        )

    hash_schema = StructType(
        [
            StructField(_PART, IntegerType()),
            StructField("h1", LongType()),
            StructField("h2", LongType()),
            StructField("cnt", IntegerType()),
            StructField("pos", LongType()),
        ]
    )

    def hash_scan(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        parts_ = list(batches)
        if not parts_:
            return
        pdf = pd.concat(parts_, ignore_index=True).sort_values([id_col, text_col], kind="stable")
        pid = int(pdf[_PART].iloc[0])
        blob = b"".join(t.encode("utf-8") for t in pdf[text_col].fillna(""))
        if len(blob) < k:
            return
        h1, h2, cnt, pos = distinct_hash_counts(blob, k)
        # bounded yields: one unbounded DataFrame here becomes ONE Arrow
        # record batch — at a ~10 MB partition blob that is ~10M gram rows
        # (~300 MB of direct buffer on the JVM reader side), and 32
        # concurrent tasks blow the 8 GB direct-memory cap (measured at
        # the 100x scale run, netty OutOfDirectMemoryError; same hazard
        # class as sources/synth.py's generator). 1M-row chunks are ~32 MB
        # per batch worst-case — bounded regardless of partition size.
        chunk = 1 << 20
        for s in range(0, len(h1), chunk):
            e = s + chunk
            yield pd.DataFrame(
                {
                    _PART: np.full(len(h1[s:e]), pid, dtype=np.int32),
                    "h1": h1[s:e],
                    "h2": h2[s:e],
                    "cnt": cnt[s:e],
                    "pos": pos[s:e],
                }
            )

    try:
        # job 1 (cheap, bytes only — also materializes the `part` cache):
        # per-partition seam material, then the driver hashes every gram
        # that straddles a partition seam (all its bytes are within k-1 of
        # the seam, hence inside the collected heads/tails)
        seam_rows = sorted(
            part.mapInPandas(seam_scan, seam_schema).collect(),
            key=lambda r: r[_PART],
        )
        seams: List[Tuple[int, int, bytes, bytes]] = [
            (r[_PART], r["blen"], bytes(r["head"]), bytes(r["tail"]))
            for r in seam_rows
        ]
        strad = straddle_grams(seams, k)  # [(h1, h2, gpos)] — driver-bounded

        emits = part.mapInPandas(hash_scan, hash_schema)
        if strad:
            # one row PER straddle occurrence (cnt=1, pos=global position):
            # multiplicity feeds the total, and duplicated occurrences come
            # back with their global position for span mapping
            strad_rows = spark.createDataFrame(
                [(-1, h1, h2, 1, g) for h1, h2, g in strad],
                f"{_PART} int, h1 long, h2 long, cnt int, pos long",
            )
            emits = emits.unionByName(strad_rows)

        # ONE wide shuffle of the gram space, hashed by (h1, h2) into
        # SIZE-BOUNDED partitions; every occurrence of a gram lands in one
        # partition, so the dup test (total >= 2) and the member filter
        # resolve LOCALLY in a vectorized pandas pass — no aggregation
        # state, no join, no sort. A member with cnt == 1 is a
        # locally-unique gram duplicated elsewhere -> its (partition,
        # position) is the whole notification; part == -1 members are
        # duplicated straddle grams whose global position the driver maps
        # to clipped per-partition ranges.
        #
        # Shape history (both predecessors measured-dead at the 100x
        # scale run, BENCH/SCALE.md): groupBy + collect_list(struct(...))
        # exhausted the execution pool (one object list buffer per
        # in-flight group, ~10M groups/task x 32 tasks ->
        # UNABLE_TO_ACQUIRE_MEMORY), and the sum-agg + left_semi rewrite
        # was memory-safe but sort-spilled the 8 GB gram shuffle ~6x over
        # (agg spill + two SMJ sort sides + dup-key shuffle: >60 GB
        # scratch, died on disk). This shape shuffles the gram space
        # exactly once and bounds BOTH memory and scratch: partition
        # count is derived from the known blob size (~3 MB of gram rows
        # per partition -> ~100 MB pandas frames), an explicit
        # numPartitions repartition AQE won't coalesce.
        total_blen = sum(b for _, b, _, _ in seams)
        n_gram_parts = max(
            spark.sparkContext.defaultParallelism,
            -(-total_blen // 3_000_000),
        )

        def gram_scan(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            parts_ = list(batches)
            if not parts_:
                return
            pdf = pd.concat(parts_, ignore_index=True)
            tot = pdf.groupby(["h1", "h2"])["cnt"].transform("sum")
            out = pdf.loc[
                (tot >= 2) & ((pdf["cnt"] == 1) | (pdf[_PART] == -1)),
                [_PART, "pos"],
            ]
            for s in range(0, len(out), 1 << 20):  # bounded yields
                yield out.iloc[s : s + (1 << 20)]

        notif_rows = emits.repartition(n_gram_parts, "h1", "h2").mapInPandas(
            gram_scan, f"{_PART} int, pos long"
        )

        # Compress notifications to coverage INTERVALS per partition before
        # they leave the cluster: the dup positions of a partition collapse
        # into maximal runs of  ∪ [p, p+k)  — the exact shape the finalize
        # pass needs. Dup-heavy corpora (whole documents duplicated) shrink
        # from one row per gram to one row per duplicated region. One extra
        # NARROW shuffle of (part, pos) rows, inside the same action.
        # part == -1 rows are straddle-gram global positions (bounded by
        # n_parts * (k-1)); they pass through uncompressed (kind=1).
        def compress(pdf: pd.DataFrame) -> pd.DataFrame:
            pid = int(pdf[_PART].iloc[0])
            pos = np.sort(pdf["pos"].to_numpy())
            if pid == -1:
                return pd.DataFrame(
                    {_PART: np.full(len(pos), -1, dtype=np.int32),
                     "kind": np.ones(len(pos), dtype=np.int32),
                     "lo": pos, "hi": pos}
                )
            segs = positions_to_segments(pos, k)
            lo = np.array([a for a, _ in segs], dtype=np.int64)
            hi = np.array([b for _, b in segs], dtype=np.int64)
            return pd.DataFrame(
                {_PART: np.full(len(segs), pid, dtype=np.int32),
                 "kind": np.zeros(len(segs), dtype=np.int32),
                 "lo": lo, "hi": hi}
            )

        # explicit width: the default shuffle partition count packs
        # ~n_parts/shuffle_partitions text partitions' notifications into
        # one task — on a heavily-duplicated corpus (one notification per
        # corpus byte; the clone-doubled 100x scale corpus is the
        # worst case) that concentration heap-OOMed. Hash by _PART at the
        # text-partition count instead: per-task volume is bounded by ONE
        # partition's notifications, and the repartition's partitioning
        # satisfies the groupBy's distribution so no second exchange.
        compressed = notif_rows.repartition(
            max(spark.sparkContext.defaultParallelism, n_parts), F.col(_PART)
        ).groupBy(_PART).applyInPandas(
            compress, f"{_PART} int, kind int, lo long, hi long"
        )
        fetch_cap = broadcast_notify_max + len(strad) + 1
        # job 2 (the big one): scan+hash+aggregate+compress, single action;
        # Arrow collection (toPandas), never per-Row objects
        fetched = compressed.limit(fetch_cap).toPandas()

        out_schema = _out_schema(id_col, text_col)
        if len(fetched) < fetch_cap:
            is_strad = fetched["kind"].to_numpy() == 1
            dup_gpos = fetched["lo"].to_numpy()[is_strad]
            ranges_by_part: dict = {}
            for pid, lo, hi in straddle_coverage(seams, dup_gpos.tolist(), k):
                ranges_by_part.setdefault(pid, []).append((lo, hi))
            for pid, g in fetched[~is_strad].groupby(_PART):
                ranges_by_part.setdefault(int(pid), []).extend(
                    zip(g["lo"].tolist(), g["hi"].tolist())
                )
            bc = spark.sparkContext.broadcast(ranges_by_part)

            def finalize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
                parts_ = list(batches)
                if not parts_:
                    return
                pdf = pd.concat(parts_, ignore_index=True).sort_values([id_col, text_col], kind="stable")
                pid = int(pdf[_PART].iloc[0])
                docs = list(zip(pdf[id_col].tolist(), pdf[text_col].fillna("").tolist()))
                rows = dedup_documents(
                    docs, k, strategy, extra_ranges=bc.value.get(pid, [])
                )
                # bounded yields (see hash_scan): document rows are fatter
                # than gram rows, chunk by count
                for s in range(0, len(rows), 10_000):
                    yield pd.DataFrame(
                        rows[s : s + 10_000],
                        columns=[id_col, text_col, "dup_bytes"])

            cleaned = part.mapInPandas(finalize, out_schema)
        else:
            # even the compressed interval set exceeds the broadcast cap
            # (pathological: isolated dup grams spaced > k apart across the
            # whole corpus): deliver intervals partition-aligned via
            # cogroup. Straddle rows are driver-bounded — collect just them
            # (recomputes the scan once more; rare path).
            strad_pdf = compressed.where(F.col("kind") == 1).toPandas()
            seam_ranges = straddle_coverage(seams, strad_pdf["lo"].tolist(), k)
            ranges_df = spark.createDataFrame(
                seam_ranges, f"{_PART} int, lo long, hi long"
            )
            notif_all = compressed.where(F.col("kind") == 0).select(
                _PART, "lo", "hi"
            ).unionByName(ranges_df)

            def cofinalize(docs_pdf: pd.DataFrame, notif_pdf: pd.DataFrame) -> pd.DataFrame:
                if len(docs_pdf) == 0:
                    return pd.DataFrame(columns=[id_col, text_col, "dup_bytes"])
                docs_pdf = docs_pdf.sort_values([id_col, text_col], kind="stable")
                docs = list(
                    zip(docs_pdf[id_col].tolist(), docs_pdf[text_col].fillna("").tolist())
                )
                ranges = list(
                    zip(notif_pdf["lo"].tolist(), notif_pdf["hi"].tolist())
                )
                rows = dedup_documents(docs, k, strategy, extra_ranges=ranges)
                return pd.DataFrame(rows, columns=[id_col, text_col, "dup_bytes"])

            cleaned = (
                part.groupby(_PART)
                .cogroup(notif_all.groupby(_PART))
                .applyInPandas(cofinalize, out_schema)
            )

        # job 3: materialize before releasing the cache the plan depends on
        return cleaned.where(F.length(F.col(text_col)) > 0).localCheckpoint(
            eager=True
        )
    finally:
        part.unpersist()


def duplicate_byte_stats(
    df: DataFrame,
    text_col: str,
    cfg: SuffixConfig | None = None,
    id_col: str = ID,
) -> DataFrame:
    """(total_bytes, dup_bytes, dup_ratio) aggregate — the reference logs
    'total duplicate size' (suffix_array.py:187-233 return value)."""
    cfg = cfg or SuffixConfig()
    cleaned = remove_duplicate_substrings(df, text_col, cfg, id_col)
    original = df.select(
        F.sum(F.octet_length(F.col(text_col))).alias("total_bytes")
    )
    dup = cleaned.select(F.sum("dup_bytes").alias("dup_bytes"))
    return original.crossJoin(dup).select(
        "total_bytes",
        "dup_bytes",
        (F.col("dup_bytes") / F.col("total_bytes")).alias("dup_ratio"),
    )
