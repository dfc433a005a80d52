"""Custom stateful streaming operator: SimHash near-dup within watermark.

``dropDuplicatesWithinWatermark`` (streaming/incremental.py) handles EXACT
keys only; flagging a row as a near-duplicate of an EARLIER stream row —
Hamming(sig_a, sig_b) <= bit_diff, discovered through the same bit-rotation
LSH buckets as the batch path (operators/simhash_dedup.py, reference
semantics simhash.py:305-378) — is not expressible with built-in streaming
operators. This is the ``applyInPandasWithState`` case: state is the set of
recently-seen fingerprints per LSH bucket key.

Scale design (the part that must survive 10^12 rows):

- **State is keyed by (perm, key)** — the same shuffle key as the batch
  bucket join, so hot keys spread over the cluster like any groupBy.
- **Watermark-bounded**: entries older than the event-time watermark are
  pruned on every invocation AND the group sets an event-time timeout so an
  idle bucket's state is REMOVED (not merely shrunk) once the watermark
  passes its newest entry. No unbounded state.
- **Capacity-capped**: at most ``max_state_per_bucket`` fingerprints are
  retained per bucket (oldest evicted first) — the streaming analogue of
  the batch hot-bucket defense (operators/lsh.py broadcast path). A
  pathological bucket degrades to "matches the most recent N", never to
  unbounded memory.
- **Identical kernels**: signatures and bucket keys are the same Arrow UDF /
  Catalyst expressions the batch path uses, so a row's bucket membership is
  bit-identical between modes.

Output contract: one row per (input row x bucket key) —
``(id, event_ts, perm, dup_src)`` where ``dup_src`` is the id of the
EARLIEST still-live fingerprint within ``bit_diff`` in that bucket (ties:
smallest id), or NULL if the row is first-seen there. A row is a near-dup
iff ANY of its buckets found a source; collapse with
``collapse_near_dup_flags`` over the sink table (or in ``foreachBatch``) —
kept OUT of the streaming graph so the query has exactly one stateful
operator (multiple stateful ops in one streaming query are restricted, and
the collapse is a trivial batch groupBy).
"""

from __future__ import annotations

from typing import Iterator, Tuple

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StructField,
    StructType,
    TimestampType,
)

from ..config import SimHashConfig
from ..functions.simhash_udf import bucket_keys_expr, make_simhash_udf
from ..operators.ids import ID

_STATE_SCHEMA = "ids array<long>, sigs array<long>, ts_ms array<long>"


def _out_schema(id_col: str, ts_col: str) -> StructType:
    return StructType(
        [
            StructField(id_col, LongType()),
            StructField(ts_col, TimestampType()),
            StructField("perm", IntegerType()),
            StructField("dup_src", LongType()),
        ]
    )


def _hamming64(a: np.ndarray, b: int) -> np.ndarray:
    """Vectorized popcount(a ^ b) over 64-bit patterns (sign-agnostic)."""
    x = a.astype(np.int64).view(np.uint64) ^ np.uint64(b & 0xFFFFFFFFFFFFFFFF)
    return np.unpackbits(x.view(np.uint8).reshape(len(a), 8), axis=1).sum(axis=1)


def _duration_ms(watermark: str) -> int:
    """Parse the tiny duration grammar used by withWatermark ('N unit')."""
    n, unit = watermark.strip().split(None, 1)
    unit = unit.rstrip("s")  # seconds -> second
    factor = {
        "millisecond": 1,
        "second": 1000,
        "minute": 60_000,
        "hour": 3_600_000,
        "day": 86_400_000,
    }[unit]
    return int(n) * factor


def streaming_simhash_near_dup(
    stream: DataFrame,
    text_col: str,
    ts_col: str,
    cfg: SimHashConfig | None = None,
    id_col: str = ID,
    watermark: str = "10 minutes",
    max_state_per_bucket: int = 256,
) -> DataFrame:
    """Flag stream rows that are SimHash near-duplicates of earlier rows.

    Returns the per-bucket flag frame described in the module docstring
    (append output mode). Rows are matched against bucket state in event-
    time order (ties: id order), so "earlier" is well-defined within and
    across micro-batches; a near-dup arriving later than ``watermark`` past
    its source's event time MAY be missed (state pruned) — the same bounded
    trade ``streaming_exact_dedup`` documents, swept by the periodic batch
    pass.
    """
    cfg = cfg or SimHashConfig()
    bit_diff = cfg.bit_diff
    wm_ms = _duration_ms(watermark)
    cap = max_state_per_bucket

    udf = make_simhash_udf(cfg)
    sigs = (
        stream.withWatermark(ts_col, watermark)
        .select(F.col(id_col), F.col(ts_col), udf(F.col(text_col)).alias("sig"))
        .select(
            id_col,
            ts_col,
            "sig",
            F.posexplode(bucket_keys_expr(F.col("sig"), cfg)).alias("perm", "key"),
        )
    )

    def flag(
        key: Tuple[int, int],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            state.remove()
            return
        ids, sgs, tss = (
            (list(t) for t in state.get) if state.exists else ([], [], [])
        )
        parts = [p for p in pdfs if len(p)]
        if not parts:
            return
        pdf = pd.concat(parts, ignore_index=True)
        # event-time order (ties: id) makes "earliest source" deterministic
        pdf = pdf.sort_values([ts_col, id_col], kind="stable")
        wm = state.getCurrentWatermarkMs()

        # prune expired state once per invocation (watermark only moves
        # between micro-batches, not within one): an entry is live while
        # its event time is still within the watermark
        if ids and wm > 0:
            live = [i for i, t in enumerate(tss) if t >= wm]
            ids = [ids[i] for i in live]
            sgs = [sgs[i] for i in live]
            tss = [tss[i] for i in live]

        out_ids, out_ts, out_src = [], [], []
        for rid, rts, rsig in zip(
            pdf[id_col].values, pdf[ts_col].values, pdf["sig"].values
        ):
            src = None
            if sgs:
                arr = np.asarray(sgs, dtype=np.int64)
                hits = np.nonzero(_hamming64(arr, int(rsig)) <= bit_diff)[0]
                if len(hits):
                    # earliest event time wins; ties: smallest id
                    best = min(hits, key=lambda i: (tss[i], ids[i]))
                    src = ids[best]
            out_ids.append(int(rid))
            out_ts.append(rts)
            out_src.append(src)
            ids.append(int(rid))
            sgs.append(int(rsig))
            tss.append(int(pd.Timestamp(rts).value // 1_000_000))
            if len(ids) > cap:  # hot-bucket defense: evict oldest
                drop = min(range(len(tss)), key=lambda i: (tss[i], ids[i]))
                del ids[drop], sgs[drop], tss[drop]

        state.update((ids, sgs, tss))
        # idle-bucket cleanup: once the watermark passes the newest entry
        # by the watermark delay, every entry is prunable -> remove state.
        # Clamp above the current watermark: Spark rejects a timeout <= the
        # watermark. Late input rows are filtered before this operator in
        # Spark 4.1 (pinned by tests/test_stateful_streaming.py), so the
        # clamp is defense-in-depth for very short watermark configs where
        # max(tss) + wm_ms could land exactly on the watermark.
        state.setTimeoutTimestamp(max(max(tss) + wm_ms, wm + 1))
        yield pd.DataFrame(
            {
                id_col: pd.array(out_ids, dtype="int64"),
                ts_col: out_ts,
                "perm": np.full(len(out_ids), key[0], dtype=np.int32),
                "dup_src": pd.array(out_src, dtype="Int64"),
            }
        )

    return sigs.groupBy("perm", "key").applyInPandasWithState(
        flag,
        _out_schema(id_col, ts_col),
        _STATE_SCHEMA,
        "append",
        GroupStateTimeout.EventTimeTimeout,
    )


def streaming_embedding_near_dup(
    stream: DataFrame,
    vec_col: str,
    ts_col: str,
    eps: float,
    id_col: str = ID,
    watermark: str = "10 minutes",
    nbits: int = 12,
    n_tables: int = 8,
    seed: int = 42,
    max_state_per_bucket: int = 256,
) -> DataFrame:
    """The embedding-tier twin of ``streaming_simhash_near_dup``: flag a
    stream row whose embedding has cosine >= eps with an EARLIER still-live
    row, discovered through the same sign-LSH bucket keys as the batch path
    (operators/ann.py make_sign_lsh_udf — bit-identical bucket membership
    between modes) and verified with the same rounded float64 cosine.

    Same scale contract as the SimHash operator: state keyed by
    (table, key) spreads like the batch bucket join; watermark-pruned +
    event-time-timeout-removed; capacity-capped (a pathological bucket
    degrades to "matches the most recent N", never unbounded memory —
    note the per-entry state here is a full vector, so the cap bounds
    ~cap x dim x 4 bytes per bucket). Output: one row per (input row x
    table) — ``(id, ts, tbl, dup_src)``; collapse with
    ``collapse_near_dup_flags``."""
    from ..operators.ann import _round_half_up, make_sign_lsh_udf

    wm_ms = _duration_ms(watermark)
    cap = max_state_per_bucket
    udf = make_sign_lsh_udf(nbits, n_tables, seed)
    bucketed = (
        stream.withWatermark(ts_col, watermark)
        .select(
            F.col(id_col),
            F.col(ts_col),
            F.col(vec_col).alias("__v__"),
            F.posexplode_outer(udf(F.col(vec_col))).alias("tbl", "key"),
        )
    )
    out_schema = StructType(
        [
            StructField(id_col, LongType()),
            StructField(ts_col, TimestampType()),
            StructField("tbl", IntegerType()),
            StructField("dup_src", LongType()),
        ]
    )

    def flag(
        key: Tuple[int, int],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            state.remove()
            return
        ids, vecs, tss = (
            (list(t) for t in state.get) if state.exists else ([], [], [])
        )
        vecs = [list(v) for v in vecs]
        parts = [p for p in pdfs if len(p)]
        if not parts:
            return
        pdf = pd.concat(parts, ignore_index=True).sort_values(
            [ts_col, id_col], kind="stable"
        )
        wm = state.getCurrentWatermarkMs()
        if ids and wm > 0:
            live = [i for i, t in enumerate(tss) if t >= wm]
            ids = [ids[i] for i in live]
            vecs = [vecs[i] for i in live]
            tss = [tss[i] for i in live]

        out_ids, out_ts, out_src = [], [], []
        for rid, rts, rv in zip(
            pdf[id_col].values, pdf[ts_col].values, pdf["__v__"].values
        ):
            src = None
            if vecs:
                mat = np.array(vecs, dtype=np.float64)
                mat /= np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-300)
                q = np.asarray(rv, dtype=np.float64)
                q /= max(float(np.linalg.norm(q)), 1e-300)
                hits = np.nonzero(_round_half_up(mat @ q) >= eps)[0]
                if len(hits):
                    best = min(hits, key=lambda i: (tss[i], ids[i]))
                    src = ids[best]
            out_ids.append(int(rid))
            out_ts.append(rts)
            out_src.append(src)
            ids.append(int(rid))
            vecs.append([float(x) for x in rv])
            tss.append(int(pd.Timestamp(rts).value // 1_000_000))
            if len(ids) > cap:
                drop = min(range(len(tss)), key=lambda i: (tss[i], ids[i]))
                del ids[drop], vecs[drop], tss[drop]

        state.update((ids, vecs, tss))
        state.setTimeoutTimestamp(max(max(tss) + wm_ms, wm + 1))
        yield pd.DataFrame(
            {
                id_col: pd.array(out_ids, dtype="int64"),
                ts_col: out_ts,
                "tbl": np.full(len(out_ids), key[0], dtype=np.int32),
                "dup_src": pd.array(out_src, dtype="Int64"),
            }
        )

    return bucketed.groupBy("tbl", "key").applyInPandasWithState(
        flag,
        out_schema,
        "ids array<long>, vecs array<array<float>>, ts_ms array<long>",
        "append",
        GroupStateTimeout.EventTimeTimeout,
    )


def collapse_near_dup_flags(flags: DataFrame, id_col: str = ID) -> DataFrame:
    """Batch collapse of the per-bucket flag frame (run over the sink table
    or inside foreachBatch): one row per id, ``dup_src`` = the earliest
    source any bucket found (NULL = first-seen everywhere)."""
    return flags.groupBy(id_col).agg(F.min("dup_src").alias("dup_src"))
