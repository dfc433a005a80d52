"""Structured Streaming -> Iceberg sink with exactly-once appends.

Spark's foreachBatch contract is at-least-once: after a crash between the
batch function's side effect and the streaming checkpoint commit, the same
(batch_id, data) pair is REPLAYED on restart. The standard Iceberg pattern
upgrades that to exactly-once by making the append idempotent on the batch
id: each successful append records ``streaming-batch-id`` (and the query
id) in its snapshot summary, and a replayed batch whose id is already
present in the table's snapshot history becomes a no-op.

This is the streaming half of the north rule's Iceberg story: the batch
pipelines checkpoint to Iceberg via NativeIcebergCatalog; a streaming
ingest lands new documents in the SAME table format, snapshot-audited,
with the dedup kernels applied per micro-batch upstream
(streaming/incremental.py) and global clustering remaining the periodic
batch job over the accumulated table.

Scale note: the idempotence check reads snapshot summaries from table
metadata (driver-side JSON, one entry per commit) — no data files are
touched. Pair with ``expire_snapshots`` to bound metadata growth on
long-running streams.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from ..sources.iceberg import NativeIcebergTable

_BATCH_KEY = "streaming-batch-id"
_QUERY_KEY = "streaming-query-id"


def committed_stream_batches(table: NativeIcebergTable) -> set[int]:
    """Batch ids already appended to the table (from snapshot summaries)."""
    if not table.exists():
        return set()
    return {
        int(s["summary"][_BATCH_KEY])
        for s in table.snapshots()
        if _BATCH_KEY in s.get("summary", {})
    }


def append_stream_batch(
    table: NativeIcebergTable,
    batch_df: DataFrame,
    batch_id: int,
    query_id: str | None = None,
) -> bool:
    """Idempotent append of one micro-batch. Returns True if the batch was
    appended, False if its id was already committed (replay after failure
    — foreachBatch's at-least-once becomes exactly-once)."""
    if batch_id in committed_stream_batches(table):
        return False
    extra = {_BATCH_KEY: str(batch_id)}
    if query_id is not None:
        extra[_QUERY_KEY] = query_id
    table.append(batch_df, summary_extra=extra)
    return True


def start_iceberg_stream(
    stream: DataFrame,
    location: str,
    checkpoint_dir: str,
    available_now: bool = True,
    query_name: str = "iceberg-sink",
):
    """Start a streaming query appending micro-batches to an Iceberg table
    at ``location``. ``available_now=True`` drains the currently available
    input and stops (the incremental-ingest shape the staged pipelines
    use); False runs continuously."""
    spark = stream.sparkSession

    def _sink(batch_df: DataFrame, batch_id: int) -> None:
        append_stream_batch(
            NativeIcebergTable(spark, location), batch_df, batch_id)

    writer = (
        stream.writeStream.foreachBatch(_sink)
        .option("checkpointLocation", checkpoint_dir)
        .queryName(query_name)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
