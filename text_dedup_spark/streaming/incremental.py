"""Structured-Streaming incremental front-ends.

The reference is batch-only (SURVEY §2.9): incrementality is faked with a
PREV_ID side-channel file plus per-dataset re-runs of the hash stage
(minhash_spark_onlyHash.py:307-382). The Spark-native equivalent is a
streaming ingest of new documents that keeps the SAME kernels and checkpoint
tables:

- ``streaming_exact_dedup``: drop exact duplicates within the stream with
  state (``dropDuplicatesWithinWatermark`` on the content hash), emitting
  first-seen rows — the streaming analogue of the reference's first-wins
  Bloom/exact scan (exact_hash.py:48-63).
- ``streaming_minhash_signatures`` / ``streaming_band_rows``: stamp each
  micro-batch with MinHash signatures / exploded (band, band_hash) rows and
  append them to the signature checkpoint table. Global clustering stays a
  periodic BATCH job over the accumulated table (plans/staged.stage_dedup) —
  connected components is not expressible as an incremental streaming op,
  and the reference's own design (hash incrementally, dedup globally) makes
  exactly this split.

Every transformation here is the same Catalyst expression / pandas UDF used
by the batch path, so streamed and batch outputs are bit-identical for the
same rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..config import MinHashConfig
from ..functions.minhash_udf import make_signature_udf
from ..operators.exact import content_hash
from ..operators.ids import ID


def streaming_exact_dedup(
    stream: DataFrame,
    text_col: str,
    ts_col: str,
    watermark: str = "10 minutes",
    algo: str = "md5",
) -> DataFrame:
    """First-seen-wins exact dedup over a stream.

    State is bounded by the watermark: duplicates arriving later than
    ``watermark`` past their first occurrence's event time are NOT dropped
    (documented trade — unbounded state cannot exist at 10^12 scale; the
    periodic batch exact pass sweeps stragglers).
    """
    hashed = stream.withColumn("__h__", content_hash(F.col(text_col), algo))
    return (
        hashed.withWatermark(ts_col, watermark)
        .dropDuplicatesWithinWatermark(["__h__"])
        .drop("__h__")
    )


def streaming_minhash_signatures(
    stream: DataFrame,
    text_col: str,
    cfg: MinHashConfig,
    id_col: str = ID,
) -> DataFrame:
    """(id, signature: array<long>) per streamed document — stateless
    projection, safe in append mode; identical values to the batch
    signature checkpoint (functions/minhash_udf.make_signature_udf)."""
    udf = make_signature_udf(cfg)
    return stream.select(F.col(id_col), udf(F.col(text_col)).alias("signature"))


def streaming_band_rows(
    stream: DataFrame,
    text_col: str,
    cfg: MinHashConfig,
    id_col: str = ID,
) -> DataFrame:
    """(id, band, band_hash) rows per streamed document — literally the
    batch operator applied to the streaming frame (stateless select +
    explode), appendable to the bands checkpoint table consumed by the
    batch stage_dedup."""
    from ..operators.lsh import band_rows

    return band_rows(stream, text_col, cfg, id_col)
