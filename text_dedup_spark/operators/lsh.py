"""LSH banding: explode band keys, group candidate buckets, emit star edges.

Reference dataflow (minhash_spark.py:352-367): per-row flatMap -> RDD
``groupBy((band, hash))`` -> per-bucket ``generate_edges`` (all ids point at
the bucket min — the O(n) "star" instead of the O(n^2) clique) -> distinct.

DataFrame re-derivation, chosen for scale:
- ``posexplode`` of the array<binary> band column (the UDTF step).
- Bucket min via ``groupBy(band, band_hash).agg(min(id))``: hash aggregate
  WITH map-side partial aggregation, so a degenerate hot bucket (e.g. the
  all-MAX_HASH short-document signature, SURVEY §7.4) reduces to one row per
  task before the shuffle — no salting needed for the min itself.
- Edges via joining the per-bucket min back: the join IS skewed on hot
  buckets, which is exactly what AQE skewJoin splitting handles
  (session.py). min is associative so split partitions still produce
  identical edges.
- ``dropDuplicates`` instead of RDD distinct (same shuffle, but Catalyst
  can push it into the aggregate).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..config import MinHashConfig
from ..functions.minhash_udf import make_band_hashes_udf
from .ids import ID


def band_rows(df: DataFrame, text_col: str, cfg: MinHashConfig, id_col: str = ID) -> DataFrame:
    """(id, band:int, band_hash:binary) — one row per (document, band)."""
    udf = make_band_hashes_udf(cfg)
    return (
        df.select(F.col(id_col), udf(F.col(text_col)).alias("__bands__"))
        .select(
            F.col(id_col),
            F.posexplode_outer("__bands__").alias("band", "band_hash"),
        )
    )


def candidate_edges(bands: DataFrame, id_col: str = ID) -> DataFrame:
    """(src, dst) duplicate-candidate edges; dst = min id of the bucket.

    Buckets of size 1 produce no edge (the min-join filters id != min), which
    matches generate_edges' len<=1 early-out (minhash_spark.py:239-240).
    """
    mins = bands.groupBy("band", "band_hash").agg(F.min(id_col).alias("__min__"))
    return (
        bands.join(mins, ["band", "band_hash"])
        .where(F.col(id_col) != F.col("__min__"))
        .select(F.col(id_col).alias("src"), F.col("__min__").alias("dst"))
        .dropDuplicates(["src", "dst"])
    )


def edges_from_band_rows(bands: DataFrame, id_col: str = ID) -> DataFrame:
    return candidate_edges(bands, id_col)


def minhash_edges(
    df: DataFrame, text_col: str, cfg: MinHashConfig, id_col: str = ID
) -> DataFrame:
    from pyspark import StorageLevel

    # bands feed two shuffles (bucket-min agg + join back); persisting them
    # runs the signature UDF once instead of twice. MEMORY_AND_DISK: band
    # rows are num_bands x corpus and may not fit in executor memory.
    bands = band_rows(df, text_col, cfg, id_col).persist(StorageLevel.MEMORY_AND_DISK)
    return candidate_edges(bands, id_col)
