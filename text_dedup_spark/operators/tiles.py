"""Partial-duplicate (crop) image detection via tile perceptual hashes.

Whole-image phash misses the commonest image near-dup the web produces:
a CROP republished as its own image (thumbnails, quadrant screenshots,
social-media re-crops). Tile hashing catches the aligned case exactly:
every image emits 5 fingerprints — full frame + 4 quadrants — and a crop
is detected when some image's FULL hash lands within Hamming ``bit_diff``
of another image's TILE hash (tile 0 vs tile 0 degenerates to plain
whole-image near-dup, so this operator subsumes it).

Scale shape mirrors ``simhash_edges`` (the audited 64-bit path):
identical query fingerprints collapse to one representative before the
bucket join (hot-bucket defense — a meme cropped a million times costs
one representative, not 10^12 pairs), candidates come from the same
bit-rotation bucket keys (pure Catalyst), and the Hamming verify is
``bit_count(xor)`` codegen. The tile explosion is a fixed 5x on the
fingerprint table — ids and longs only, never pixels."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..config import SimHashConfig
from ..functions.simhash_udf import bucket_keys_expr, hamming_expr


def crop_match_edges(
    tiles: DataFrame,
    id_col: str = "image_id",
    bit_diff: int = 3,
    num_bucket: int = 4,
) -> DataFrame:
    """tiles(id_col, tile:int, fp:long) with tile 0 = full frame ->
    (crop_id, host_id, host_tile, dist): crop_id's full-frame hash is
    within ``bit_diff`` of host_id's tile hash. Self-pairs excluded;
    deduplicated per (crop, host, tile)."""
    cfg = SimHashConfig(f=64, bit_diff=bit_diff, num_bucket=num_bucket)
    q = tiles.where(F.col("tile") == 0).select(
        F.col(id_col).alias("__qid__"), F.col("fp").alias("__qfp__")
    )
    # identical-signature collapse on the query side (exact-dup crops are
    # the hot case); matches re-expand to every member afterwards
    qreps = q.groupBy("__qfp__").agg(F.min("__qid__").alias("__qrep__"))
    qb = qreps.select(
        "__qrep__",
        "__qfp__",
        F.posexplode(bucket_keys_expr(F.col("__qfp__"), cfg)).alias("perm", "key"),
    )
    tb = tiles.select(
        F.col(id_col).alias("__hid__"),
        F.col("tile").alias("host_tile"),
        F.col("fp").alias("__hfp__"),
        F.posexplode(bucket_keys_expr(F.col("fp"), cfg)).alias("perm", "key"),
    )
    rep_pairs = (
        qb.join(tb, ["perm", "key"])
        .where(hamming_expr(F.col("__qfp__"), F.col("__hfp__")) <= bit_diff)
        .select(
            "__qfp__",
            F.col("__hid__").alias("host_id"),
            "host_tile",
            hamming_expr(F.col("__qfp__"), F.col("__hfp__")).alias("dist"),
        )
        .dropDuplicates(["__qfp__", "host_id", "host_tile"])
    )
    return (
        q.join(rep_pairs, "__qfp__")
        .where(F.col("__qid__") != F.col("host_id"))
        .select(
            F.col("__qid__").alias("crop_id"), "host_id", "host_tile", "dist"
        )
    )
