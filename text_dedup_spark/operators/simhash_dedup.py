"""SimHash near-dedup: bit-rotation bucketing + Hamming-verified candidate
pairs, over either a text column (caption) or a precomputed 64-bit
fingerprint column (the image ``phash`` path, BASELINE.json F14).

Reference semantics (simhash.py:305-378): items sharing a bucket key under
ANY permutation whose fingerprints differ by <= bit_diff bits get unioned.

Scale-conscious re-derivation:
1. Collapse identical fingerprints first: one node per DISTINCT signature
   (representative = min id), with intra-group star edges. Hamming(x, x) = 0
   so members of an identical-signature group are always one cluster —
   partition-equivalent to the reference, and it shrinks the quadratic
   within-bucket pair join by the (large) exact-dup factor.
2. Bucket keys are Catalyst bitwise expressions (functions/simhash_udf.py):
   the shuffle key never touches Python.
3. Within-bucket pairs via self-join on (perm, key) with
   ``bit_count(a ^ b) <= k`` — the same O(bucket^2) the reference's linear
   scan performs, but distributed and AQE-skew-split.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..config import SimHashConfig
from ..functions.simhash_udf import (
    bucket_keys128_expr,
    bucket_keys_expr,
    hamming128_expr,
    hamming_expr,
    make_simhash128_udf,
    make_simhash_udf,
)
from .cc import connected_components
from .ids import ID


def simhash_fingerprints(df: DataFrame, text_col: str, cfg: SimHashConfig, id_col: str = ID) -> DataFrame:
    """(id, sig:long) from a text column via the Arrow-batched UDF."""
    udf = make_simhash_udf(cfg)
    return df.select(F.col(id_col), udf(F.col(text_col)).alias("sig"))


def simhash_edges(sigs: DataFrame, cfg: SimHashConfig, id_col: str = ID) -> DataFrame:
    """sigs(id, sig) -> candidate edges (src, dst) after Hamming verify."""
    reps = sigs.groupBy("sig").agg(F.min(id_col).alias("rep"))

    intra = (
        sigs.join(reps, "sig")
        .where(F.col(id_col) != F.col("rep"))
        .select(F.col(id_col).alias("src"), F.col("rep").alias("dst"))
    )

    buckets = reps.select(
        "rep", "sig", F.posexplode(bucket_keys_expr(F.col("sig"), cfg)).alias("perm", "key")
    )
    left = buckets.select(
        F.col("perm"), F.col("key"), F.col("rep").alias("id_a"), F.col("sig").alias("sig_a")
    )
    right = buckets.select(
        F.col("perm"), F.col("key"), F.col("rep").alias("id_b"), F.col("sig").alias("sig_b")
    )
    pairs = (
        left.join(right, ["perm", "key"])
        .where(F.col("id_a") < F.col("id_b"))
        .where(hamming_expr(F.col("sig_a"), F.col("sig_b")) <= cfg.bit_diff)
        .select(F.col("id_b").alias("src"), F.col("id_a").alias("dst"))
        .dropDuplicates(["src", "dst"])
    )
    return intra.unionAll(pairs).dropDuplicates(["src", "dst"])


def simhash_edges128(sigs: DataFrame, cfg: SimHashConfig, id_col: str = ID) -> DataFrame:
    """Two-long (f=128) variant of ``simhash_edges``: identical-signature
    collapse on (sig_hi, sig_lo), Catalyst bucket keys, 128-bit Hamming."""
    reps = sigs.groupBy("sig_hi", "sig_lo").agg(F.min(id_col).alias("rep"))

    intra = (
        sigs.join(reps, ["sig_hi", "sig_lo"])
        .where(F.col(id_col) != F.col("rep"))
        .select(F.col(id_col).alias("src"), F.col("rep").alias("dst"))
    )

    buckets = reps.select(
        "rep", "sig_hi", "sig_lo",
        F.posexplode(
            bucket_keys128_expr(F.col("sig_hi"), F.col("sig_lo"), cfg)
        ).alias("perm", "key"),
    ).select(
        "rep", "sig_hi", "sig_lo", "perm",
        F.col("key.key_hi").alias("key_hi"), F.col("key.key_lo").alias("key_lo"),
    )
    left = buckets.select(
        "perm", "key_hi", "key_lo",
        F.col("rep").alias("id_a"),
        F.col("sig_hi").alias("a_hi"), F.col("sig_lo").alias("a_lo"),
    )
    right = buckets.select(
        "perm", "key_hi", "key_lo",
        F.col("rep").alias("id_b"),
        F.col("sig_hi").alias("b_hi"), F.col("sig_lo").alias("b_lo"),
    )
    pairs = (
        left.join(right, ["perm", "key_hi", "key_lo"])
        .where(F.col("id_a") < F.col("id_b"))
        .where(
            hamming128_expr(
                F.col("a_hi"), F.col("a_lo"), F.col("b_hi"), F.col("b_lo")
            )
            <= cfg.bit_diff
        )
        .select(F.col("id_b").alias("src"), F.col("id_a").alias("dst"))
        .dropDuplicates(["src", "dst"])
    )
    return intra.unionAll(pairs).dropDuplicates(["src", "dst"])


def simhash_assignments_from_text(
    df: DataFrame, text_col: str, cfg: SimHashConfig | None = None, id_col: str = ID
) -> DataFrame:
    cfg = cfg or SimHashConfig()
    # persist: sigs feed both the identical-signature collapse and the bucket
    # join, and the text UDF is the expensive stage — compute it once
    if cfg.f == 128:
        udf = make_simhash128_udf(cfg)
        sigs = df.select(
            F.col(id_col), udf(F.col(text_col)).alias("s")
        ).select(id_col, "s.sig_hi", "s.sig_lo").persist()
        try:
            return connected_components(simhash_edges128(sigs, cfg, id_col), id_col)
        finally:
            sigs.unpersist()
    sigs = simhash_fingerprints(df, text_col, cfg, id_col).persist()
    try:
        return connected_components(simhash_edges(sigs, cfg, id_col), id_col)
    finally:
        sigs.unpersist()


def simhash_assignments_from_fingerprint(
    df: DataFrame, fp_col: str, cfg: SimHashConfig | None = None, id_col: str = ID
) -> DataFrame:
    """Image near-dup over a stored 64-bit perceptual hash column: the whole
    candidate generation is JVM-only (no Python anywhere)."""
    cfg = cfg or SimHashConfig()
    sigs = df.select(F.col(id_col), F.col(fp_col).cast("long").alias("sig"))
    return connected_components(simhash_edges(sigs, cfg, id_col), id_col)
