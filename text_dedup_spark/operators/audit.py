"""Cluster-quality audit: true-Jaccard statistics over produced clusters.

Reference parity: utils/analysis.py:23-47 — after a dedup run, sample
cluster members and compute true 8-gram Jaccard against the representative
to quantify LSH false positives. The reference runs it as a driver-side
loop over a HF dataset; here it is a join + Catalyst shingle expressions,
fully distributed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .jaccard import jaccard_expr, shingles_expr


def audit_false_positives(
    corpus: DataFrame,
    assignments: DataFrame,
    text_col: str,
    id_col: str,
    n: int = 8,
    threshold: float = 0.7,
) -> DataFrame:
    """Per-cluster-member true n-gram Jaccard vs the representative.

    Returns (id, component, jaccard, is_false_positive) — a member whose
    true similarity to its representative is below ``threshold`` counts as
    an LSH false positive (utils/analysis.py uses 8-grams and reports the
    below-threshold share). Aggregate with ``audit_summary``.
    """
    sh = corpus.select(
        F.col(id_col), shingles_expr(F.col(text_col), n).alias("__sh__")
    )
    member = assignments.join(sh, id_col).withColumnRenamed("__sh__", "__sh_m__")
    rep = sh.select(
        F.col(id_col).alias("component"), F.col("__sh__").alias("__sh_r__")
    )
    return (
        member.join(rep, "component")
        .select(
            id_col,
            "component",
            F.round(jaccard_expr(F.col("__sh_m__"), F.col("__sh_r__")), 6).alias("jaccard"),
        )
        .withColumn("is_false_positive", F.col("jaccard") < threshold)
    )


def modality_disagreement(
    feats: DataFrame,
    id_col: str,
    caption_col: str = "caption",
    phash_col: str = "phash",
    bit_diff: int = 3,
    num_bucket: int = 4,
) -> DataFrame:
    """Cross-modality consistency audit for image+caption corpora — the
    curation signal neither single-modality dedup surfaces:

    - ``caption_dup_image_diff``: two rows share the EXACT caption but
      their images are NOT near-duplicates (phash Hamming > bit_diff) —
      stock/boilerplate caption reuse or a mislabeled pair; deduping on
      captions alone would wrongly collapse them.
    - ``image_dup_caption_diff``: two rows are image near-duplicates
      (Hamming <= bit_diff through the audited SimHash bucket machinery)
      but their captions differ — the same picture re-captioned; caption
      dedup alone would wrongly keep both.

    Scale shape: caption groups use the exact-dedup pattern (groupBy +
    min-id representative, STAR pairs only — a boilerplate caption shared
    by 10^6 rows costs 10^6-1 pairs, never quadratic); image near-pairs
    reuse ``simhash_edges`` (bucketed, Hamming-verified, identical-
    signature collapse inside). Returns (id_a, id_b, kind, hamming) with
    id_a < id_b.

    No reference analog: text-dedup is single-modality by construction.
    """
    from ..config import SimHashConfig
    from .simhash_dedup import simhash_edges

    f = feats.select(
        F.col(id_col).alias("id"),
        F.col(caption_col).alias("cap"),
        F.col(phash_col).cast("long").alias("ph"),
    )
    # caption star pairs: member vs the caption group's min-id rep
    reps = f.groupBy("cap").agg(
        F.min_by(F.struct("id", "ph"), F.col("id")).alias("__r__")
    ).select("cap", F.col("__r__.id").alias("rep"), F.col("__r__.ph").alias("rep_ph"))
    cap_pairs = (
        f.join(reps, "cap")
        .where(F.col("id") != F.col("rep"))
        .select(
            F.least("rep", "id").alias("id_a"),
            F.greatest("rep", "id").alias("id_b"),
            F.bit_count(F.col("ph").bitwiseXOR(F.col("rep_ph"))).alias("hamming"),
        )
        .where(F.col("hamming") > bit_diff)
        .withColumn("kind", F.lit("caption_dup_image_diff"))
    )
    # image near-dup pairs whose captions differ
    edges = simhash_edges(
        f.select(F.col("id"), F.col("ph").alias("sig")),
        SimHashConfig(f=64, bit_diff=bit_diff, num_bucket=num_bucket),
        "id",
    )
    ca = f.select(F.col("id").alias("src"), F.col("cap").alias("__ca__"),
                  F.col("ph").alias("__pa__"))
    cb = f.select(F.col("id").alias("dst"), F.col("cap").alias("__cb__"),
                  F.col("ph").alias("__pb__"))
    img_pairs = (
        edges.join(ca, "src")
        .join(cb, "dst")
        .where(F.col("__ca__") != F.col("__cb__"))
        .select(
            F.least("src", "dst").alias("id_a"),
            F.greatest("src", "dst").alias("id_b"),
            F.bit_count(F.col("__pa__").bitwiseXOR(F.col("__pb__"))).alias("hamming"),
        )
        .dropDuplicates(["id_a", "id_b"])
        .withColumn("kind", F.lit("image_dup_caption_diff"))
    )
    return cap_pairs.unionByName(img_pairs).select("id_a", "id_b", "kind", "hamming")


def audit_summary(audited: DataFrame) -> DataFrame:
    """(n_members, n_false_positive, fp_rate, avg_jaccard, min_jaccard)."""
    return audited.agg(
        F.count(F.lit(1)).alias("n_members"),
        F.sum(F.col("is_false_positive").cast("long")).alias("n_false_positive"),
        F.round(F.avg(F.col("is_false_positive").cast("double")), 6).alias("fp_rate"),
        F.round(F.avg("jaccard"), 6).alias("avg_jaccard"),
        F.min("jaccard").alias("min_jaccard"),
    )
