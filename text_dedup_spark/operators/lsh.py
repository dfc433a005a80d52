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
from .ids import ID


def band_keys_expr(sig_col, cfg: MinHashConfig):
    """array<long> of B band keys from an array<long> signature column —
    pure Catalyst (whole-stage codegen), no Python.

    The reference's band key is the big-endian byte serialization of the
    signature slice (minhash_spark.py:155) used ONLY for equality grouping;
    any injective-up-to-negligible-collision function of (band_idx, slice)
    yields identical buckets, so we take xxhash64 over the slice elements —
    an 8-byte shuffle key instead of r*8 bytes. (xxhash64 collisions, ~1e-7
    at 10^9 band rows, can only ADD a candidate pair — MinHash-LSH already
    produces false-positive candidates at a vastly higher rate by design.)
    """
    cfg = cfg.resolve()
    keys = []
    for bi, (start, end) in enumerate(cfg.ranges):
        elems = [F.element_at(sig_col, start + i + 1) for i in range(end - start)]
        keys.append(F.xxhash64(F.lit(bi), *elems))
    return F.array(*keys)


def band_rows(
    df: DataFrame,
    text_col: str,
    cfg: MinHashConfig,
    id_col: str = ID,
    short_doc_policy: str = "cluster",
) -> DataFrame:
    """(id, band:int, band_hash:long) — one row per (document, band).

    The pandas UDF emits only the raw uint64 signature (numpy -> Arrow, no
    per-row Python banding); slicing + band-key hashing happen JVM-side in
    codegen (band_keys_expr). Works on batch and streaming frames alike.

    ``short_doc_policy``: a document with fewer than ngram_size tokens has
    NO shingles, so its signature is the all-MAX_HASH constant and EVERY
    such document lands in one giant bucket (= one merged cluster).
    'cluster' reproduces that reference behavior (minhash_spark.py:58-85 —
    SURVEY §7.4 risk #2) and is the parity default; 'keep' excludes
    short documents from banding entirely (no shingles => no evidence of
    duplication => survivors), which removes the degenerate cluster AND its
    skew. Exact-hash dedup still catches bytewise-equal short docs.
    """
    from ..functions.minhash_udf import make_signature_udf
    from .textstats import tokens_expr

    if short_doc_policy not in ("cluster", "keep"):
        raise ValueError(f"unknown short_doc_policy {short_doc_policy!r}")
    if short_doc_policy == "keep":
        df = df.where(F.size(tokens_expr(F.col(text_col))) >= cfg.ngram_size)

    sig_udf = make_signature_udf(cfg)
    sigs = df.select(F.col(id_col), sig_udf(F.col(text_col)).alias("__sig__"))
    return sigs.select(
        F.col(id_col),
        F.posexplode_outer(band_keys_expr(F.col("__sig__"), cfg)).alias(
            "band", "band_hash"
        ),
    )


def candidate_edges(
    bands: DataFrame,
    id_col: str = ID,
    hot_threshold: int | None = None,
) -> DataFrame:
    """(src, dst) duplicate-candidate edges; dst = min id of the bucket.

    Buckets of size 1 produce no edge (the min-join filters id != min), which
    matches generate_edges' len<=1 early-out (minhash_spark.py:239-240).

    Hot buckets (SURVEY §7.4: e.g. the all-MAX_HASH short-document
    signature puts a constant fraction of the corpus in ONE bucket): the
    min itself is immune (map-side partial aggregation), but the join back
    would put every hot-bucket row in a single shuffle partition. With
    ``hot_threshold`` set, buckets above it are split out and joined via an
    explicit BROADCAST of their (tiny) min-map — the hot rows never shuffle
    at all, which strictly dominates salting (zero replication, zero skew).
    Cold buckets keep the plain shuffle join (uniform by construction);
    with AQE on, its skew-join split remains as the untuned fallback.
    """
    mins = bands.groupBy("band", "band_hash").agg(
        F.min(id_col).alias("__min__"), F.count(F.lit(1)).alias("__n__")
    )

    def star(b: DataFrame, m: DataFrame, broadcast: bool) -> DataFrame:
        m = F.broadcast(m) if broadcast else m
        return (
            b.join(m, ["band", "band_hash"])
            .where(F.col(id_col) != F.col("__min__"))
            .select(F.col(id_col).alias("src"), F.col("__min__").alias("dst"))
        )

    if hot_threshold is None:
        return star(bands, mins.drop("__n__"), False).dropDuplicates(["src", "dst"])

    hot = mins.where(F.col("__n__") > hot_threshold).drop("__n__")
    cold = mins.where(F.col("__n__") <= hot_threshold).drop("__n__")
    # left_semi/left_anti against the hot KEY SET routes each band row to
    # exactly one side; the hot side's min-map is by definition small
    # (#hot buckets <= corpus/hot_threshold)
    hot_keys = hot.select("band", "band_hash")
    bands_hot = bands.join(F.broadcast(hot_keys), ["band", "band_hash"], "left_semi")
    bands_cold = bands.join(F.broadcast(hot_keys), ["band", "band_hash"], "left_anti")
    return (
        star(bands_cold, cold, False)
        .unionByName(star(bands_hot, hot, True))
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
    # Edges (8-byte id pairs, tiny vs bands) are materialized eagerly via
    # localCheckpoint so the band cache can be released here rather than
    # leaking for the session lifetime (minhash_pipeline manages its own
    # persist; this helper must too).
    bands = band_rows(df, text_col, cfg, id_col).persist(StorageLevel.MEMORY_AND_DISK)
    try:
        return candidate_edges(bands, id_col).localCheckpoint(eager=True)
    finally:
        bands.unpersist()
