"""Image+caption near-duplicate suite over the input_hint table
(image_id, bytes, w, h, fmt, caption, phash) — the BASELINE.json target.

Three modalities, one id space, one clustering contract:
  exact   : sha256 over raw bytes (codegen-only)        -> exact_assignments
  caption : MinHash-LSH over caption                    -> minhash pipeline
  image   : SimHash Hamming<=k over the phash column    -> fingerprint path
plus per-row fidelity verification (decoded-pixel PSNR + caption equality)
for any transformed output.

The string image_id is mapped to a dense internal int64 once (scalable
two-pass, operators/ids.py) and carried back out at the end.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import cached_property

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..config import MinHashConfig, SimHashConfig
from ..functions.image_udf import pixel_psnr
from ..operators.apply import split_survivors, with_cluster
from ..operators.cc import connected_components
from ..operators.exact import exact_assignments
from ..operators.ids import ID, assign_dense_ids
from ..operators.lsh import band_rows, candidate_edges
from ..operators.simhash_dedup import simhash_edges


@dataclass
class ImageDedupResult:
    corpus: DataFrame         # input + internal id
    exact: DataFrame          # (id, component) on raw bytes (already final)
    caption_edges: DataFrame  # MinHash candidate edges over caption
    image_edges: DataFrame    # Hamming-verified edges over phash
    kept: DataFrame           # survivors of the union of all three

    # Per-modality cluster views run their own CC only when asked for —
    # the survivor path needs just ONE CC over the unioned edges, so the
    # three-CC serial chain never happens unless a caller wants each view.
    @cached_property
    def caption_clusters(self) -> DataFrame:
        return connected_components(self.caption_edges, ID)

    @cached_property
    def image_clusters(self) -> DataFrame:
        return connected_components(self.image_edges, ID)


def image_dedup(
    df: DataFrame,
    minhash_cfg: MinHashConfig | None = None,
    simhash_cfg: SimHashConfig | None = None,
    phash_source: str = "column",
) -> ImageDedupResult:
    """``phash_source``: 'column' trusts the stored phash int64;
    'pixels' recomputes it from the image bytes with the Arrow-batched
    decode UDF (functions/image_udf.phash_from_bytes) — the north-star
    "perceptual features from pixels" path; identical output for inputs
    whose stored phash was derived from the same pixels."""
    minhash_cfg = (minhash_cfg or MinHashConfig()).resolve()
    simhash_cfg = simhash_cfg or SimHashConfig()

    stamped = assign_dense_ids(df, ID)
    if phash_source == "pixels":
        from ..functions.image_udf import phash_from_bytes

        # before the persist: the decode UDF must run once, not once per
        # downstream consumer
        stamped = stamped.drop("phash").withColumn(
            "phash", phash_from_bytes(F.col("bytes"), F.col("fmt"))
        )
    elif phash_source != "column":
        raise ValueError(f"unknown phash_source {phash_source!r}")
    corpus = stamped.persist()

    exact = exact_assignments(corpus, "bytes", ID, algo="sha256")

    from pyspark import StorageLevel

    # bands feed two shuffles (bucket-min + join back) — persist so the
    # caption-signature UDF runs once
    bands = band_rows(corpus, "caption", minhash_cfg, ID).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    caption_edges = candidate_edges(bands, ID)

    image_edges = simhash_edges(
        corpus.select(F.col(ID), F.col("phash").cast("long").alias("sig")),
        simhash_cfg,
        ID,
    )

    # union of modalities -> ONE connected-components pass: an id removed by
    # ANY modality is removed, and CC over the unioned edge set yields the
    # same components as merging per-modality cluster tables (union-find is
    # associative over edge unions) at a third of the iterative-join cost
    all_edges = (
        exact.select(F.col(ID).alias("src"), F.col("component").alias("dst"))
        .unionByName(caption_edges)
        .unionByName(image_edges)
    )
    merged = connected_components(all_edges, ID)
    bands.unpersist()
    kept, _removed = split_survivors(corpus, merged, ID)

    return ImageDedupResult(corpus, exact, caption_edges, image_edges, kept)


def verify_fidelity(
    original: DataFrame, transformed: DataFrame, min_psnr: float = 40.0
) -> DataFrame:
    """Per-row invariant check (input_hint): join on image_id, decoded-pixel
    PSNR >= min_psnr AND caption equality. Returns violating rows (empty ==
    pass) — executor-side, no driver collect."""
    a = original.select(
        "image_id",
        F.col("bytes").alias("bytes_a"),
        F.col("fmt").alias("fmt_a"),
        F.col("caption").alias("caption_a"),
    )
    b = transformed.select(
        "image_id",
        F.col("bytes").alias("bytes_b"),
        F.col("fmt").alias("fmt_b"),
        F.col("caption").alias("caption_b"),
    )
    joined = a.join(b, "image_id")
    return joined.withColumn(
        "psnr", pixel_psnr("bytes_a", "fmt_a", "bytes_b", "fmt_b")
    ).where(
        (F.col("psnr") < F.lit(min_psnr))
        | (F.col("caption_a") != F.col("caption_b"))
    )
