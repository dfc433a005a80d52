"""Image+caption near-duplicate suite over the input_hint table
(image_id, bytes, w, h, fmt, caption, phash) — the BASELINE.json target.

Three modalities, one id space, one clustering contract:
  exact   : sha256 over raw bytes (codegen-only)        -> exact_assignments
  caption : MinHash-LSH over caption                    -> minhash pipeline
  image   : SimHash Hamming<=k over the phash column    -> fingerprint path
plus per-row fidelity verification (decoded-pixel PSNR + caption equality)
for any transformed output.

The internal int64 id is xxhash64(image_id): content-stable, shuffle-free,
and identical across parallelism levels (a dense row_number id would cost a
full-row exchange just to stamp rows; the staged text pipeline keeps dense
ids where the reference's PREV_ID contract needs them).
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
from ..operators.ids import ID
from ..operators.lsh import band_rows, candidate_edges
from ..operators.simhash_dedup import simhash_edges


@dataclass
class ImageDedupResult:
    corpus: DataFrame         # input + internal id
    exact: DataFrame          # (id, component) on raw bytes (already final)
    caption_edges: DataFrame  # MinHash candidate edges over caption
    image_edges: DataFrame    # Hamming-verified edges over phash
    kept: DataFrame           # survivors of the union of all three
    decode_flags: DataFrame | None = None  # (id,) of rows the container
    # could not decode when undecodable='flag' (arithmetic JPEG etc.) —
    # they are excluded from the phash modality only; materialized eagerly
    # (tiny) so reading it never re-runs the decode UDF

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
    hot_threshold: int | None = None,
    short_doc_policy: str = "cluster",
    undecodable: str = "error",
    pixel_embedding_eps: float | None = None,
    embedding_n_clusters: int = 64,
) -> ImageDedupResult:
    """``phash_source``: 'column' trusts the stored phash int64;
    'pixels' recomputes it from the image bytes with the Arrow-batched
    decode UDF (functions/image_udf.phash_from_bytes) — the north-star
    "perceptual features from pixels" path; identical output for inputs
    whose stored phash was derived from the same pixels.

    ``undecodable`` (phash_source='pixels' only): 'error' fails the task on
    a payload the container cannot decode; 'flag' records decode_ok=false
    for it (arithmetic-coded JPEG, corrupt bytes), keeps it OUT of the phash
    modality (no pixel evidence), and still dedups it by exact bytes and
    caption — the production policy for real web corpora.

    ``pixel_embedding_eps``: opt-in FOURTH modality — SemDeDup over the
    centered block-mean pixel embedding (functions/image_udf.
    image_embedding), whose cosine survives affine brightness changes and
    smooth overlays that push phash past its Hamming budget. Its
    assignment table feeds the same single CC pass as the other three
    edge sets (assignments ARE id->group-min star edges). Costs one extra
    decode pass over the bytes when enabled (the three-modality path is
    untouched when None); flagged-undecodable rows are excluded exactly
    like the phash modality."""
    minhash_cfg = (minhash_cfg or MinHashConfig()).resolve()
    simhash_cfg = simhash_cfg or SimHashConfig()

    if phash_source not in ("column", "pixels"):
        raise ValueError(f"unknown phash_source {phash_source!r}")
    if undecodable not in ("error", "flag"):
        raise ValueError(f"unknown undecodable policy {undecodable!r}")
    flag_mode = undecodable == "flag" and phash_source == "pixels"
    # Compute early, shuffle small: every per-row feature (content hash,
    # perceptual hash, caption) is derived IN the scan partitions, the
    # multi-KB ``bytes`` payload never crosses a shuffle, and the id is
    # xxhash64(image_id) — content-stable and shuffle-free, where a dense
    # row_number id would exchange the full rows just to stamp them.
    # (Hash-id collision: ~n^2/2^65 — 1.5e-9 at 240k rows, ~3% odds of ONE
    # collision at 10^12, which would spuriously merge two docs; the staged
    # text pipeline keeps dense ids for the reference's PREV_ID contract.)
    corpus = df.withColumn(ID, F.xxhash64("image_id"))
    if flag_mode:
        from ..functions.image_udf import phash_from_bytes_flagged

        # one UDF evaluation: project the struct, then expand its fields
        feats = corpus.select(
            F.col(ID),
            F.sha2(F.col("bytes"), 256).alias("__bhash__"),
            phash_from_bytes_flagged(F.col("bytes"), F.col("fmt")).alias("__pf__"),
            F.col("caption"),
        ).select(
            ID,
            "__bhash__",
            F.col("__pf__.phash").alias("__phash__"),
            F.col("__pf__.decode_ok").alias("__decok__"),
            "caption",
        ).persist()
    elif phash_source == "pixels" and pixel_embedding_eps is not None:
        # both pixel features from ONE decode (see phash_embedding_from_bytes)
        from ..functions.image_udf import phash_embedding_from_bytes

        feats = corpus.select(
            F.col(ID),
            F.sha2(F.col("bytes"), 256).alias("__bhash__"),
            phash_embedding_from_bytes(F.col("bytes"), F.col("fmt")).alias("__pe__"),
            F.col("caption"),
        ).select(
            ID,
            "__bhash__",
            F.col("__pe__.phash").alias("__phash__"),
            F.col("__pe__.embedding").alias("__emb__"),
            F.lit(True).alias("__decok__"),
            "caption",
        ).persist()
    else:
        if phash_source == "pixels":
            from ..functions.image_udf import phash_from_bytes

            phash_col = phash_from_bytes(F.col("bytes"), F.col("fmt"))
        else:
            phash_col = F.col("phash").cast("long")
        feats = corpus.select(
            F.col(ID),
            F.sha2(F.col("bytes"), 256).alias("__bhash__"),
            phash_col.alias("__phash__"),
            F.lit(True).alias("__decok__"),
            F.col("caption"),
        ).persist()
    feats.count()  # one pass over the raw bytes; materialized before the
    # three modality branches fork (lazy persist would convoy them on
    # per-partition cache locks)

    exact = exact_assignments(feats, "__bhash__", ID, algo="precomputed")

    from pyspark import StorageLevel

    # bands feed two shuffles (bucket-min + join back) — persist AND
    # materialize so the caption-signature UDF runs once and its two
    # consumers read a warm cache instead of convoying on partition locks
    bands = band_rows(feats, "caption", minhash_cfg, ID,
                      short_doc_policy=short_doc_policy).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    bands.count()
    caption_edges = candidate_edges(bands, ID, hot_threshold=hot_threshold)

    image_edges = simhash_edges(
        feats.where(F.col("__decok__")).select(F.col(ID), F.col("__phash__").alias("sig")),
        simhash_cfg,
        ID,
    )
    decode_flags = (
        feats.where(~F.col("__decok__")).select(F.col(ID)).localCheckpoint(eager=True)
        if flag_mode
        else None
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
    if pixel_embedding_eps is not None:
        from ..operators.semdedup import semantic_dedup

        if "__emb__" in feats.columns:  # combined-UDF path: zero extra decode
            emb = feats.select(F.col(ID), F.col("__emb__").alias("embedding"))
        else:
            from ..functions.image_udf import image_embedding

            emb_src = corpus
            if flag_mode:
                ok = feats.where(F.col("__decok__")).select(ID)
                emb_src = corpus.join(ok, ID, "left_semi")
            emb = emb_src.select(
                F.col(ID),
                image_embedding(F.col("bytes"), F.col("fmt")).alias("embedding"),
            )
        sem = semantic_dedup(
            emb, eps=pixel_embedding_eps, id_col=ID,
            n_clusters=embedding_n_clusters, keep="min_id",
        )
        all_edges = all_edges.unionByName(
            sem.select(F.col(ID).alias("src"), F.col("component").alias("dst"))
        )
    merged = connected_components(all_edges, ID)
    bands.unpersist()
    feats.unpersist()
    # broadcast the duplicate-id side: the corpus side carries the raw
    # bytes and must NOT shuffle for this join. (At full 10^12 scale a
    # duplicate-id table can outgrow broadcast — there, split with
    # broadcast=False and let AQE plan the shuffle join.)
    kept, _removed = split_survivors(corpus, merged, ID, broadcast=True)

    return ImageDedupResult(corpus, exact, caption_edges, image_edges, kept, decode_flags)


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
