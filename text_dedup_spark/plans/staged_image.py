"""Checkpointed, resumable 3-stage pipeline for the image+caption table —
the staged TB-scale scheme (plans/staged.py, SURVEY §3.2) applied to the
flagship input_hint table with all three dedup modalities.

Stage A  features  per dataset: one pass over the raw bytes derives every
                   per-row feature IN the scan partitions — sha256(bytes),
                   phash (stored column or pixel-decoded), caption MinHash
                   band rows — and writes two typed checkpoints:
                   ``<ds>__feats`` (id, image_id, bhash, phash, caption) and
                   ``<ds>__bands`` (id, band, band_hash). The multi-KB
                   payload never crosses a shuffle and is never re-read.
Stage B  cluster   global: multi-path scan of all feats/bands checkpoints ->
                   exact + caption + phash edges -> ONE connected-components
                   pass -> ``clusters`` (id, component).
Stage C  apply     per dataset: broadcast anti-join of the raw table against
                   ``clusters`` -> ``<ds>__kept`` / ``<ds>__removed``.

Resume: each stage is idempotent (atomic overwrite) and ``run_staged_image``
skips stages whose checkpoints exist — restartable after any failure with
no recomputation of completed stages. Ids are xxhash64(image_id):
content-stable, so re-running stage A for one dataset never perturbs ids of
another (no PREV_ID coordination needed at all).
"""

from __future__ import annotations

import uuid

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..config import MinHashConfig, SimHashConfig
from ..operators.apply import split_survivors
from ..operators.cc import connected_components
from ..operators.exact import exact_assignments
from ..operators.ids import ID
from ..operators.lsh import band_rows, candidate_edges
from ..operators.simhash_dedup import simhash_edges
from .metrics import Timer, log_metric, log_partition_lineage


def feats_name(ds: str) -> str:
    return f"{ds}__feats"


def bands_name(ds: str) -> str:
    return f"{ds}__bands"


def stage_features(
    catalog,
    df: DataFrame,
    minhash_cfg: MinHashConfig,
    dataset: str,
    phash_source: str = "column",
    run_id: str | None = None,
    short_doc_policy: str = "cluster",
    undecodable: str = "error",
    pixel_embedding: bool = False,
) -> None:
    """``pixel_embedding``: also store the centered block-mean embedding in
    the feats checkpoint (one combined decode with the phash when
    phash_source='pixels' — functions/image_udf.phash_embedding_from_bytes),
    so a later ``stage_cluster(pixel_embedding_eps=...)`` adds the SemDeDup
    modality from the CHECKPOINT with zero image decoding in stage B."""
    run_id = run_id or uuid.uuid4().hex
    minhash_cfg = minhash_cfg.resolve()
    t = Timer()
    with t("features"):
        if pixel_embedding and phash_source == "pixels" and undecodable != "flag":
            from ..functions.image_udf import phash_embedding_from_bytes

            feats = df.select(
                F.xxhash64("image_id").alias(ID),
                F.col("image_id"),
                F.sha2(F.col("bytes"), 256).alias("bhash"),
                phash_embedding_from_bytes(F.col("bytes"), F.col("fmt")).alias("__pe__"),
                F.col("caption"),
            ).select(
                ID, "image_id", "bhash",
                F.col("__pe__.phash").alias("phash"),
                F.col("__pe__.embedding").alias("emb"),
                "caption",
            )
        elif pixel_embedding:
            if phash_source != "column":
                raise ValueError(
                    "pixel_embedding with undecodable='flag' is not supported: "
                    "the flagged path has no embedding for undecodable rows"
                )
            from ..functions.image_udf import image_embedding

            feats = df.select(
                F.xxhash64("image_id").alias(ID),
                F.col("image_id"),
                F.sha2(F.col("bytes"), 256).alias("bhash"),
                F.col("phash").cast("long").alias("phash"),
                image_embedding(F.col("bytes"), F.col("fmt")).alias("emb"),
                F.col("caption"),
            )
        elif phash_source == "pixels" and undecodable == "flag":
            # skip+flag policy (plans/image_pipeline.py docstring): the
            # feats checkpoint carries decode_ok; stage_cluster excludes
            # flagged rows from the phash modality only
            from ..functions.image_udf import phash_from_bytes_flagged

            feats = df.select(
                F.xxhash64("image_id").alias(ID),
                F.col("image_id"),
                F.sha2(F.col("bytes"), 256).alias("bhash"),
                phash_from_bytes_flagged(F.col("bytes"), F.col("fmt")).alias("__pf__"),
                F.col("caption"),
            ).select(
                ID, "image_id", "bhash",
                F.col("__pf__.phash").alias("phash"),
                F.col("__pf__.decode_ok").alias("decode_ok"),
                "caption",
            )
        else:
            if phash_source == "pixels":
                from ..functions.image_udf import phash_from_bytes

                phash_col = phash_from_bytes(F.col("bytes"), F.col("fmt"))
            else:
                phash_col = F.col("phash").cast("long")
            feats = df.select(
                F.xxhash64("image_id").alias(ID),
                F.col("image_id"),
                F.sha2(F.col("bytes"), 256).alias("bhash"),
                phash_col.alias("phash"),
                F.col("caption"),
            )
        catalog.write(feats, feats_name(dataset))
        # bands from the CHECKPOINT (not the raw table): the signature UDF
        # reads the narrow feats parquet, so bytes are decoded exactly once
        feats_ck = catalog.read(feats_name(dataset))
        catalog.write(
            band_rows(feats_ck, "caption", minhash_cfg, ID,
                      short_doc_policy=short_doc_policy),
            bands_name(dataset),
        )
    written = catalog.read(bands_name(dataset))
    log_metric(catalog, run_id, "features", dataset,
               feats_ck.count(), written.count(), t.elapsed_times["features"])
    log_partition_lineage(catalog, run_id, f"features:{dataset}", written)


def stage_cluster(
    catalog,
    datasets: list[str],
    simhash_cfg: SimHashConfig,
    run_id: str | None = None,
    clusters_table: str = "clusters",
    hot_threshold: int | None = None,
    pixel_embedding_eps: float | None = None,
    embedding_n_clusters: int = 64,
) -> DataFrame:
    """``pixel_embedding_eps``: when the feats checkpoints carry the ``emb``
    column (stage_features ``pixel_embedding=True``), add SemDeDup edges
    over it to the single CC pass — stage B touches only the narrow
    checkpoint, zero image decoding."""
    run_id = run_id or uuid.uuid4().hex
    t = Timer()
    with t("cluster"):
        feats = catalog.read_many([feats_name(ds) for ds in datasets])
        bands = catalog.read_many([bands_name(ds) for ds in datasets])
        exact = exact_assignments(feats, "bhash", ID, algo="precomputed")
        caption_edges = candidate_edges(bands, ID, hot_threshold=hot_threshold)
        ph_src = feats
        if "decode_ok" in feats.columns:  # flagged checkpoints: no pixel
            ph_src = feats.where(F.col("decode_ok"))  # evidence, no phash edge
        image_edges = simhash_edges(
            ph_src.select(F.col(ID), F.col("phash").alias("sig")), simhash_cfg, ID
        )
        all_edges = (
            exact.select(F.col(ID).alias("src"), F.col("component").alias("dst"))
            .unionByName(caption_edges)
            .unionByName(image_edges)
        )
        if pixel_embedding_eps is not None:
            if "emb" not in feats.columns:
                raise ValueError(
                    "pixel_embedding_eps needs feats checkpoints written with "
                    "stage_features(pixel_embedding=True)"
                )
            from ..operators.semdedup import semantic_dedup

            sem = semantic_dedup(
                feats.select(F.col(ID), F.col("emb").alias("embedding")),
                eps=pixel_embedding_eps, id_col=ID,
                n_clusters=embedding_n_clusters, keep="min_id",
            )
            all_edges = all_edges.unionByName(
                sem.select(F.col(ID).alias("src"), F.col("component").alias("dst"))
            )
        catalog.write(connected_components(all_edges, ID), clusters_table)
    out = catalog.read(clusters_table)
    log_metric(catalog, run_id, "cluster", ",".join(datasets),
               feats.count(), out.count(), t.elapsed_times["cluster"])
    log_partition_lineage(catalog, run_id, "cluster", out)
    return out


def stage_apply(
    catalog,
    df: DataFrame,
    dataset: str,
    run_id: str | None = None,
    clusters_table: str = "clusters",
) -> tuple[int, int]:
    run_id = run_id or uuid.uuid4().hex
    t = Timer()
    with t("apply"):
        clusters = catalog.read(clusters_table)
        corpus = df.withColumn(ID, F.xxhash64("image_id"))
        kept, removed = split_survivors(corpus, clusters, ID, broadcast=True)
        catalog.write(kept.drop(ID), f"{dataset}__kept")
        catalog.write(removed.drop(ID), f"{dataset}__removed")
    kept_n = catalog.read(f"{dataset}__kept").count()
    removed_n = catalog.read(f"{dataset}__removed").count()
    log_metric(catalog, run_id, "apply", dataset, kept_n + removed_n, kept_n,
               t.elapsed_times["apply"])
    return kept_n, removed_n


def run_staged_image(
    catalog,
    inputs: dict[str, DataFrame],
    minhash_cfg: MinHashConfig | None = None,
    simhash_cfg: SimHashConfig | None = None,
    phash_source: str = "column",
    force: bool = False,
    pixel_embedding_eps: float | None = None,
    embedding_n_clusters: int = 64,
) -> dict[str, tuple[int, int]]:
    """Full A->B->C over named datasets, resuming past completed
    checkpoints. Returns per-dataset (kept, removed)."""
    minhash_cfg = (minhash_cfg or MinHashConfig()).resolve()
    simhash_cfg = simhash_cfg or SimHashConfig()
    run_id = uuid.uuid4().hex

    for ds, df in inputs.items():
        if force or not (catalog.exists(feats_name(ds)) and catalog.exists(bands_name(ds))):
            stage_features(catalog, df, minhash_cfg, ds, phash_source, run_id,
                           pixel_embedding=pixel_embedding_eps is not None)

    if force or not catalog.exists("clusters"):
        stage_cluster(catalog, list(inputs), simhash_cfg, run_id,
                      pixel_embedding_eps=pixel_embedding_eps,
                      embedding_n_clusters=embedding_n_clusters)

    out = {}
    for ds, df in inputs.items():
        if force or not (
            catalog.exists(f"{ds}__kept") and catalog.exists(f"{ds}__removed")
        ):
            out[ds] = stage_apply(catalog, df, ds, run_id)
        else:
            out[ds] = (
                catalog.read(f"{ds}__kept").count(),
                catalog.read(f"{ds}__removed").count(),
            )
    return out
