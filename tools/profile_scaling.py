"""Per-stage scaling profile of the north-star image dedup job.

Runs the SAME stages as plans/image_pipeline.image_dedup but with explicit
per-stage walls, at one core count per invocation (taskset-pinned by the
caller), so (stage, cpus) matrices expose WHICH stage loses efficiency
between N and 4N cores. Diagnostic tool only — the bench headline comes
from bench.py --scaling.

Usage: taskset -c 0-7 python tools/profile_scaling.py 8 480000
"""
from __future__ import annotations

import json
import sys
import time

import pandas as pd

sys.path.insert(0, ".")


def main(cpus: int, n_images: int) -> dict:
    from pyspark import StorageLevel
    from pyspark.sql import functions as F

    from text_dedup_spark.config import MinHashConfig, SimHashConfig
    from text_dedup_spark.functions.image_udf import phash_from_bytes
    from text_dedup_spark.operators.apply import split_survivors
    from text_dedup_spark.operators.cc import LAST_RUN_STATS, connected_components
    from text_dedup_spark.operators.exact import exact_assignments
    from text_dedup_spark.operators.ids import ID
    from text_dedup_spark.operators.lsh import band_rows, candidate_edges
    from text_dedup_spark.operators.simhash_dedup import simhash_edges
    from text_dedup_spark.sources.session import build_session
    from text_dedup_spark.sources.synth import images_table

    spark = build_session(
        master=f"local[{cpus}]", shuffle_partitions=cpus,
        app_name="profile-scaling",
        extra_conf={"spark.sql.adaptive.enabled": "false"},
    )
    imgs = images_table(spark, n_images, seed=42).persist(StorageLevel.MEMORY_AND_DISK)
    imgs.count()

    # same warmup as bench.scaling_worker
    from pyspark.sql.functions import col, pandas_udf

    @pandas_udf("long")
    def _warm(s: pd.Series) -> pd.Series:
        return s

    wdf = spark.range(0, cpus * 100, 1, cpus)
    wdf.select(_warm(col("id"))).count()
    wdf.groupBy((col("id") % cpus).alias("g")).applyInPandas(
        lambda pdf: pdf[["id"]], "id long"
    ).count()

    mc = MinHashConfig(ngram_size=5, num_perm=64, threshold=0.7).resolve()
    sc_ = SimHashConfig(f=64, bit_diff=3, num_bucket=4, ngram=3)

    t: dict[str, float] = {}

    def clock(name):
        class _C:
            def __enter__(self):
                self.t0 = time.monotonic()

            def __exit__(self, *a):
                t[name] = round(time.monotonic() - self.t0, 3)

        return _C()

    total0 = time.monotonic()
    corpus = imgs.withColumn(ID, F.xxhash64("image_id"))
    with clock("feats"):
        feats = corpus.select(
            F.col(ID),
            F.sha2(F.col("bytes"), 256).alias("__bhash__"),
            phash_from_bytes(F.col("bytes"), F.col("fmt")).alias("__phash__"),
            F.lit(True).alias("__decok__"),
            F.col("caption"),
        ).persist()
        feats.count()
    with clock("bands"):
        bands = band_rows(feats, "caption", mc, ID).persist(
            StorageLevel.MEMORY_AND_DISK
        )
        bands.count()
    exact = exact_assignments(feats, "__bhash__", ID, algo="precomputed")
    caption_edges = candidate_edges(bands, ID, hot_threshold=50_000)
    image_edges = simhash_edges(
        feats.select(F.col(ID), F.col("__phash__").alias("sig")), sc_, ID
    )
    all_edges = (
        exact.select(F.col(ID).alias("src"), F.col("component").alias("dst"))
        .unionByName(caption_edges)
        .unionByName(image_edges)
    )
    import os

    pre = int(os.environ.get("PROFILE_PRE_CONTRACT", "0"))
    with clock("edges_cc"):
        merged = connected_components(all_edges, ID, pre_contract=pre)
    cc_iters = dict(LAST_RUN_STATS)
    with clock("split_count"):
        kept, _removed = split_survivors(corpus, merged, ID, broadcast=True)
        kept_n = kept.count()
    t["total"] = round(time.monotonic() - total0, 3)
    t["nonfeat"] = round(t["total"] - t["feats"], 3)
    out = {"cpus": cpus, "images": n_images, "kept": kept_n,
           "cc_iterations": cc_iters, "stages": t}
    spark.stop()
    return out


if __name__ == "__main__":
    cpus = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 480_000
    print(json.dumps(main(cpus, n)))
