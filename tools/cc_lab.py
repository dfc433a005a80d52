"""CC-loop lab: measure connected_components variants on the REAL merged
3-modality edge graph of the north-star corpus, at a pinned core count.

Usage:
  python tools/cc_lab.py gen 480000           # snapshot edges -> /tmp/cc_edges
  taskset -c 0-7 python tools/cc_lab.py run 8 # time CC on the snapshot

`run` prints JSON: loop wall, iterations, and an order-independent
assignment fingerprint (count + modded hash sums) so variants can be
checked equivalent. Diagnostic tool only.
"""
from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, ".")

EDGES = "/tmp/cc_edges"


def _session(cpus: int):
    from text_dedup_spark.sources.session import build_session

    return build_session(
        master=f"local[{cpus}]", shuffle_partitions=cpus, app_name="cc-lab",
        extra_conf={"spark.sql.adaptive.enabled": "false",
                    "spark.ui.enabled": "true"},
    )


def gen(n_images: int) -> None:
    from pyspark import StorageLevel
    from pyspark.sql import functions as F

    from text_dedup_spark.config import MinHashConfig, SimHashConfig
    from text_dedup_spark.functions.image_udf import phash_from_bytes
    from text_dedup_spark.operators.exact import exact_assignments
    from text_dedup_spark.operators.ids import ID
    from text_dedup_spark.operators.lsh import band_rows, candidate_edges
    from text_dedup_spark.operators.simhash_dedup import simhash_edges
    from text_dedup_spark.sources.synth import images_table

    spark = _session(8)
    imgs = images_table(spark, n_images, seed=42).persist(StorageLevel.MEMORY_AND_DISK)
    imgs.count()
    mc = MinHashConfig(ngram_size=5, num_perm=64, threshold=0.7).resolve()
    sc_ = SimHashConfig(f=64, bit_diff=3, num_bucket=4, ngram=3)
    corpus = imgs.withColumn(ID, F.xxhash64("image_id"))
    feats = corpus.select(
        F.col(ID),
        F.sha2(F.col("bytes"), 256).alias("__bhash__"),
        phash_from_bytes(F.col("bytes"), F.col("fmt")).alias("__phash__"),
        F.col("caption"),
    ).persist()
    bands = band_rows(feats, "caption", mc, ID)
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
    all_edges.write.mode("overwrite").parquet(EDGES)
    n = spark.read.parquet(EDGES).count()
    print(json.dumps({"edges": n}))
    spark.stop()


def run(cpus: int) -> None:
    from pyspark.sql import functions as F

    from text_dedup_spark.operators.cc import LAST_RUN_STATS, connected_components
    from text_dedup_spark.operators.ids import ID

    import os

    spark = _session(cpus)
    edges = spark.read.parquet(EDGES).localCheckpoint(eager=True)
    t0 = time.monotonic()
    assigns = connected_components(
        edges, ID, pre_contract=int(os.environ.get("CC_PRE", "0"))
    )
    h = F.xxhash64(ID, "component")
    row = assigns.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.pmod(h, F.lit(1_000_003))).alias("s1"),
        F.sum(F.pmod(h, F.lit(999_983))).alias("s2"),
    ).collect()[0]
    wall = round(time.monotonic() - t0, 3)
    # JVM-side job wall vs python/driver gap, via the UI REST API
    jobs_ms = stages_ms = n_jobs = n_stages = 0
    try:
        import urllib.request

        ui = spark.sparkContext.uiWebUrl
        app = json.loads(urllib.request.urlopen(f"{ui}/api/v1/applications").read())[0]["id"]
        for j in json.loads(urllib.request.urlopen(
                f"{ui}/api/v1/applications/{app}/jobs").read()):
            if j.get("completionTime"):
                from datetime import datetime as dt
                f = "%Y-%m-%dT%H:%M:%S.%f%Z"
                d = (dt.strptime(j["completionTime"], f)
                     - dt.strptime(j["submissionTime"], f)).total_seconds()
                jobs_ms += d
                n_jobs += 1
                n_stages += len(j["stageIds"])
                print(json.dumps({"job": j["jobId"], "sec": d,
                                  "stages": len(j["stageIds"]),
                                  "name": j.get("name", "")[:90]}))
    except Exception as e:
        jobs_ms = f"err:{e}"
    print(json.dumps({
        "cpus": cpus, "wall": wall, "stats": dict(LAST_RUN_STATS),
        "jvm_job_sec_total": jobs_ms, "n_jobs": n_jobs, "n_stages": n_stages,
        "fingerprint": [row["n"], row["s1"], row["s2"]],
    }))
    spark.stop()


if __name__ == "__main__":
    if sys.argv[1] == "gen":
        gen(int(sys.argv[2]) if len(sys.argv) > 2 else 480_000)
    else:
        run(int(sys.argv[2]) if len(sys.argv) > 2 else 8)
