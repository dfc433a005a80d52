#!/usr/bin/env python
"""Benchmark harness.

Default mode (driver contract): run the headline queries at
``$SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1) on
``local[$SPARK_GRAFT_CPUS]`` and print ONE JSON line:
  {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

``--scaling`` mode (north-rule evidence): run the SAME image+caption dedup
job at local[8] and local[32] (the sandbox stand-in for N vs 4N executors)
in separate subprocesses, report images/sec at both plus scaling efficiency
( = tp_32 / (4 * tp_8) ), and write BENCH/BASELINE.md.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
SCALING_IMAGES = int(os.environ.get("SPARK_GRAFT_SCALING_IMAGES", "20000"))


def _session(cpus: int):
    from text_dedup_spark.sources.session import build_session

    return build_session(master=f"local[{cpus}]", shuffle_partitions=cpus,
                         app_name="text-dedup-bench")


def run_queries() -> dict:
    import __spark_entry__ as entrymod

    spark = _session(CPUS)
    sf = float(os.path.basename(SF_DIR.rstrip("/")).removeprefix("sf") or "0.1")

    # warmup: spawn the Python worker fleet + JIT/codegen paths once, so the
    # per-query timings measure the engine rather than interpreter startup
    from pyspark.sql.functions import col, pandas_udf

    @pandas_udf("long")
    def _warm(s: pd.Series) -> pd.Series:
        return s

    spark.range(0, CPUS * 1000, 1, CPUS).select(_warm(col("id"))).count()

    qs = entrymod.queries()
    headline = [
        "minhash_survivors",
        "exact_dedup_survivors",
        "simhash_assignments",
        "jaccard_verified_pairs",
        "suffix_cleaned",
        "doc_stats",
        "quality_score",
        "ann_topk",
        "ann_lsh_topk",
        "embedding_near_pairs",
        "image_phash_dedup",
        "events_hourly",
    ]
    timings = {}
    for name in headline:
        t0 = time.monotonic()
        df = qs[name](spark, SF_DIR)
        n = df.count()
        timings[name] = round(time.monotonic() - t0, 3)
        print(f"# {name}: {n} rows in {timings[name]}s", file=sys.stderr)
    total = round(sum(timings.values()), 3)
    spark.stop()
    return {
        "metric": "headline_queries_total",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
    }


def scaling_worker(cpus: int, n_images: int) -> dict:
    """The north-star job: synthesize the image+caption table, run the full
    three-modality dedup (exact bytes + caption MinHash + phash SimHash) and
    materialize the survivor count. Identical input both runs."""
    from pyspark import StorageLevel

    from text_dedup_spark.config import MinHashConfig, SimHashConfig
    from text_dedup_spark.plans.image_pipeline import image_dedup
    from text_dedup_spark.sources.synth import images_table

    spark = _session(cpus)
    imgs = images_table(spark, n_images, seed=42).persist(StorageLevel.MEMORY_AND_DISK)
    n = imgs.count()  # materialize generation OUTSIDE the timed window

    # Warm the scalar-pandas-UDF and applyInPandas worker pools before the
    # timed window: a local[k] pool fork-and-imports k python workers
    # (~0.3s x k of CPU), a one-time executor-lifetime cost that is noise
    # for a production-scale job but would dominate a seconds-scale window
    # asymmetrically (32 forks vs 8).
    from pyspark.sql.functions import col, pandas_udf

    @pandas_udf("long")
    def _warm(s: pd.Series) -> pd.Series:
        return s

    wdf = spark.range(0, cpus * 100, 1, cpus)
    wdf.select(_warm(col("id"))).count()
    wdf.groupBy((col("id") % cpus).alias("g")).applyInPandas(
        lambda pdf: pdf[["id"]], "id long"
    ).count()

    t0 = time.monotonic()
    res = image_dedup(
        imgs,
        MinHashConfig(ngram_size=5, num_perm=64, threshold=0.7),
        SimHashConfig(f=64, bit_diff=3, num_bucket=4, ngram=3),
    )
    kept = res.kept.count()
    wall = time.monotonic() - t0
    spark.stop()
    return {
        "cpus": cpus,
        "images": n,
        "kept": kept,
        "wall_sec": round(wall, 3),
        "images_per_sec": round(n / wall, 2),
    }


def run_scaling(n_images: int) -> dict:
    results = {}
    for cpus in (8, 32):
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--scaling-worker",
             str(cpus), "--images", str(n_images)],
            capture_output=True, text=True, check=True,
        )
        line = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
        results[cpus] = json.loads(line)
    tp8, tp32 = results[8]["images_per_sec"], results[32]["images_per_sec"]
    eff = round(tp32 / (4 * tp8), 3)
    summary = {
        "metric": "scaling_efficiency_8_to_32_cores",
        "value": eff,
        "unit": "ratio",
        "queries": {
            "images_per_sec_local8": tp8,
            "images_per_sec_local32": tp32,
            "wall_sec_local8": results[8]["wall_sec"],
            "wall_sec_local32": results[32]["wall_sec"],
        },
        "sf": n_images,
    }
    _write_bench_md(results, eff, n_images)
    return summary


def _write_bench_md(results: dict, eff: float, n_images: int) -> None:
    os.makedirs(os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH"), exist_ok=True)
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH", "BASELINE.md")
    kept = results[32]["kept"]
    with open(path, "w") as f:
        f.write(f"""# BENCH — throughput scaling evidence (north rule)

Job: full image+caption near-dedup (exact sha256 on bytes + MinHash-LSH on
captions [64 perm, 5-gram, thr 0.7] + phash SimHash Hamming<=3 + cross-modal
cluster merge + survivor split) over the deterministic synthetic input table
({n_images} rows, schema = BASELINE.json input_hint). Identical input bytes
at both parallelism levels; generation excluded from the timed window.

local[8] vs local[32] is the sandbox stand-in for N vs 4N executors
(single-machine; no real cluster available — per driver instructions).

| parallelism | wall (s) | images/sec | survivors |
|---|---|---|---|
| local[8]  | {results[8]['wall_sec']} | {results[8]['images_per_sec']} | {results[8]['kept']} |
| local[32] | {results[32]['wall_sec']} | {results[32]['images_per_sec']} | {kept} |

**Scaling efficiency (8 -> 32 cores) = {eff}** (target >= 0.8).

Survivor counts identical at both levels: {results[8]['kept'] == results[32]['kept']}.
""")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--scaling", action="store_true")
    ap.add_argument("--scaling-worker", type=int, default=None)
    ap.add_argument("--images", type=int, default=SCALING_IMAGES)
    args = ap.parse_args()

    if args.scaling_worker:
        print(json.dumps(scaling_worker(args.scaling_worker, args.images)))
    elif args.scaling:
        print(json.dumps(run_scaling(args.images)))
    else:
        print(json.dumps(run_queries()))


if __name__ == "__main__":
    main()
