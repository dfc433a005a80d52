#!/usr/bin/env python
"""Dump formatted physical plans of the engine's key operators to PLANS.md —
the `.explain("formatted")` evidence that plans are shaped right: Python
confined to single ArrowEvalPython nodes, band/bucket keys and Hamming
verification in whole-stage codegen, parquet scans pruned, joins broadcast
where intended."""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

import __spark_entry__ as entrymod
from text_dedup_spark.config import MinHashConfig, SimHashConfig
from text_dedup_spark.operators.lsh import band_rows, candidate_edges
from text_dedup_spark.operators.simhash_dedup import simhash_edges
from text_dedup_spark.sources.session import build_session

SF = "/root/testdata/sf0.01"


def fmt(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def main() -> None:
    spark = build_session(master="local[4]", shuffle_partitions=8, app_name="plans")
    docs = entrymod._docs(spark, SF).select("doc_id", "text")
    mc = MinHashConfig(ngram_size=5, num_perm=64, threshold=0.7).resolve()
    sc = SimHashConfig()

    sections = []

    bands = band_rows(docs, "text", mc, "doc_id")
    sections.append((
        "MinHash band rows (signature UDF -> Catalyst xxhash64 band keys -> explode)",
        "ONE ArrowEvalPython node; banding/keys in Project (codegen); "
        "parquet scan reads only (doc_id, text).",
        fmt(bands),
    ))

    edges = candidate_edges(bands, "doc_id")
    sections.append((
        "LSH candidate edges (bucket-min agg + join back)",
        "HashAggregate with partial_min before the exchange (map-side "
        "combine); the join is the AQE-skew-splittable step. NOTE: this "
        "standalone logical plan shows the band subtree under BOTH join "
        "inputs — the pipelines persist+materialize the band rows "
        "(operators/lsh.minhash_edges, plans/*), so at runtime the UDF "
        "executes once and both consumers read the cache.",
        fmt(edges),
    ))

    sigs = docs.select(F.col("doc_id"), F.xxhash64("text").alias("sig"))
    sections.append((
        "SimHash bucket edges over a 64-bit fingerprint (phash path)",
        "Bucket keys are shiftleft/shiftrightunsigned/AND/OR expressions; "
        "Hamming verify is bit_count(a^b) < k — all whole-stage codegen, "
        "zero Python.",
        fmt(simhash_edges(sigs, sc, "doc_id")),
    ))

    stats = entrymod.q_doc_stats(spark, SF)
    sections.append((
        "doc_stats (token/quality expressions)",
        "Pure Catalyst regexp/aggregate expressions over the scan.",
        fmt(stats),
    ))

    pushdown = entrymod._docs(spark, SF).where(F.col("lang") == "en").select("doc_id", "n_chars")
    sections.append((
        "Filter + projection pushdown sanity",
        "PushedFilters must include IsNotNull(lang)/EqualTo(lang,en); "
        "ReadSchema only doc_id,n_chars,lang.",
        fmt(pushdown),
    ))

    from text_dedup_spark.functions.simhash_udf import bucket_keys128_expr

    sigs128 = docs.select(
        F.col("doc_id"),
        F.xxhash64("text").alias("sig_hi"),
        F.xxhash64("text", F.lit(1)).alias("sig_lo"),
    )
    keys128 = sigs128.select(
        "doc_id",
        F.posexplode(
            bucket_keys128_expr(
                F.col("sig_hi"), F.col("sig_lo"),
                SimHashConfig(f=128, bit_diff=3, num_bucket=4),
            )
        ).alias("perm", "key"),
    )
    sections.append((
        "SimHash f=128 bucket keys over two-long fingerprints",
        "128-bit permute+mask compiled to shiftleft/shiftrightunsigned/"
        "AND/OR over (sig_hi, sig_lo) — whole-stage codegen, zero Python "
        "in shuffle-key derivation even at f=128.",
        fmt(keys128),
    ))

    from text_dedup_spark.operators.bloom import (
        build_bloom,
        exact_dedup_against_history,
        history_hashes,
    )

    hist = docs.where(F.col("doc_id") % 3 != 0)
    hashes = history_hashes(hist, "text")
    sketch = build_bloom(hashes, "__h__", expected=400, fpp=0.01)
    pruned = exact_dedup_against_history(
        docs.where(F.col("doc_id") % 3 == 0), hashes, "text", sketch
    )
    sections.append((
        "Bloom-pre-filtered incremental exact dedup",
        "Catalyst xxhash64 positions + one ArrowEvalPython bit-test; the "
        "anti-join (SortMergeJoin LeftAnti) receives only the bloom-hit "
        "branch; the definite-new branch bypasses it entirely (union).",
        fmt(pruned),
    ))

    from text_dedup_spark.operators.bloom import (
        build_bloom_sharded,
        flag_might_contain_sharded,
    )

    sb = build_bloom_sharded(hashes, "__h__", expected=400, fpp=0.01, n_shards=4)
    flagged = flag_might_contain_sharded(
        docs.where(F.col("doc_id") % 3 == 0).withColumn(
            "__h__", F.md5(F.col("text"))
        ),
        "__h__",
        sb,
    )
    sections.append((
        "Sharded Bloom (100-TB path): build + cogroup probe",
        "Build side: Catalyst pmod(xxhash64) shard key + positions, ONE "
        "Exchange hashpartitioning(__shard__) into a MapInPandas that "
        "emits one (shard, bits) row per shard — no driver merge, no "
        "broadcast anywhere in the plan. Probe side: "
        "FlatMapCoGroupsInPandas on __shard__ — each task holds exactly "
        "one shard's bit array (m_shard/8 bytes) against that shard's "
        "probe rows; memory per task is set by n_shards, independent of "
        "total history size. (The extra Exchange under HashAggregate is "
        "history_hashes' distinct — fixture prep, not the operator; the "
        "post-MapInPandas Exchange moves only n_shards sketch rows.)",
        fmt(flagged),
    ))

    from text_dedup_spark.operators.ann import ivfpq_topk

    emb = entrymod._emb(spark, SF)
    queries = emb.where(F.col("vec_id") < 5)
    sections.append((
        "IVF-PQ top-k (10^12-vector memory path)",
        "Index side: ONE scan of the vectors through two ArrowEvalPython "
        "nodes (cell assign + PQ encode) — the shuffled candidate row is "
        "(id, cell, m-byte code), never the raw vector. Candidates: "
        "hash-partitioned equi-join on cell (no cross join), ADC scoring "
        "as one ArrowEvalPython over (query vec, code). Refine: the "
        "rank<=refine window output (nq x refine rows, corpus-size-"
        "independent) re-joins raw vectors exactly once for exact cosine.",
        fmt(ivfpq_topk(emb, queries, 10, n_centroids=16, n_probe=4,
                       refine=20)),
    ))

    import tempfile

    from text_dedup_spark.operators.ann_index import (
        build_ivfpq_index,
        ivfpq_index_topk,
    )

    idx_path = tempfile.mkdtemp(prefix="plans_annidx_") + "/idx"
    index = build_ivfpq_index(emb, idx_path, n_centroids=16, m=8)
    sections.append((
        "Persisted IVF-PQ index probe (partition-pruned scan)",
        "The serving shape: the index table is parquet partitionBy(cell) "
        "(on-disk inverted lists) and the probed-cell set becomes a "
        "literal `cell IN (...)` PartitionFilters entry on the scan — "
        "the FileScan reads n_probe/n_centroids of the table's "
        "directories; PushedFilters stays empty because the pruning is "
        "purely at the partition (directory) level and pq_code rows are "
        "consumed whole by the ADC ArrowEvalPython.",
        fmt(ivfpq_index_topk(spark, index, queries, 10, n_probe=4)),
    ))

    out = ["# PLANS — physical-plan evidence (`explain(\"formatted\")`)",
           "", "Generated by tools/dump_plans.py at sf0.01; regenerate after "
           "operator changes. Manually-curated sections below the marker "
           "line survive regeneration.", ""]
    for title, why, plan in sections:
        out += [f"## {title}", "", f"_{why}_", "", "```", plan.rstrip(), "```", ""]
    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "PLANS.md"
    )
    MARK = "<!-- manual sections below: preserved by tools/dump_plans.py -->"
    manual = ""
    if os.path.exists(path):
        prev = open(path).read()
        if MARK in prev:
            manual = prev[prev.index(MARK):]
    with open(path, "w") as f:
        f.write("\n".join(out))
        f.write("\n" + (manual or MARK + "\n"))
    print("wrote PLANS.md")
    spark.stop()


if __name__ == "__main__":
    main()
