"""spark-submit entry points mirroring the reference scripts.

Reference CLI surface (utils/add_args.py + per-script mains):
  minhash_spark.py            -> ``minhash``  (one-shot near-dedup)
  minhash_spark_onlyHash.py   -> ``hash``     (stage A: signatures/bands)
  minhash_spark_loadHashAndDedup.py -> ``dedup`` (stage B: global CC)
  minhash_spark_onlyRemove.py -> ``remove``   (stage C: split kept/removed)
  exact_hash.py               -> ``exact``
  simhash.py                  -> ``simhash``
  suffix_array.py             -> ``suffix``

Usage (cluster — spark-submit takes a script path, not ``-m``; build the
archive with ``python tools/make_pyfiles.py``):
  spark-submit --py-files dist/text_dedup_spark.zip tools/submit_cli.py \\
      minhash --input /path/in.parquet --output /path/out --column caption \\
      --ngram_size 5 --num_perm 64 --threshold 0.7
Local shorthand: ``python -m text_dedup_spark.cli <subcommand> ...``

Inputs/outputs are parquet paths by default. Iceberg works two ways:
``--format iceberg`` reads the --input path as an Iceberg table location
(pure-Python format layer, sources/iceberg.py — no runtime jar), and
``--checkpoint_format iceberg`` makes every staged checkpoint, lineage and
metrics table a snapshot-audited Iceberg table. A session configured with
iceberg-spark-runtime can instead use catalog table names via
sources/catalog.IcebergCatalog.
"""

from __future__ import annotations

import argparse
import json
import sys

from pyspark.sql import SparkSession

from .config import MinHashConfig, SimHashConfig, SuffixConfig


def _session(app: str) -> tuple[SparkSession, bool]:
    """(session, owned): reuse an already-active session (e.g. under
    pytest or a notebook) without stopping it on exit; own and stop the
    one we create under spark-submit."""
    active = SparkSession.getActiveSession()
    if active is not None:
        return active, False
    from .sources.session import build_session

    return build_session(app_name=app), True


def _write(df, path: str, fmt: str = "parquet") -> None:
    # reference's final sink is JSON (minhash_spark.py:395); parquet default
    df.write.mode("overwrite").format(fmt).save(path)


def _read(spark: SparkSession, path: str, fmt: str = "parquet"):
    from .sources.text import read_input

    return read_input(spark, path, fmt)


def _add_minhash_args(p: argparse.ArgumentParser, output: bool = True) -> None:
    # names/defaults per utils/add_args.py:54-93
    p.add_argument("--input", required=True)
    p.add_argument("--format", default="parquet",
                   choices=["parquet", "json", "csv", "text", "warc", "iceberg"])
    if output:
        p.add_argument("--output", required=True)
        p.add_argument("--output_format", default="parquet", choices=["parquet", "json"])
    p.add_argument("--column", default="text")
    p.add_argument("--id_column", default=None)
    p.add_argument("--ngram_size", type=int, default=5)
    p.add_argument("--num_perm", type=int, default=256)
    p.add_argument("--threshold", type=float, default=0.7)
    p.add_argument("--b", type=int, default=None)
    p.add_argument("--r", type=int, default=None)
    p.add_argument("--seed", type=int, default=42)
    p.add_argument(
        "--short_doc_policy", default="cluster", choices=["cluster", "keep"],
        help="'cluster' reproduces the reference's all-short-docs mega-"
        "cluster (parity default); 'keep' excludes shingle-less docs from "
        "banding — the production-sane choice (exact-hash still catches "
        "bytewise-equal short docs)",
    )
    p.add_argument(
        "--hot_threshold", type=int, default=None,
        help="bucket size above which the broadcast hot-bucket path routes "
        "the bucket (bounded max task time; identical edges)",
    )


def _minhash_cfg(args) -> MinHashConfig:
    return MinHashConfig(
        ngram_size=args.ngram_size,
        num_perm=args.num_perm,
        threshold=args.threshold,
        b=args.b,
        r=args.r,
        seed=args.seed,
    ).resolve()


def cmd_minhash(args) -> None:
    from .plans.minhash_pipeline import minhash_dedup

    spark, _own = _session("text-dedup-minhash")
    df = _read(spark, args.input, getattr(args, "format", "parquet"))
    res = minhash_dedup(
        df, args.column, _minhash_cfg(args), id_col=args.id_column,
        hot_threshold=args.hot_threshold,
        short_doc_policy=args.short_doc_policy,
    )
    _write(res.kept, f"{args.output}/kept", args.output_format)
    _write(res.removed, f"{args.output}/removed", args.output_format)
    _write(res.assignments, f"{args.output}/clusters", args.output_format)
    if _own:
        spark.stop()


def _catalog(spark, args):
    """Checkpoint catalog factory: parquet paths (default) or real Iceberg
    tables via the pure-Python format layer (sources/iceberg.py) — the
    north rule's lineage/metrics/checkpoint tables become snapshot-audited
    Iceberg tables with no runtime jar."""
    fmt = getattr(args, "checkpoint_format", "parquet")
    if fmt == "iceberg":
        from .sources.iceberg import NativeIcebergCatalog

        return NativeIcebergCatalog(spark, args.checkpoint_dir)
    from .sources.catalog import ParquetCatalog

    return ParquetCatalog(spark, args.checkpoint_dir)


def cmd_hash(args) -> None:
    from .plans.staged import stage_hash

    spark, _own = _session("text-dedup-hash")
    catalog = _catalog(spark, args)
    max_assigned = stage_hash(
        catalog,
        _read(spark, args.input, getattr(args, "format", "parquet")),
        args.column,
        _minhash_cfg(args),
        dataset=args.dataset,
        start_id=args.start_id,
        short_doc_policy=args.short_doc_policy,
    )
    print(max_assigned)  # next dataset's --start_id is this + 1 (PREV_ID role)
    if getattr(args, "append_bands_to", None):
        # snapshot-checkpointed consumption: fold this dataset's band rows
        # into the ONE growing bands table that `dedup --from_snapshot`
        # consumes incrementally (iceberg checkpoints)
        from .plans.staged import bands_name

        catalog.append(catalog.read(bands_name(args.dataset)),
                       args.append_bands_to)
    if _own:
        spark.stop()


def cmd_dedup(args) -> None:
    from .plans.staged import (
        stage_dedup,
        stage_dedup_incremental,
        stage_dedup_incremental_snapshot,
    )

    spark, _own = _session("text-dedup-dedup")
    catalog = _catalog(spark, args)
    if getattr(args, "from_snapshot", None) is not None:
        if getattr(args, "datasets", None):
            raise SystemExit(
                "--from_snapshot consumes ONE growing bands table; "
                "it cannot be combined with --datasets")
        if not hasattr(catalog, "read_incremental"):
            raise SystemExit(
                "--from_snapshot requires --checkpoint_format iceberg "
                "(snapshot history lives in the table format)")
        since = (None if args.from_snapshot == "begin"
                 else int(args.from_snapshot))
        to = catalog.current_snapshot_id(args.bands_table)
        stage_dedup_incremental_snapshot(
            catalog, since, bands_table=args.bands_table, to_snapshot_id=to)
        # the consumed watermark: feed it back as the next --from_snapshot
        print(f"consumed_to_snapshot={to}")
    elif getattr(args, "new_datasets", None):
        stage_dedup_incremental(catalog, args.datasets, args.new_datasets)
    else:
        if not getattr(args, "datasets", None):
            raise SystemExit("dedup needs --datasets (or --from_snapshot)")
        stage_dedup(catalog, args.datasets)
    if _own:
        spark.stop()


def cmd_remove(args) -> None:
    from .plans.staged import stage_remove

    spark, _own = _session("text-dedup-remove")
    catalog = _catalog(spark, args)
    kept, removed = stage_remove(catalog, args.dataset)
    print(f"kept={kept} removed={removed}")
    if _own:
        spark.stop()


def cmd_image_dedup(args) -> None:
    from .config import SimHashConfig
    from .plans.image_pipeline import image_dedup

    spark, _own = _session("text-dedup-image-dedup")
    df = _read(spark, args.input, getattr(args, "format", "parquet"))
    if getattr(args, "fmt_source", "column") == "sniff":
        from .functions.image_udf import with_sniffed_fmt

        df = with_sniffed_fmt(df)
    res = image_dedup(
        df,
        minhash_cfg=_minhash_cfg(args),
        simhash_cfg=SimHashConfig(bit_diff=args.bit_diff),
        phash_source=args.phash_source,
        hot_threshold=args.hot_threshold,
        undecodable=args.undecodable,
        pixel_embedding_eps=args.pixel_embedding_eps,
    )
    _write(res.kept, f"{args.output}/kept", args.output_format)
    if _own:
        spark.stop()


def cmd_image_features(args) -> None:
    from .plans.staged_image import stage_features

    spark, _own = _session("text-dedup-image-features")
    catalog = _catalog(spark, args)
    df = _read(spark, args.input, getattr(args, "format", "parquet"))
    if getattr(args, "fmt_source", "column") == "sniff":
        from .functions.image_udf import with_sniffed_fmt

        df = with_sniffed_fmt(df)
    stage_features(
        catalog, df,
        _minhash_cfg(args),
        dataset=args.dataset, phash_source=args.phash_source,
        short_doc_policy=args.short_doc_policy,
        undecodable=args.undecodable,
    )
    if _own:
        spark.stop()


def cmd_image_cluster(args) -> None:
    from .config import SimHashConfig
    from .plans.staged_image import stage_cluster

    spark, _own = _session("text-dedup-image-cluster")
    catalog = _catalog(spark, args)
    stage_cluster(
        catalog, args.datasets,
        SimHashConfig(f=64, bit_diff=args.bit_diff, num_bucket=args.num_bucket),
    )
    if _own:
        spark.stop()


def cmd_image_apply(args) -> None:
    from .plans.staged_image import stage_apply

    spark, _own = _session("text-dedup-image-apply")
    catalog = _catalog(spark, args)
    kept, removed = stage_apply(
        catalog,
        _read(spark, args.input, getattr(args, "format", "parquet")),
        args.dataset,
    )
    print(f"kept={kept} removed={removed}")
    if _own:
        spark.stop()


def cmd_exact(args) -> None:
    from .operators.exact import exact_dedup
    from .operators.ids import ID, assign_unique_ids
    from .operators.normalize import normalized_exact_dedup

    spark, _own = _session("text-dedup-exact")
    df = _read(spark, args.input, getattr(args, "format", "parquet"))
    id_col = args.id_column
    if id_col is None:
        df = assign_unique_ids(df, ID)
        id_col = ID
    dedup = normalized_exact_dedup if getattr(args, "normalize", False) else exact_dedup
    _write(dedup(df, args.column, id_col), args.output, args.output_format)
    if _own:
        spark.stop()


def cmd_semdedup(args) -> None:
    from .operators.apply import split_survivors
    from .operators.ids import ID, assign_unique_ids
    from .operators.semdedup import semantic_dedup

    spark, _own = _session("text-dedup-semdedup")
    df = _read(spark, args.input, getattr(args, "format", "parquet"))
    id_col = args.id_column
    if id_col is None:
        df = assign_unique_ids(df, ID)
        id_col = ID
    if args.from_text:
        # no embedding column needed: model-free hashed-shingle vectors
        from .operators.semdedup import hashed_shingle_embeddings

        vec_df = hashed_shingle_embeddings(df, args.column, id_col)
        vec_col = "embedding"
    else:
        vec_df, vec_col = df, args.column
    assigns = semantic_dedup(
        vec_df,
        eps=args.eps,
        id_col=id_col,
        vec_col=vec_col,
        n_clusters=args.n_clusters,
        keep=args.keep,
        cell_cap=args.cell_cap,
    )
    kept, removed = split_survivors(df, assigns, id_col)
    _write(kept, f"{args.output}/kept", args.output_format)
    _write(removed, f"{args.output}/removed", args.output_format)
    if _own:
        spark.stop()


def cmd_simhash(args) -> None:
    from .operators.apply import split_survivors
    from .operators.ids import ID, assign_unique_ids
    from .operators.simhash_dedup import simhash_assignments_from_text

    spark, _own = _session("text-dedup-simhash")
    df = _read(spark, args.input, getattr(args, "format", "parquet"))
    id_col = args.id_column
    if id_col is None:
        df = assign_unique_ids(df, ID)
        id_col = ID
    cfg = SimHashConfig(
        f=args.f, bit_diff=args.bit_diff, num_bucket=args.num_bucket, ngram=args.ngram
    )
    assigns = simhash_assignments_from_text(df, args.column, cfg, id_col)
    kept, removed = split_survivors(df, assigns, id_col)
    _write(kept, f"{args.output}/kept", args.output_format)
    _write(removed, f"{args.output}/removed", args.output_format)
    if _own:
        spark.stop()


def cmd_audit_bands(args) -> None:
    from .plans.staged import audit_split_vs_merged

    spark, _own = _session("text-dedup-audit-bands")
    catalog = _catalog(spark, args)
    cfg = _minhash_cfg(args)
    report = audit_split_vs_merged(
        catalog, args.datasets, args.column, cfg,
        short_doc_policy=args.short_doc_policy,
    )
    print(json.dumps(report))
    if _own:
        spark.stop()
    if not report["ok"]:
        raise SystemExit(1)


def cmd_suffix(args) -> None:
    from .operators.ids import ID, assign_unique_ids
    from .operators.suffix import remove_duplicate_substrings

    spark, _own = _session("text-dedup-suffix")
    df = _read(spark, args.input, getattr(args, "format", "parquet"))
    id_col = args.id_column
    if id_col is None:
        df = assign_unique_ids(df, ID)
        id_col = ID
    cfg = SuffixConfig(k=args.k, global_scope=args.global_scope)
    out = remove_duplicate_substrings(df, args.column, cfg, id_col)
    _write(out, args.output, args.output_format)
    if _own:
        spark.stop()


def cmd_bloom(args) -> None:
    from .operators.bloom import dedup_against_history

    spark, _own = _session("text-dedup-bloom")
    new = _read(spark, args.input, getattr(args, "format", "parquet"))
    history = _read(spark, args.history,
                    getattr(args, "history_format", "parquet"))
    out = dedup_against_history(
        new,
        history,
        args.column,
        expected=args.expected,
        fpp=args.fpp,
        n_shards=args.n_shards,
    )
    _write(out, args.output, args.output_format)
    if _own:
        spark.stop()


def cmd_line_dedup(args) -> None:
    from .operators.ids import ID, assign_unique_ids
    from .operators.lines import dedup_lines

    spark, _own = _session("text-dedup-lines")
    df = _read(spark, args.input, getattr(args, "format", "parquet"))
    id_col = args.id_column
    if id_col is None:
        df = assign_unique_ids(df, ID)
        id_col = ID
    _write(dedup_lines(df, args.column, id_col), args.output, args.output_format)
    if _own:
        spark.stop()


def cmd_decontaminate(args) -> None:
    from .operators.decontaminate import decontaminate
    from .operators.ids import ID, assign_unique_ids

    spark, _own = _session("text-dedup-decontaminate")
    df = _read(spark, args.input, getattr(args, "format", "parquet"))
    bench = _read(spark, args.benchmark, args.benchmark_format)
    id_col = args.id_column
    if id_col is None:
        df = assign_unique_ids(df, ID)
        id_col = ID
    out = decontaminate(
        df, bench, args.column, id_col,
        bench_text_col=args.benchmark_column, n=args.ngram_size,
    )
    _write(out.where("NOT contaminated").drop("contaminated", "n_contaminated_grams"),
           f"{args.output}/kept", args.output_format)
    _write(out.where("contaminated"), f"{args.output}/removed", args.output_format)
    if _own:
        spark.stop()


def cmd_quality_stats(args) -> None:
    from .operators.ids import ID, assign_unique_ids
    from .operators.textstats import doc_stats, quality_score, repetition_stats

    spark, _own = _session("text-dedup-quality")
    df = _read(spark, args.input, getattr(args, "format", "parquet"))
    id_col = args.id_column
    if id_col is None:
        df = assign_unique_ids(df, ID)
        id_col = ID
    out = (
        doc_stats(df, args.column, id_col)
        .join(quality_score(df, args.column, id_col), id_col)
        .join(repetition_stats(df, args.column, id_col), id_col)
    )
    _write(out, args.output, args.output_format)
    if _own:
        spark.stop()


def cmd_redact_pii(args) -> None:
    from .operators.ids import ID, assign_unique_ids
    from .operators.pii import redact_pii

    spark, _own = _session("text-dedup-pii")
    df = _read(spark, args.input, getattr(args, "format", "parquet"))
    id_col = args.id_column
    if id_col is None:
        df = assign_unique_ids(df, ID)
        id_col = ID
    _write(redact_pii(df, args.column, id_col), args.output, args.output_format)
    if _own:
        spark.stop()


def cmd_ann_index(args) -> None:
    from .operators.ann_index import (
        append_to_ivfpq_index,
        build_ivfpq_index,
        compact_ivfpq_index,
        ivfpq_drift_report,
        ivfpq_index_topk,
        load_ivfpq_index,
    )

    spark, _own = _session("text-dedup-ann-index")
    try:
        if args.action == "build":
            if not args.input:
                raise SystemExit("ann-index build needs --input")
            corpus = _read(spark, args.input, args.format)
            build_ivfpq_index(
                corpus, args.index_path,
                id_col=args.id_column, vec_col=args.vec_column,
                n_centroids=args.n_centroids, m=args.m, nbits=args.nbits,
            )
        elif args.action == "append":
            if not args.input:
                raise SystemExit("ann-index append needs --input")
            index = load_ivfpq_index(spark, args.index_path)
            append_to_ivfpq_index(
                index, _read(spark, args.input, args.format))
        elif args.action == "compact":
            index = load_ivfpq_index(spark, args.index_path)
            stats = compact_ivfpq_index(spark, index)
            print(json.dumps({"action": "compact", **stats}))
        elif args.action == "drift":
            index = load_ivfpq_index(spark, args.index_path)
            report = ivfpq_drift_report(spark, index)
            if args.output:
                _write(report, args.output, args.output_format)
            from pyspark.sql import functions as F

            tvd = report.agg(
                (F.sum(F.abs(F.col("drift"))) / 2).alias("tvd")).collect()[0]["tvd"]
            print(json.dumps({"action": "drift",
                              "total_variation_distance": round(float(tvd), 6)}))
        else:
            if not (args.input and args.output):
                raise SystemExit("ann-index query needs --input and --output")
            index = load_ivfpq_index(spark, args.index_path)
            corpus = (
                _read(spark, args.corpus, args.format) if args.corpus else None
            )
            out = ivfpq_index_topk(
                spark, index, _read(spark, args.input, args.format),
                args.k, n_probe=args.n_probe, refine=args.refine,
                corpus=corpus,
            )
            _write(out, args.output, args.output_format)
    finally:
        if _own:
            spark.stop()


def build_parser() -> argparse.ArgumentParser:
    top = argparse.ArgumentParser(prog="text_dedup_spark")
    sub = top.add_subparsers(dest="cmd", required=True)

    p = sub.add_parser("minhash", help="one-shot MinHash-LSH near-dedup")
    _add_minhash_args(p)
    p.set_defaults(fn=cmd_minhash)

    p = sub.add_parser("hash", help="stage A: signatures/bands checkpoint")
    _add_minhash_args(p, output=False)  # outputs go to --checkpoint_dir
    p.add_argument("--checkpoint_dir", required=True)
    p.add_argument("--checkpoint_format", choices=["parquet", "iceberg"],
                   default="parquet")
    p.add_argument("--dataset", required=True)
    p.add_argument("--start_id", type=int, default=0)
    p.add_argument(
        "--append_bands_to", default=None,
        help="also append this dataset's band rows into the named growing "
        "bands table (the `dedup --from_snapshot` feed)")
    p.set_defaults(fn=cmd_hash)

    p = sub.add_parser("dedup", help="stage B: global connected components")
    p.add_argument("--checkpoint_dir", required=True)
    p.add_argument("--checkpoint_format", choices=["parquet", "iceberg"],
                   default="parquet")
    p.add_argument("--datasets", nargs="+", default=None)
    p.add_argument(
        "--new_datasets", nargs="+", default=None,
        help="incremental mode: fold these newly hashed datasets into the "
        "existing cluster table (--datasets = the already-clustered ones) "
        "without re-clustering the corpus",
    )
    p.add_argument(
        "--from_snapshot", default=None,
        help="snapshot-checkpointed incremental mode over ONE growing "
        "bands table (--checkpoint_format iceberg only): fold rows "
        "appended after this snapshot id ('begin' = the full history); "
        "prints consumed_to_snapshot=<id> for the next run",
    )
    p.add_argument("--bands_table", default="bands",
                   help="bands table name for --from_snapshot mode")
    p.set_defaults(fn=cmd_dedup)

    p = sub.add_parser("remove", help="stage C: split kept/removed")
    p.add_argument("--checkpoint_dir", required=True)
    p.add_argument("--checkpoint_format", choices=["parquet", "iceberg"],
                   default="parquet")
    p.add_argument("--dataset", required=True)
    p.set_defaults(fn=cmd_remove)

    p = sub.add_parser(
        "image-dedup",
        help="one-shot image+caption dedup (exact bytes + caption MinHash + "
        "phash Hamming in ONE CC pass; --pixel_embedding_eps adds the "
        "SemDeDup pixel-embedding modality)",
    )
    _add_minhash_args(p)
    p.add_argument("--bit_diff", type=int, default=3)
    p.add_argument("--phash_source", default="column", choices=["column", "pixels"])
    p.add_argument("--undecodable", default="error", choices=["error", "flag"])
    p.add_argument("--pixel_embedding_eps", type=float, default=None)
    p.add_argument("--fmt_source", default="column", choices=["column", "sniff"],
                   help="sniff: repair the fmt column from magic bytes "
                        "(coalesce(sniffed, fmt)) before decoding")
    p.set_defaults(fn=cmd_image_dedup)

    p = sub.add_parser("image-features",
                       help="image stage A: per-row features + band checkpoints")
    _add_minhash_args(p, output=False)
    p.add_argument("--checkpoint_dir", required=True)
    p.add_argument("--checkpoint_format", choices=["parquet", "iceberg"],
                   default="parquet")
    p.add_argument("--dataset", required=True)
    p.add_argument("--phash_source", default="column", choices=["column", "pixels"])
    p.add_argument("--undecodable", default="error", choices=["error", "flag"],
                   help="flag: undecodable payloads (arithmetic JPEG, corrupt "
                        "bytes) get decode_ok=false and skip the phash modality "
                        "instead of failing the task")
    p.add_argument("--fmt_source", default="column", choices=["column", "sniff"],
                   help="sniff: repair the fmt column from magic bytes "
                        "(coalesce(sniffed, fmt)) before decoding")
    p.set_defaults(fn=cmd_image_features)

    p = sub.add_parser("image-cluster", help="image stage B: 3-modality global CC")
    p.add_argument("--checkpoint_dir", required=True)
    p.add_argument("--checkpoint_format", choices=["parquet", "iceberg"],
                   default="parquet")
    p.add_argument("--datasets", nargs="+", required=True)
    p.add_argument("--bit_diff", type=int, default=3)
    p.add_argument("--num_bucket", type=int, default=4)
    p.set_defaults(fn=cmd_image_cluster)

    p = sub.add_parser("image-apply", help="image stage C: split kept/removed")
    p.add_argument("--input", required=True)
    p.add_argument("--checkpoint_dir", required=True)
    p.add_argument("--checkpoint_format", choices=["parquet", "iceberg"],
                   default="parquet")
    p.add_argument("--dataset", required=True)
    p.set_defaults(fn=cmd_image_apply)

    p = sub.add_parser("exact", help="exact-hash dedup")
    p.add_argument("--input", required=True)
    p.add_argument("--format", default="parquet",
                   choices=["parquet", "json", "csv", "text", "warc", "iceberg"])
    p.add_argument("--output", required=True)
    p.add_argument("--output_format", default="parquet", choices=["parquet", "json"])
    p.add_argument("--column", default="text")
    p.add_argument("--id_column", default=None)
    p.add_argument("--normalize", action="store_true",
                   help="dedup on the CCNet-style normalized rendering "
                        "(case/digits/accents/punct/whitespace folded)")
    p.set_defaults(fn=cmd_exact)

    p = sub.add_parser("simhash", help="SimHash near-dedup")
    p.add_argument("--input", required=True)
    p.add_argument("--format", default="parquet",
                   choices=["parquet", "json", "csv", "text", "warc", "iceberg"])
    p.add_argument("--output", required=True)
    p.add_argument("--output_format", default="parquet", choices=["parquet", "json"])
    p.add_argument("--column", default="text")
    p.add_argument("--id_column", default=None)
    p.add_argument("--f", type=int, default=64)
    p.add_argument("--bit_diff", type=int, default=3)
    p.add_argument("--num_bucket", type=int, default=4)
    p.add_argument("--ngram", type=int, default=3)
    p.set_defaults(fn=cmd_simhash)

    p = sub.add_parser(
        "semdedup",
        help="SemDeDup semantic dedup over an embedding column "
        "(k-means cells + within-cell cosine pruning)",
    )
    p.add_argument("--input", required=True)
    p.add_argument("--format", default="parquet", choices=["parquet", "json"])
    p.add_argument("--output", required=True)
    p.add_argument("--output_format", default="parquet", choices=["parquet", "json"])
    p.add_argument("--column", default="embedding")
    p.add_argument("--id_column", default=None)
    p.add_argument("--eps", type=float, default=0.95)
    p.add_argument("--n_clusters", type=int, default=64)
    p.add_argument("--keep", default="low", choices=["low", "high", "min_id"])
    p.add_argument("--cell_cap", type=int, default=50_000)
    p.add_argument(
        "--from_text", action="store_true",
        help="treat --column as TEXT and embed it with model-free "
        "hashed-shingle vectors before deduplicating",
    )
    p.set_defaults(fn=cmd_semdedup)

    p = sub.add_parser(
        "audit-bands",
        help="checkpoint-fidelity audit: per-dataset band checkpoints vs a "
        "fresh one-pass hash of the merged corpus (show_splitHashesDiff)",
    )
    p.add_argument("--checkpoint_dir", required=True)
    p.add_argument("--checkpoint_format", choices=["parquet", "iceberg"],
                   default="parquet")
    p.add_argument("--datasets", nargs="+", required=True)
    p.add_argument("--column", default="text")
    # same spellings as the `hash` stage so a run's flags paste across
    p.add_argument("--ngram_size", type=int, default=5)
    p.add_argument("--num_perm", type=int, default=256)
    p.add_argument("--threshold", type=float, default=0.7)
    p.add_argument("--b", type=int, default=None)
    p.add_argument("--r", type=int, default=None)
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--short_doc_policy", default="cluster", choices=["cluster", "keep"])
    p.set_defaults(fn=cmd_audit_bands)

    p = sub.add_parser("suffix", help="duplicate-substring removal")
    p.add_argument("--input", required=True)
    p.add_argument("--format", default="parquet",
                   choices=["parquet", "json", "csv", "text", "warc", "iceberg"])
    p.add_argument("--output", required=True)
    p.add_argument("--output_format", default="parquet", choices=["parquet", "json"])
    p.add_argument("--column", default="text")
    p.add_argument("--id_column", default=None)
    p.add_argument("--k", type=int, default=100)
    p.add_argument("--global_scope", action="store_true")
    p.set_defaults(fn=cmd_suffix)

    p = sub.add_parser(
        "bloom",
        help="incremental dedup vs a history corpus via Bloom pre-filter "
        "(auto-selects the sharded executor-side sketch above 100M "
        "expected history values; exact anti-join decides all hits)",
    )
    p.add_argument("--input", required=True, help="the NEW rows")
    p.add_argument("--format", default="parquet",
                   choices=["parquet", "json", "csv", "text", "warc", "iceberg"])
    p.add_argument("--history", required=True, help="already-ingested corpus")
    p.add_argument("--history_format", default="parquet",
                   choices=["parquet", "json", "csv", "text", "warc", "iceberg"])
    p.add_argument("--output", required=True)
    p.add_argument("--output_format", default="parquet", choices=["parquet", "json"])
    p.add_argument("--column", default="text")
    p.add_argument("--expected", type=int, default=None,
                   help="expected distinct history values (default: counted)")
    p.add_argument("--fpp", type=float, default=0.01)
    p.add_argument("--n_shards", type=int, default=None,
                   help="None=auto (sharded above 100M expected, ~25M values "
                   "per shard); 0 forces the driver-merged sketch; N pins "
                   "the sharded layout")
    p.set_defaults(fn=cmd_bloom)

    p = sub.add_parser(
        "line-dedup",
        help="corpus-wide line dedup (CCNet-style keep-first boilerplate strip)",
    )
    p.add_argument("--input", required=True)
    p.add_argument("--format", default="parquet",
                   choices=["parquet", "json", "csv", "text", "warc", "iceberg"])
    p.add_argument("--output", required=True)
    p.add_argument("--output_format", default="parquet", choices=["parquet", "json"])
    p.add_argument("--column", default="text")
    p.add_argument("--id_column", default=None)
    p.set_defaults(fn=cmd_line_dedup)

    p = sub.add_parser(
        "decontaminate",
        help="benchmark n-gram decontamination (GPT-3/Llama 13-gram rule)",
    )
    p.add_argument("--input", required=True)
    p.add_argument("--format", default="parquet",
                   choices=["parquet", "json", "csv", "text", "warc", "iceberg"])
    p.add_argument("--benchmark", required=True)
    p.add_argument("--benchmark_format", default="parquet",
                   choices=["parquet", "json", "csv", "text", "warc", "iceberg"])
    p.add_argument("--benchmark_column", default="text")
    p.add_argument("--output", required=True)
    p.add_argument("--output_format", default="parquet", choices=["parquet", "json"])
    p.add_argument("--column", default="text")
    p.add_argument("--id_column", default=None)
    p.add_argument("--ngram_size", type=int, default=13)
    p.set_defaults(fn=cmd_decontaminate)

    p = sub.add_parser(
        "quality-stats",
        help="per-doc quality/repetition signal table (doc_stats + quality + "
        "Gopher repetition fractions)",
    )
    p.add_argument("--input", required=True)
    p.add_argument("--format", default="parquet",
                   choices=["parquet", "json", "csv", "text", "warc", "iceberg"])
    p.add_argument("--output", required=True)
    p.add_argument("--output_format", default="parquet", choices=["parquet", "json"])
    p.add_argument("--column", default="text")
    p.add_argument("--id_column", default=None)
    p.set_defaults(fn=cmd_quality_stats)

    p = sub.add_parser(
        "redact-pii",
        help="replace emails/IPv4/SSN/phone with placeholder tokens + "
        "per-doc hit counts",
    )
    p.add_argument("--input", required=True)
    p.add_argument("--format", default="parquet",
                   choices=["parquet", "json", "csv", "text", "warc", "iceberg"])
    p.add_argument("--output", required=True)
    p.add_argument("--output_format", default="parquet", choices=["parquet", "json"])
    p.add_argument("--column", default="text")
    p.add_argument("--id_column", default=None)
    p.set_defaults(fn=cmd_redact_pii)

    p = sub.add_parser(
        "ann-index",
        help="persisted IVF-PQ index: build once (cell-partitioned parquet "
        "+ sidecar trainers), append O(new), query with partition-pruned "
        "probes",
    )
    p.add_argument("--action", required=True,
                   choices=["build", "append", "query", "compact", "drift"])
    p.add_argument("--index_path", required=True)
    p.add_argument("--input", default=None,
                   help="vector table (build/append: corpus; query: queries)")
    p.add_argument("--format", default="parquet",
                   choices=["parquet", "json", "iceberg"])
    p.add_argument("--id_column", default="vec_id")
    p.add_argument("--vec_column", default="embedding")
    p.add_argument("--n_centroids", type=int, default=64)
    p.add_argument("--m", type=int, default=8)
    p.add_argument("--nbits", type=int, default=8)
    p.add_argument("--k", type=int, default=10)
    p.add_argument("--n_probe", type=int, default=8)
    p.add_argument("--refine", type=int, default=0)
    p.add_argument("--corpus", default=None,
                   help="raw-vector table for --refine re-ranking (the "
                   "index stores codes only)")
    p.add_argument("--output", default=None, help="query results (query)")
    p.add_argument("--output_format", default="parquet",
                   choices=["parquet", "json"])
    p.set_defaults(fn=cmd_ann_index)

    return top


def main(argv=None) -> None:
    args = build_parser().parse_args(argv)
    args.fn(args)


if __name__ == "__main__":
    main(sys.argv[1:])
