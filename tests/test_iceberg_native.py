"""Pure-Python Iceberg v2 + Avro coverage (sources/iceberg.py, avro_io.py).

Evidence classes:
1. Avro conformance against the REAL Apache Avro Java library that ships
   inside Spark's JVM (avro-1.12.1.jar): files written by this repo's
   encoder are read back by org.apache.avro.file.DataFileReader, and a
   file written by the Java GenericDatumWriter is decoded by this repo's
   reader — bidirectional, so a matched encode/decode bug cannot hide;
2. Iceberg table semantics: create/read schema fidelity (nullability,
   array columns), append snapshots, time travel, overwrite isolation,
   null partition values, schema-change rejection;
3. scan planning: file-level pruning on identity partition tuples AND
   manifest-level pruning on field summaries (observed by counting
   manifest reads), with results always equal to a full-scan filter;
4. the north-rule seam: per-partition lineage + metrics land in REAL
   Iceberg tables through NativeIcebergCatalog (snapshot per append);
5. error paths: corrupt/truncated Avro, unknown snapshot.

The env-gated iceberg-spark-runtime round trip (tests/test_iceberg.py)
remains the production-jar check; these tests execute the table FORMAT
itself, jar-free.
"""

from __future__ import annotations

import json
import os

import pytest

from text_dedup_spark.sources.avro_io import read_avro_file, write_avro_file
from text_dedup_spark.sources.iceberg import (
    NativeIcebergCatalog,
    NativeIcebergTable,
)

NESTED_SCHEMA = {
    "type": "record", "name": "manifest_entry", "fields": [
        {"name": "status", "type": "int"},
        {"name": "snapshot_id", "type": ["null", "long"], "default": None},
        {"name": "data_file", "type": {"type": "record", "name": "r2", "fields": [
            {"name": "file_path", "type": "string"},
            {"name": "file_size", "type": "long"},
            {"name": "partition", "type": {"type": "record", "name": "r102", "fields": [
                {"name": "lang", "type": ["null", "string"], "default": None}]}},
            {"name": "bounds", "type": ["null", {"type": "map", "values": "bytes"}],
             "default": None},
            {"name": "tags", "type": {"type": "array", "items": "string"}},
            {"name": "kind", "type": {"type": "enum", "name": "k", "symbols": ["A", "B"]}},
            {"name": "fx", "type": {"type": "fixed", "name": "fx4", "size": 4}},
            {"name": "score", "type": "double"}]}},
    ],
}

NESTED_RECORDS = [
    {"status": 1, "snapshot_id": 12345678901234, "data_file": {
        "file_path": "data/x=1/f1.parquet", "file_size": -42,
        "partition": {"lang": "en"}, "bounds": {"lo": b"\x01\x02", "hi": b"\xff"},
        "tags": ["a", "b", ""], "kind": "B", "fx": b"\xde\xad\xbe\xef",
        "score": -1.5}},
    {"status": 0, "snapshot_id": None, "data_file": {
        "file_path": "f2.parquet", "file_size": 0,
        "partition": {"lang": None}, "bounds": None,
        "tags": [], "kind": "A", "fx": b"\x00\x00\x00\x00", "score": 2.25}},
]


# ------------------------------------------------------------ 1. Avro


@pytest.mark.parametrize("codec", ["null", "deflate"])
def test_avro_python_roundtrip(tmp_path, codec):
    p = str(tmp_path / f"t_{codec}.avro")
    write_avro_file(p, NESTED_SCHEMA, NESTED_RECORDS, codec=codec)
    schema, records, meta = read_avro_file(p)
    assert records == NESTED_RECORDS
    assert meta["avro.codec"] == codec.encode()
    # deterministic bytes (manifest reproducibility)
    p2 = str(tmp_path / "again.avro")
    write_avro_file(p2, NESTED_SCHEMA, NESTED_RECORDS, codec=codec)
    assert open(p, "rb").read() == open(p2, "rb").read()


@pytest.mark.parametrize("codec", ["null", "deflate"])
def test_java_avro_reads_python_files(spark, tmp_path, codec):
    p = str(tmp_path / "py.avro")
    write_avro_file(p, NESTED_SCHEMA, NESTED_RECORDS, codec=codec)
    jvm = spark._jvm
    dfr = jvm.org.apache.avro.file.DataFileReader(
        jvm.java.io.File(p), jvm.org.apache.avro.generic.GenericDatumReader())
    got = []
    while dfr.hasNext():
        r = dfr.next()
        d = r.get("data_file")
        got.append((
            r.get("status"),
            r.get("snapshot_id"),
            str(d.get("file_path")),
            d.get("file_size"),
            None if d.get("partition").get("lang") is None
            else str(d.get("partition").get("lang")),
            str(d.get("kind")),
            d.get("score"),
            d.get("tags").size(),
        ))
    dfr.close()
    assert got == [
        (1, 12345678901234, "data/x=1/f1.parquet", -42, "en", "B", -1.5, 3),
        (0, None, "f2.parquet", 0, None, "A", 2.25, 0),
    ]


def test_python_reads_java_avro_file(spark, tmp_path):
    jvm = spark._jvm
    schema = jvm.org.apache.avro.Schema.Parser().parse(json.dumps(NESTED_SCHEMA))
    dfw = jvm.org.apache.avro.file.DataFileWriter(
        jvm.org.apache.avro.generic.GenericDatumWriter(schema))
    dfw.setCodec(jvm.org.apache.avro.file.CodecFactory.deflateCodec(6))
    p = str(tmp_path / "java.avro")
    dfw.create(schema, jvm.java.io.File(p))
    df_schema = schema.getField("data_file").schema()
    d = jvm.org.apache.avro.generic.GenericData.Record(df_schema)
    d.put("file_path", "j.parquet")
    d.put("file_size", 7777777777)  # > 2^31 so py4j sends a Java long
    part = jvm.org.apache.avro.generic.GenericData.Record(
        df_schema.getField("partition").schema())
    part.put("lang", "fr")
    d.put("partition", part)
    hm = jvm.java.util.HashMap()
    hm.put("lo", jvm.java.nio.ByteBuffer.wrap(bytearray(b"\x09")))
    d.put("bounds", hm)
    al = jvm.java.util.ArrayList()
    al.add("t1")
    d.put("tags", al)
    d.put("kind", jvm.org.apache.avro.generic.GenericData.EnumSymbol(
        df_schema.getField("kind").schema(), "A"))
    d.put("fx", jvm.org.apache.avro.generic.GenericData.Fixed(
        df_schema.getField("fx").schema(), bytearray(b"\x01\x02\x03\x04")))
    d.put("score", 3.5)
    rec = jvm.org.apache.avro.generic.GenericData.Record(schema)
    rec.put("status", 2)
    rec.put("snapshot_id", 99999999999)
    rec.put("data_file", d)
    dfw.append(rec)
    dfw.close()

    _, records, _ = read_avro_file(p)
    assert records == [{"status": 2, "snapshot_id": 99999999999, "data_file": {
        "file_path": "j.parquet", "file_size": 7777777777,
        "partition": {"lang": "fr"}, "bounds": {"lo": b"\x09"},
        "tags": ["t1"], "kind": "A", "fx": b"\x01\x02\x03\x04", "score": 3.5}}]


def test_avro_error_paths(tmp_path):
    p = str(tmp_path / "x.avro")
    write_avro_file(p, NESTED_SCHEMA, NESTED_RECORDS)
    data = open(p, "rb").read()
    bad = str(tmp_path / "bad.avro")
    with open(bad, "wb") as f:
        f.write(b"NOPE" + data[4:])
    with pytest.raises(ValueError, match="not an Avro"):
        read_avro_file(bad)
    trunc = str(tmp_path / "trunc.avro")
    with open(trunc, "wb") as f:
        f.write(data[: len(data) - 9])
    with pytest.raises(ValueError):
        read_avro_file(trunc)


# ------------------------------------------------- 2. table semantics


def _docs_df(spark, n=100, offset=0, langs=("en", "fr", "de")):
    return spark.createDataFrame(
        [(offset + i, f"doc {offset + i}", langs[i % len(langs)])
         for i in range(n)],
        "id long, caption string, lang string",
    )


def test_create_read_schema_fidelity(spark, tmp_path):
    df = _docs_df(spark)
    t = NativeIcebergTable(spark, str(tmp_path / "t"))
    t.create(df, partition_by=["lang"])
    back = t.read()
    assert back.schema == df.schema  # incl. nullability of the partition col
    assert sorted(r["id"] for r in back.collect()) == list(range(100))
    md = t.metadata()
    # spec-required v2 metadata fields
    for key in ("format-version", "table-uuid", "last-sequence-number",
                "schemas", "partition-specs", "current-snapshot-id",
                "snapshots", "snapshot-log", "sort-orders"):
        assert key in md, key
    assert md["format-version"] == 2
    assert md["partition-specs"][0]["fields"][0]["transform"] == "identity"


def test_array_column_and_unpartitioned(spark, tmp_path):
    emb = spark.createDataFrame(
        [(i, [float(i), 0.5]) for i in range(20)],
        "vec_id long, embedding array<float>")
    t = NativeIcebergTable(spark, str(tmp_path / "emb"))
    t.create(emb)
    back = t.read()
    assert back.schema == emb.schema
    assert back.count() == 20


def test_append_time_travel_overwrite(spark, tmp_path):
    t = NativeIcebergTable(spark, str(tmp_path / "t"))
    t.create(_docs_df(spark), partition_by=["lang"])
    t.append(_docs_df(spark, n=10, offset=1000, langs=("en",)))
    snaps = t.snapshots()
    assert [s["summary"]["operation"] for s in snaps] == ["append", "append"]
    assert snaps[1]["parent-snapshot-id"] == snaps[0]["snapshot-id"]
    assert t.read().count() == 110
    # time travel to the first snapshot
    assert t.read(snapshot_id=snaps[0]["snapshot-id"]).count() == 100
    # overwrite replaces content but keeps history
    t.overwrite(_docs_df(spark, n=5, offset=9000))
    assert t.read().count() == 5
    assert len(t.snapshots()) == 3
    assert t.read(snapshot_id=snaps[1]["snapshot-id"]).count() == 110
    with pytest.raises(ValueError, match="unknown snapshot"):
        t.read(snapshot_id=123)


def test_null_partition_values(spark, tmp_path):
    df = spark.createDataFrame(
        [(1, "a", "en"), (2, "b", None), (3, "c", None)],
        "id long, caption string, lang string")
    t = NativeIcebergTable(spark, str(tmp_path / "t"))
    t.create(df, partition_by=["lang"])
    back = t.read()
    got = {r["id"]: r["lang"] for r in back.collect()}
    assert got == {1: "en", 2: None, 3: None}
    # equality filters never match null partitions (SQL semantics)
    assert t.read(filters={"lang": "en"}).count() == 1


def test_create_twice_rejected(spark, tmp_path):
    t = NativeIcebergTable(spark, str(tmp_path / "t"))
    t.create(_docs_df(spark, n=5))
    with pytest.raises(ValueError, match="already exists"):
        t.create(_docs_df(spark, n=1))


# ------------------------------------------------------ 3. scan planning


def test_partition_pruning_files_and_results(spark, tmp_path):
    t = NativeIcebergTable(spark, str(tmp_path / "t"))
    df = _docs_df(spark, n=90)
    t.create(df, partition_by=["lang"])
    all_entries = t.scan_files()
    en_entries = t.scan_files(filters={"lang": "en"})
    assert 0 < len(en_entries) < len(all_entries)
    assert all(e["data_file"]["partition"]["lang"] == "en" for e in en_entries)
    # record counts in manifests are real parquet footer counts
    assert sum(e["data_file"]["record_count"] for e in all_entries) == 90
    # pruned read == full read + filter
    pruned = {tuple(r) for r in t.read(filters={"lang": "en"}).collect()}
    full = {tuple(r) for r in t.read().where("lang = 'en'").collect()}
    assert pruned == full and len(pruned) == 30


def test_manifest_level_pruning_skips_reads(spark, tmp_path, monkeypatch):
    """Two appends with disjoint partition ranges -> two manifests; an
    equality filter outside one manifest's [lower, upper] summary must skip
    that manifest file entirely (counted via a read_avro_file spy)."""
    from text_dedup_spark.sources import iceberg as ice_mod

    t = NativeIcebergTable(spark, str(tmp_path / "t"))
    t.create(_docs_df(spark, n=30, langs=("aa", "bb")), partition_by=["lang"])
    t.append(_docs_df(spark, n=30, offset=100, langs=("yy", "zz")))

    calls: list[str] = []
    orig = ice_mod.read_avro_file

    def spy(path):
        calls.append(os.path.basename(path))
        return orig(path)

    monkeypatch.setattr(ice_mod, "read_avro_file", spy)
    entries = t.scan_files(filters={"lang": "zz"})
    manifest_reads = [c for c in calls if c.startswith("m")]
    assert len(manifest_reads) == 1, calls  # first-snapshot manifest skipped
    assert {e["data_file"]["partition"]["lang"] for e in entries} == {"zz"}
    got = t.read(filters={"lang": "zz"})
    assert got.count() == 15 and set(r["lang"] for r in got.collect()) == {"zz"}


def test_residual_filters(spark, tmp_path):
    t = NativeIcebergTable(spark, str(tmp_path / "t"))
    t.create(_docs_df(spark), partition_by=["lang"])
    assert t.read(filters={"id": (">=", 95)}).count() == 5
    assert t.read(filters={"id": ("in", [3, 4, 4000])}).count() == 2
    assert t.read(filters={"lang": "en", "id": ("<", 30)}).count() == 10


# --------------------------------------------- 4. catalog + north rule


def test_catalog_surface_and_lineage_metrics_to_iceberg(spark, tmp_path):
    from text_dedup_spark.plans.metrics import (
        LINEAGE_TABLE,
        METRICS_TABLE,
        log_metric,
        log_partition_lineage,
    )

    cat = NativeIcebergCatalog(spark, str(tmp_path / "wh"))
    df = _docs_df(spark)
    cat.write(df, "docs")
    cat.append(_docs_df(spark, n=10, offset=500), "docs")
    assert cat.read("docs").count() == 110
    assert cat.exists("docs") and not cat.exists("nope")
    cat.write(_docs_df(spark, n=7), "other")
    assert cat.read_many(["docs", "other"]).count() == 117

    # north rule: per-partition lineage + metrics land in Iceberg tables
    log_metric(cat, "run1", "hash", "docs", 100, 90, 1.25)
    log_metric(cat, "run1", "dedup", "docs", 90, 80, 2.5)
    log_partition_lineage(cat, "run1", "hash:docs", df.repartition(4))
    metrics = cat.read(METRICS_TABLE)
    assert metrics.count() == 2
    assert {r["stage"] for r in metrics.collect()} == {"hash", "dedup"}
    lineage = cat.read(LINEAGE_TABLE)
    rows = lineage.collect()
    assert sum(r["rows"] for r in rows) == 100
    assert len(rows) == 4  # one row per physical partition
    # each append is a real Iceberg snapshot (auditable history)
    t = NativeIcebergTable(spark, cat.path(METRICS_TABLE))
    assert [s["summary"]["operation"] for s in t.snapshots()] == ["append", "append"]


# ------------------------------------------------------------ 5. CLI e2e


def test_cli_staged_pipeline_on_iceberg_checkpoints(spark, tmp_path):
    """The full staged hash -> dedup -> remove CLI flow with
    --checkpoint_format iceberg: every checkpoint, lineage, and metrics
    table is a real Iceberg table, and the dedup answer is byte-identical
    to the parquet-checkpoint run."""
    from tests.conftest import synth_corpus
    from text_dedup_spark import cli

    corpus = str(tmp_path / "corpus")
    spark.createDataFrame(
        synth_corpus(60, seed=7), "doc_id long, text string"
    ).write.mode("overwrite").parquet(corpus)

    results = {}
    for fmt in ("parquet", "iceberg"):
        ckpt = str(tmp_path / f"ckpt_{fmt}")
        common = ["--column", "text", "--ngram_size", "3", "--num_perm", "16",
                  "--threshold", "0.7", "--checkpoint_dir", ckpt,
                  "--checkpoint_format", fmt]
        cli.main(["hash", "--input", corpus, "--dataset", "ds1", *common])
        cli.main(["dedup", "--checkpoint_dir", ckpt,
                  "--checkpoint_format", fmt, "--datasets", "ds1"])
        cli.main(["remove", "--checkpoint_dir", ckpt,
                  "--checkpoint_format", fmt, "--dataset", "ds1"])
        cat = (NativeIcebergCatalog(spark, ckpt) if fmt == "iceberg"
               else __import__("text_dedup_spark.sources.catalog",
                               fromlist=["ParquetCatalog"]).ParquetCatalog(spark, ckpt))
        kept = cat.read("ds1__kept")
        removed = cat.read("ds1__removed")
        results[fmt] = (
            sorted(r["doc_id"] for r in kept.collect()),
            sorted(r["doc_id"] for r in removed.collect()),
        )
    assert results["iceberg"] == results["parquet"]
    assert len(results["iceberg"][1]) > 0  # planted dups removed

    # the Iceberg checkpoints are REAL v2 tables with snapshot history,
    # and lineage/metrics landed as Iceberg tables too (north rule)
    ice = str(tmp_path / "ckpt_iceberg")
    t = NativeIcebergTable(spark, os.path.join(ice, "ds1__kept"))
    assert t.exists() and t.metadata()["format-version"] == 2
    cat = NativeIcebergCatalog(spark, ice)
    assert cat.read("metrics").count() >= 3   # hash, dedup, remove stages
    assert cat.read("lineage").count() > 0


def test_file_level_column_bounds_pruning(spark, tmp_path):
    """Numeric column bounds from parquet footers land in the manifest
    (lower_bounds/upper_bounds keyed by field id) and prune files whose
    range provably cannot satisfy a residual filter."""
    t = NativeIcebergTable(spark, str(tmp_path / "t"))
    # two appends with disjoint id ranges -> disjoint per-file bounds
    t.create(_docs_df(spark, n=40).repartition(2))
    t.append(_docs_df(spark, n=40, offset=10_000).repartition(2))
    all_entries = t.scan_files()
    assert len(all_entries) >= 4
    e0 = all_entries[0]["data_file"]
    assert e0["lower_bounds"] and e0["upper_bounds"]  # bounds recorded
    hi = t.scan_files(filters={"id": (">=", 10_000)})
    assert 0 < len(hi) < len(all_entries)
    lo_eq = t.scan_files(filters={"id": 5})
    assert 0 < len(lo_eq) < len(all_entries)
    # strings deliberately carry no bounds (parquet stats truncation)
    ids_with_bounds = {kv["key"] for kv in e0["lower_bounds"]}
    md = t.metadata()
    caption_id = next(f["id"] for f in md["schemas"][0]["fields"]
                      if f["name"] == "caption")
    assert caption_id not in ids_with_bounds
    # exactness: pruned read == full read + filter
    pruned = {r["id"] for r in t.read(filters={"id": (">=", 10_000)}).collect()}
    assert pruned == set(range(10_000, 10_040))


def test_cli_reads_iceberg_input(spark, tmp_path):
    """--format iceberg: the dedup CLI reads its corpus FROM an Iceberg
    table (the reference's warehouse-scan analog, minhash_spark.py:326)."""
    from tests.conftest import synth_corpus
    from text_dedup_spark import cli

    table_loc = str(tmp_path / "corpus_ice")
    df = spark.createDataFrame(synth_corpus(60, seed=7),
                               "doc_id long, text string")
    NativeIcebergTable(spark, table_loc).create(df)
    total = df.count()  # synth_corpus plants extra duplicate rows
    out = str(tmp_path / "out")
    cli.main(["minhash", "--input", table_loc, "--format", "iceberg",
              "--output", out, "--column", "text", "--id_column", "doc_id",
              "--ngram_size", "3", "--num_perm", "16", "--threshold", "0.7"])
    kept = spark.read.parquet(f"{out}/kept")
    clusters = spark.read.parquet(f"{out}/clusters")
    assert kept.count() + clusters.count() == total


# -------------------------------------------------- 6. maintenance ops


def test_delete_where_copy_on_write(spark, tmp_path):
    t = NativeIcebergTable(spark, str(tmp_path / "t"))
    t.create(_docs_df(spark), partition_by=["lang"])
    n = t.delete_where({"lang": "en"})
    assert n == 34
    back = t.read()
    assert back.count() == 66 and set(r["lang"] for r in back.collect()) == {"fr", "de"}
    # the delete is a snapshot: time travel still sees the full table
    first = t.snapshots()[0]["snapshot-id"]
    assert t.read(snapshot_id=first).count() == 100
    n2 = t.delete_where({"id": ("<", 10), "lang": "fr"})  # AND semantics
    assert n2 == 3  # fr rows below id 10 are ids 1, 4, 7
    with pytest.raises(ValueError, match="predicate"):
        t.delete_where({})


def test_compact_small_files(spark, tmp_path):
    t = NativeIcebergTable(spark, str(tmp_path / "m"))
    # ten appends of one row each -> ten tiny files (the metrics-table shape)
    t.create(_docs_df(spark, n=1, langs=("en",)))
    for i in range(1, 10):
        t.append(_docs_df(spark, n=1, offset=i, langs=("en",)))
    before, after = t.compact(n_files=1)
    assert before == 10 and after == 1
    assert sorted(r["id"] for r in t.read().collect()) == list(range(10))


def test_expire_snapshots_reclaims_files(spark, tmp_path):
    t = NativeIcebergTable(spark, str(tmp_path / "t"))
    t.create(_docs_df(spark, n=20))
    t.append(_docs_df(spark, n=20, offset=100))
    t.overwrite(_docs_df(spark, n=5, offset=900))
    n_parquet_before = sum(
        len([f for f in files if f.endswith(".parquet")])
        for _, _, files in os.walk(str(tmp_path / "t" / "data")))
    stats = t.expire_snapshots(keep_last=1)
    assert stats["snapshots_removed"] == 2
    assert stats["data_files_deleted"] > 0
    assert len(t.snapshots()) == 1
    # current data is intact; expired snapshots are gone
    assert sorted(r["id"] for r in t.read().collect()) == list(range(900, 905))
    n_parquet_after = sum(
        len([f for f in files if f.endswith(".parquet")])
        for _, _, files in os.walk(str(tmp_path / "t" / "data")))
    assert n_parquet_after < n_parquet_before
    with pytest.raises(ValueError, match="unknown snapshot"):
        t.read(snapshot_id=1)


def test_expire_keeps_shared_files_of_retained_snapshots(spark, tmp_path):
    """An append chain shares data files across snapshots: expiring the
    parent of a retained append must NOT delete files the retained
    snapshot still references."""
    t = NativeIcebergTable(spark, str(tmp_path / "t"))
    t.create(_docs_df(spark, n=20))
    t.append(_docs_df(spark, n=20, offset=100))  # snapshot 2 reuses s1 files
    stats = t.expire_snapshots(keep_last=1)
    assert stats["snapshots_removed"] == 1
    assert stats["data_files_deleted"] == 0  # every s1 file still reachable
    assert t.read().count() == 40


# ------------------------------------------- 7. streaming -> Iceberg sink


def test_stream_batch_append_idempotent(spark, tmp_path):
    """foreachBatch is at-least-once; the batch-id check in the snapshot
    summary makes appends exactly-once: replaying the same (id, data)
    pair is a no-op."""
    from text_dedup_spark.streaming.iceberg_sink import (
        append_stream_batch,
        committed_stream_batches,
    )

    t = NativeIcebergTable(spark, str(tmp_path / "t"))
    df = _docs_df(spark, n=10)
    assert append_stream_batch(t, df, 0, query_id="q1") is True
    assert append_stream_batch(t, df, 0, query_id="q1") is False  # replay
    assert t.read().count() == 10
    assert len(t.snapshots()) == 1
    assert append_stream_batch(t, _docs_df(spark, n=5, offset=100), 1) is True
    assert t.read().count() == 15
    assert committed_stream_batches(t) == {0, 1}
    assert t.snapshots()[0]["summary"]["streaming-batch-id"] == "0"
    assert t.snapshots()[0]["summary"]["streaming-query-id"] == "q1"


def test_streaming_query_lands_in_iceberg(spark, tmp_path):
    """A real Structured Streaming query (file source, availableNow)
    appends micro-batches to an Iceberg table; a restart over the same
    checkpoint ingests ONLY new files."""
    from text_dedup_spark.streaming.iceberg_sink import start_iceberg_stream

    src = str(tmp_path / "src")
    loc = str(tmp_path / "table")
    ckpt = str(tmp_path / "ckpt")
    _docs_df(spark, n=20).write.mode("overwrite").parquet(src)
    stream = spark.readStream.schema(
        "id long, caption string, lang string").parquet(src)
    q = start_iceberg_stream(stream, loc, ckpt)
    q.awaitTermination(120)
    t = NativeIcebergTable(spark, loc)
    assert t.read().count() == 20
    n_snaps_first = len(t.snapshots())
    assert all("streaming-batch-id" in s["summary"] for s in t.snapshots())

    # second run: one new file -> only its rows are appended
    _docs_df(spark, n=7, offset=1000).coalesce(1).write.mode(
        "append").parquet(src)
    stream2 = spark.readStream.schema(
        "id long, caption string, lang string").parquet(src)
    q2 = start_iceberg_stream(stream2, loc, ckpt)
    q2.awaitTermination(120)
    back = t.read()
    assert back.count() == 27
    assert sorted(r["id"] for r in back.collect()) == (
        list(range(20)) + list(range(1000, 1007)))
    assert len(t.snapshots()) > n_snaps_first


# -------------------------------------------- 8. additive schema evolution


def test_additive_schema_evolution(spark, tmp_path):
    """Appending with a new nullable column evolves the schema: old files
    read back with nulls for it, new field ids never collide with old
    ones (bounds maps key on ids), and time travel reads each snapshot
    with ITS schema."""
    t = NativeIcebergTable(spark, str(tmp_path / "t"))
    t.create(_docs_df(spark, n=10), partition_by=["lang"])
    first_snap = t.snapshots()[0]["snapshot-id"]
    old_ids = {f["id"] for f in t.metadata()["schemas"][0]["fields"]}

    widened = spark.createDataFrame(
        [(100 + i, f"new {i}", "en", float(i)) for i in range(5)],
        "id long, caption string, lang string, quality double")
    t.append(widened)

    md = t.metadata()
    assert len(md["schemas"]) == 2
    assert md["current-schema-id"] == 1
    new_field = next(f for f in md["schemas"][1]["fields"]
                     if f["name"] == "quality")
    assert new_field["id"] not in old_ids and not new_field["required"]

    back = t.read()
    assert back.count() == 15
    rows = {r["id"]: r["quality"] for r in back.collect()}
    assert rows[0] is None and rows[100] == 0.0  # old rows -> null
    # time travel: the first snapshot reads with the ORIGINAL schema
    old = t.read(snapshot_id=first_snap)
    assert "quality" not in old.columns and old.count() == 10
    # further appends under the evolved schema are fine and stable
    t.append(spark.createDataFrame(
        [(200, "x", "fr", 1.5)],
        "id long, caption string, lang string, quality double"))
    assert len(t.metadata()["schemas"]) == 2  # no new schema minted
    assert t.read().count() == 16


def test_schema_evolution_rejects_non_additive(spark, tmp_path):
    t = NativeIcebergTable(spark, str(tmp_path / "t"))
    t.create(_docs_df(spark, n=5))
    with pytest.raises(ValueError, match="missing from the new data"):
        t.append(spark.createDataFrame([(1, "a")], "id long, caption string"))
    with pytest.raises(ValueError, match="type changed"):
        t.append(spark.createDataFrame([(1, "a", 7)],
                                       "id long, caption string, lang int"))


# ------------------------------------------- 9. merge-on-read deletes


def test_position_delete_merge_on_read(spark, tmp_path):
    """v2 position deletes: matching rows' (file_path, row_index) pairs are
    committed under a content=1 manifest; data files are NOT rewritten;
    rows re-appended after the delete survive (sequence-number rule)."""
    t = NativeIcebergTable(spark, str(tmp_path / "t"))
    t.create(_docs_df(spark, n=30), partition_by=["lang"])
    files_before = {e["data_file"]["file_path"] for e in t.scan_files()}
    n = t.delete_where({"lang": "en"}, mode="position")
    assert n == 10
    assert {e["data_file"]["file_path"] for e in t.scan_files()} == files_before
    assert t.read().count() == 20
    assert set(r["lang"] for r in t.read().collect()) == {"fr", "de"}
    assert t.snapshots()[-1]["summary"]["operation"] == "delete"
    # delete files are planned separately and carry content=1
    dels = t.scan_deletes()
    assert len(dels) == 1 and dels[0]["data_file"]["content"] == 1
    # time travel before the delete sees everything
    assert t.read(snapshot_id=t.snapshots()[0]["snapshot-id"]).count() == 30
    # rows appended AFTER the delete survive (data seq > delete seq)
    t.append(_docs_df(spark, n=6, langs=("en",)))
    assert t.read().where("lang = 'en'").count() == 6


def test_equality_delete_merge_on_read(spark, tmp_path):
    """v2 equality deletes: distinct equality tuples with field ids,
    applied to data files STRICTLY before the delete's sequence number."""
    t = NativeIcebergTable(spark, str(tmp_path / "t"))
    t.create(_docs_df(spark, n=30), partition_by=["lang"])
    n = t.delete_where({"lang": "fr"}, mode="equality")
    assert n == 10
    dels = t.scan_deletes()
    assert len(dels) == 1 and dels[0]["data_file"]["content"] == 2
    md = t.metadata()
    lang_id = next(f["id"] for f in md["schemas"][0]["fields"]
                   if f["name"] == "lang")
    assert dels[0]["data_file"]["equality_ids"] == [lang_id]
    assert t.read().count() == 20
    # fr rows appended after the delete survive
    t.append(_docs_df(spark, n=3, offset=500, langs=("fr",)))
    assert t.read().where("lang = 'fr'").count() == 3
    # filters remain exact with deletes in play
    assert t.read(filters={"lang": "fr"}).count() == 3
    assert t.read(filters={"id": ("<", 3)}).count() == 2  # fr id 1 deleted


def test_compact_purges_delete_files(spark, tmp_path):
    t = NativeIcebergTable(spark, str(tmp_path / "t"))
    t.create(_docs_df(spark, n=30), partition_by=["lang"])
    t.delete_where({"lang": "en"}, mode="position")
    t.delete_where({"id": ("<", 2)}, mode="equality")
    expect = {(r["id"], r["lang"]) for r in t.read().collect()}
    t.compact(n_files=1)
    assert t.scan_deletes() == []  # rewritten table needs no delete files
    assert {(r["id"], r["lang"]) for r in t.read().collect()} == expect


def test_mor_modes_agree_with_copy_on_write(spark, tmp_path):
    """All three delete strategies produce identical table contents."""
    results = {}
    for mode in ("copy-on-write", "position", "equality"):
        t = NativeIcebergTable(spark, str(tmp_path / mode))
        t.create(_docs_df(spark, n=40), partition_by=["lang"])
        n = t.delete_where({"lang": "de", "id": ("<", 20)}, mode=mode)
        assert n == 6, (mode, n)  # de rows below 20: ids 2,5,8,11,14,17
        results[mode] = sorted(
            (r["id"], r["caption"], r["lang"]) for r in t.read().collect())
    assert results["position"] == results["copy-on-write"]
    assert results["equality"] == results["copy-on-write"]


# --------------------------------------------- 10. bucket transform


def test_murmur3_spec_vectors():
    """Iceberg spec Appendix B pins the hash variant and serialization:
    int and long 34 hash identically (8-byte LE), 'iceberg' as UTF-8."""
    import numpy as np

    from text_dedup_spark.sources.murmur3 import (
        iceberg_hash,
        murmur3_32,
        murmur3_32_long,
    )

    assert iceberg_hash(34, "int") == 2017239379
    assert iceberg_hash(34, "long") == 2017239379
    assert iceberg_hash("iceberg", "string") == 1210000089
    # vectorized long path == scalar reference on edge values
    import struct as _s

    vals = np.array([0, 34, -1, 2**62, -(2**62), 123456789], dtype=np.int64)
    assert list(murmur3_32_long(vals)) == [
        murmur3_32(_s.pack("<q", int(v))) for v in vals]


def test_bucket_transform_write_prune_read(spark, tmp_path):
    from text_dedup_spark.sources.murmur3 import iceberg_bucket

    t = NativeIcebergTable(spark, str(tmp_path / "t"))
    df = _docs_df(spark, n=60)
    t.create(df, partition_by=["lang", "bucket(8, id)"])
    back = t.read()
    assert back.schema == df.schema  # bucket source column stays in files
    assert sorted(r["id"] for r in back.collect()) == list(range(60))
    spec = t.metadata()["partition-specs"][0]["fields"]
    assert [(f["name"], f["transform"]) for f in spec] == [
        ("lang", "identity"), ("id_bucket", "bucket[8]")]
    # point lookup prunes to the one bucket (and = filter stays exact)
    all_e = t.scan_files()
    one = t.scan_files(filters={"id": 34})
    assert 0 < len(one) < len(all_e)
    b34 = iceberg_bucket(34, "long", 8)
    assert all(e["data_file"]["partition"]["id_bucket"] == b34 for e in one)
    got = t.read(filters={"id": 34})
    assert [r["id"] for r in got.collect()] == [34]
    # in-filter translates to a bucket set; range ops don't prune buckets
    got2 = t.read(filters={"id": ("in", [3, 34, 9999])})
    assert sorted(r["id"] for r in got2.collect()) == [3, 34]
    assert t.read(filters={"id": ("<", 10)}).count() == 10
    # appends inherit the spec; MOR deletes compose with bucketing
    t.append(_docs_df(spark, n=6, offset=1000))
    assert t.read().count() == 66
    assert t.delete_where({"id": ("<", 5)}, mode="position") == 5
    assert t.read().count() == 61


def test_catalog_write_bucketed_is_real_bucket_spec(spark, tmp_path):
    cat = NativeIcebergCatalog(spark, str(tmp_path / "wh"))
    cat.write_bucketed(_docs_df(spark, n=40), "t", "id", n_buckets=4)
    t = NativeIcebergTable(spark, cat.path("t"))
    spec = t.metadata()["partition-specs"][0]["fields"]
    assert spec[0]["transform"] == "bucket[4]"
    assert cat.read_bucketed("t").count() == 40
    assert not cat.is_bucketed("t")  # no exchange-free join contract claimed


# ------------------------------------------------ incremental append scan


def test_incremental_read_returns_only_the_delta(spark, tmp_path):
    t = NativeIcebergTable(spark, str(tmp_path / "t"))
    t.create(_docs_df(spark, n=10), partition_by=["lang"])
    s1 = t.current_snapshot()["snapshot-id"]
    t.append(_docs_df(spark, n=5, offset=100))
    s2 = t.current_snapshot()["snapshot-id"]
    t.append(_docs_df(spark, n=5, offset=200))
    # (s1, current]: the two appends, not the initial 10
    got = sorted(r["id"] for r in t.read_incremental(s1).collect())
    assert got == list(range(100, 105)) + list(range(200, 205))
    # (s1, s2]: just the middle append
    got2 = sorted(r["id"] for r in t.read_incremental(s1, s2).collect())
    assert got2 == list(range(100, 105))
    # from None = since table creation = full append history
    assert t.read_incremental(None).count() == 20
    # empty range
    cur = t.current_snapshot()["snapshot-id"]
    assert t.read_incremental(cur).count() == 0


def test_incremental_read_prunes_and_filters(spark, tmp_path):
    t = NativeIcebergTable(spark, str(tmp_path / "t"))
    t.create(_docs_df(spark, n=9), partition_by=["lang"])
    s1 = t.current_snapshot()["snapshot-id"]
    t.append(_docs_df(spark, n=9, offset=100))
    # partition filter prunes at plan time; residual filter stays exact
    got = t.read_incremental(s1, filters={"lang": "en", "id": ("<", 104)})
    rows = sorted(r["id"] for r in got.collect())
    assert rows == [100, 103]  # en rows below 104 in the delta only


def test_incremental_read_skips_replace_raises_on_overwrite(spark, tmp_path):
    t = NativeIcebergTable(spark, str(tmp_path / "t"))
    t.create(_docs_df(spark, n=4, langs=("en",)))
    s1 = t.current_snapshot()["snapshot-id"]
    for i in range(1, 4):
        t.append(_docs_df(spark, n=1, offset=10 * i, langs=("en",)))
    t.compact(n_files=1)  # REPLACE snapshot: same rows, new layout
    t.append(_docs_df(spark, n=1, offset=999, langs=("en",)))
    # the compaction is skipped: delta = the three 1-row appends + post-
    # compact append, with no double-read of rewritten rows
    got = sorted(r["id"] for r in t.read_incremental(s1).collect())
    assert got == [10, 20, 30, 999]
    # full read still sees everything once
    assert t.read().count() == 8
    # overwrite/delete in range cannot be represented as appended rows
    t.overwrite(_docs_df(spark, n=2, offset=500, langs=("en",)))
    with pytest.raises(ValueError, match="non-append"):
        t.read_incremental(s1)
    with pytest.raises(ValueError, match="not an ancestor"):
        t.read_incremental(123456789)


def test_incremental_read_catalog_checkpoint_loop(spark, tmp_path):
    """The stage-B consumption pattern: fold deltas, checkpoint the
    snapshot id, never rescan history."""
    cat = NativeIcebergCatalog(spark, str(tmp_path / "wh"))
    cat.append(_docs_df(spark, n=6), "docs")
    seen: list[int] = []
    mark = None
    for batch in range(3):
        delta = cat.read_incremental("docs", mark)
        seen.extend(r["id"] for r in delta.collect())
        mark = cat.current_snapshot_id("docs")
        cat.append(_docs_df(spark, n=2, offset=1000 + 10 * batch), "docs")
    # every row consumed exactly once across the loop
    delta = cat.read_incremental("docs", mark)
    seen.extend(r["id"] for r in delta.collect())
    assert sorted(seen) == sorted(
        list(range(6)) + [1000, 1001, 1010, 1011, 1020, 1021])
    assert len(seen) == len(set(seen))


# ------------------------------------------- truncate + temporal transforms


def test_truncate_transform_write_prune_read(spark, tmp_path):
    t = NativeIcebergTable(spark, str(tmp_path / "t"))
    df = _docs_df(spark, n=60)
    t.create(df, partition_by=["truncate(20, id)"])
    back = t.read()
    assert back.schema == df.schema  # source column stays in the files
    assert sorted(r["id"] for r in back.collect()) == list(range(60))
    spec = t.metadata()["partition-specs"][0]["fields"]
    assert [(f["name"], f["transform"]) for f in spec] == [
        ("id_trunc", "truncate[20]")]
    # truncate is order-preserving: range filters prune files
    all_e = t.scan_files()
    lo = t.scan_files(filters={"id": ("<", 15)})
    assert 0 < len(lo) < len(all_e)
    assert all(e["data_file"]["partition"]["id_trunc"] == 0 for e in lo)
    assert sorted(r["id"] for r in
                  t.read(filters={"id": ("<", 15)}).collect()) == list(range(15))
    assert t.read(filters={"id": (">=", 41)}).count() == 19
    assert [r["id"] for r in t.read(filters={"id": 34}).collect()] == [34]


def test_truncate_string_transform(spark, tmp_path):
    t = NativeIcebergTable(spark, str(tmp_path / "t"))
    rows = [(i, w) for i, w in enumerate(
        ["alpha", "alert", "beta", "bet", "gamma", "go", "", "zz"])]
    df = spark.createDataFrame(rows, "id long, word string")
    t.create(df, partition_by=["truncate(2, word)"])
    got = sorted((r["id"], r["word"]) for r in t.read().collect())
    assert got == sorted(rows)  # incl. the empty string round-tripping
    pruned = t.scan_files(filters={"word": "bet"})
    assert 0 < len(pruned) < len(t.scan_files())
    assert all(e["data_file"]["partition"]["word_trunc"] == "be"
               for e in pruned)
    assert sorted(r["word"] for r in
                  t.read(filters={"word": ("in", ["bet", "go"])}).collect()
                  ) == ["bet", "go"]
    # empty-string bound: pruning is skipped, result still exact
    assert [r["id"] for r in t.read(filters={"word": ""}).collect()] == [6]


def test_temporal_transforms_write_prune_read(spark, tmp_path):
    import datetime as dt

    t = NativeIcebergTable(spark, str(tmp_path / "t"))
    days = [dt.date(2023, 1, 1) + dt.timedelta(days=30 * i) for i in range(14)]
    df = spark.createDataFrame(
        [(i, d) for i, d in enumerate(days)], "id long, d date")
    t.create(df, partition_by=["month(d)"])
    spec = t.metadata()["partition-specs"][0]["fields"]
    assert [(f["name"], f["transform"]) for f in spec] == [("d_month", "month")]
    # spec ordinal: months since 1970-01 (2023-01 -> 636)
    e = t.scan_files(filters={"d": dt.date(2023, 1, 15)})
    assert len(e) > 0
    assert all(x["data_file"]["partition"]["d_month"] == 636 for x in e)
    got = t.read(filters={"d": ("<", dt.date(2023, 3, 1))})
    assert sorted(r["id"] for r in got.collect()) == [0, 1]  # jan 1, jan 31
    assert 0 < len(t.scan_files(filters={"d": ("<", dt.date(2023, 3, 1))})) \
        < len(t.scan_files())
    # day transform on a date column: ordinal = days since epoch
    t2 = NativeIcebergTable(spark, str(tmp_path / "t2"))
    t2.create(df, partition_by=["day(d)"])
    e2 = t2.scan_files(filters={"d": dt.date(2023, 1, 1)})
    assert all(x["data_file"]["partition"]["d_day"] == 19358 for x in e2)
    assert t2.read(filters={"d": dt.date(2023, 1, 31)}).count() == 1
    # year on dates
    t3 = NativeIcebergTable(spark, str(tmp_path / "t3"))
    t3.create(df, partition_by=["year(d)"])
    assert {x["data_file"]["partition"]["d_year"]
            for x in t3.scan_files()} == {53, 54}  # 2023, 2024
    assert t3.read(filters={"d": (">=", dt.date(2024, 1, 1))}).count() == \
        sum(d >= dt.date(2024, 1, 1) for d in days)


def test_hour_transform_on_timestamps(spark, tmp_path):
    import datetime as dt

    tz = dt.timezone.utc
    base = dt.datetime(2023, 5, 1, 0, 30, tzinfo=tz)
    stamps = [base + dt.timedelta(minutes=45 * i) for i in range(8)]
    df = spark.createDataFrame(
        [(i, s) for i, s in enumerate(stamps)], "id long, ts timestamp")
    t = NativeIcebergTable(spark, str(tmp_path / "t"))
    t.create(df, partition_by=["hour(ts)"])
    # hour ordinal is epoch-based, timezone-independent
    expect0 = int(base.timestamp() // 3600)
    assert expect0 in {x["data_file"]["partition"]["ts_hour"]
                       for x in t.scan_files()}
    # tz-AWARE bound prunes; read-back rows match a plain filter
    got = t.read(filters={"ts": ("<", base + dt.timedelta(hours=2))})
    assert got.count() == sum(
        s < base + dt.timedelta(hours=2) for s in stamps)
    assert 0 < len(t.scan_files(
        filters={"ts": ("<", base + dt.timedelta(hours=2))})) \
        < len(t.scan_files())
    # naive bound: pruning skipped (plan keeps all files), read exact
    naive = dt.datetime(2023, 5, 1, 2, 30)
    assert len(t.scan_files(filters={"ts": ("<", naive)})) == \
        len(t.scan_files())
    # timestamp year/month are rejected (session-tz-dependent)
    with pytest.raises(ValueError, match="unsupported"):
        NativeIcebergTable(spark, str(tmp_path / "bad")).create(
            df, partition_by=["month(ts)"])


# ------------------------------------------------ optimistic multi-writer


def test_concurrent_appends_all_land(spark, tmp_path):
    """Six writers race one table: every append must land exactly once
    (CAS on the metadata version + append rebase-and-retry)."""
    import threading

    loc = str(tmp_path / "t")
    NativeIcebergTable(spark, loc).create(_docs_df(spark, n=1, offset=9000))
    barrier = threading.Barrier(6)
    errs: list[Exception] = []

    def _writer(i: int):
        try:
            t = NativeIcebergTable(spark, loc)  # independent handle
            df = _docs_df(spark, n=1, offset=i)
            barrier.wait()
            t.append(df)
        except Exception as e:  # noqa: BLE001 - collected for the assert
            errs.append(e)

    threads = [threading.Thread(target=_writer, args=(i,)) for i in range(6)]
    for th in threads:
        th.start()
    for th in threads:
        th.join()
    assert errs == []
    t = NativeIcebergTable(spark, loc)
    assert sorted(r["id"] for r in t.read().collect()) == [0, 1, 2, 3, 4, 5, 9000]
    assert len(t.snapshots()) == 7
    # history is a single linear parent chain (each rebase re-parented)
    assert len(t.snapshots_between(None)) == 7
    # incremental consumers see every append exactly once
    first = t.snapshots_between(None)[0]["snapshot-id"]
    assert sorted(r["id"] for r in t.read_incremental(first).collect()) == \
        [0, 1, 2, 3, 4, 5]


def test_append_rebases_after_losing_cas(spark, tmp_path):
    from text_dedup_spark.sources.iceberg import CommitConflict

    loc = str(tmp_path / "t")
    t = NativeIcebergTable(spark, loc)
    t.create(_docs_df(spark, n=2))
    other = NativeIcebergTable(spark, loc)
    # deterministically lose the race: another commit lands between this
    # append's manifest write and its CAS
    t._commit(_docs_df(spark, n=1, offset=50), None, "append",
              _test_pre_cas=lambda: other.append(_docs_df(spark, n=1, offset=60)))
    got = sorted(r["id"] for r in t.read().collect())
    assert got == [0, 1, 50, 60]
    # non-append operations surface the conflict instead of rebasing
    with pytest.raises(CommitConflict, match="overwrite"):
        t._commit(_docs_df(spark, n=1, offset=70), None, "overwrite",
                  _test_pre_cas=lambda: other.append(
                      _docs_df(spark, n=1, offset=80)))


def test_version_hint_is_advisory(spark, tmp_path):
    """A writer crashing between the metadata CAS and the hint update (or
    losing the hint race) must not hide its commit: readers probe forward."""
    loc = str(tmp_path / "t")
    t = NativeIcebergTable(spark, loc)
    t.create(_docs_df(spark, n=1))
    t.append(_docs_df(spark, n=1, offset=10))
    v = t.current_version()
    with open(t._hint_path(), "w") as f:
        f.write("1")  # stale hint
    assert NativeIcebergTable(spark, loc).current_version() == v
    assert NativeIcebergTable(spark, loc).read().count() == 2


# --------------------------------------- metadata tables + orphan cleanup


def test_metadata_tables(spark, tmp_path):
    t = NativeIcebergTable(spark, str(tmp_path / "t"))
    t.create(_docs_df(spark, n=30), partition_by=["lang"])
    t.append(_docs_df(spark, n=10, offset=100))
    snaps = t.snapshots_df().orderBy("sequence_number").collect()
    assert [s["operation"] for s in snaps] == ["append", "append"]
    assert snaps[0]["parent_id"] is None
    assert snaps[1]["parent_id"] == snaps[0]["snapshot_id"]
    hist = t.history_df().collect()
    assert len(hist) == 2 and all(h["is_current_ancestor"] for h in hist)
    files = t.files_df().collect()
    assert sum(f["record_count"] for f in files) == 40
    assert all(f["file_format"] == "PARQUET" and "lang" in f["partition"]
               for f in files)
    parts = {tuple(sorted(p["partition"].items())): p["record_count"]
             for p in t.partitions_df().collect()}
    assert sum(parts.values()) == 40
    assert parts[(("lang", "en"),)] == 14  # 10 of 30 + 4 of 10
    # time travel: files of snapshot 1 only
    f1 = t.files_df(snapshot_id=snaps[0]["snapshot_id"])
    assert sum(f["record_count"] for f in f1.collect()) == 30


def test_remove_orphan_files(spark, tmp_path):
    import glob

    loc = str(tmp_path / "t")
    t = NativeIcebergTable(spark, loc)
    t.create(_docs_df(spark, n=4))
    other = NativeIcebergTable(spark, loc)
    # a CAS-losing append leaves its first-attempt manifest orphaned
    t._commit(_docs_df(spark, n=1, offset=50), None, "append",
              _test_pre_cas=lambda: other.append(_docs_df(spark, n=1, offset=60)))
    # plus simulated crashed-writer debris in data/
    debris = os.path.join(loc, "data", "s99999-deadbeef")
    os.makedirs(debris)
    with open(os.path.join(debris, "part-00000.parquet"), "wb") as f:
        f.write(b"not really parquet")
    n_avro_before = len(glob.glob(os.path.join(loc, "metadata", "*.avro")))
    stats = t.remove_orphan_files(older_than_s=0)
    assert stats["data_files_deleted"] >= 1  # the debris
    assert stats["metadata_files_deleted"] >= 1  # the losing manifest
    assert not os.path.exists(os.path.join(debris, "part-00000.parquet"))
    assert len(glob.glob(os.path.join(loc, "metadata", "*.avro"))) \
        < n_avro_before
    # every snapshot still fully readable afterwards (incl. time travel)
    assert sorted(r["id"] for r in t.read().collect()) == [0, 1, 2, 3, 50, 60]
    for s in t.snapshots():
        t.read(snapshot_id=s["snapshot-id"]).count()
    # idempotent
    again = t.remove_orphan_files(older_than_s=0)
    assert again == {"data_files_deleted": 0, "metadata_files_deleted": 0}


def test_cli_snapshot_incremental_dedup(spark, tmp_path, capsys):
    """The snapshot-checkpointed CLI loop: hash --append_bands_to feeds ONE
    growing Iceberg bands table; dedup --from_snapshot folds only the delta
    each run (printing the consumed watermark); final clusters are
    byte-identical to a one-shot dedup over both datasets."""
    from tests.conftest import synth_corpus
    from text_dedup_spark import cli

    corpus = synth_corpus(80, seed=9)
    half = len(corpus) // 2
    paths = []
    for i, part in enumerate((corpus[:half], corpus[half:])):
        p = str(tmp_path / f"corpus{i}")
        spark.createDataFrame(
            part, "doc_id long, text string"
        ).write.mode("overwrite").parquet(p)
        paths.append(p)

    ckpt = str(tmp_path / "ckpt")
    common = ["--column", "text", "--ngram_size", "3", "--num_perm", "16",
              "--threshold", "0.7", "--checkpoint_dir", ckpt,
              "--checkpoint_format", "iceberg"]
    mark = "begin"
    for i, p in enumerate(paths):
        start = ["--start_id", "100000"] if i else []
        cli.main(["hash", "--input", p, "--dataset", f"d{i}",
                  "--append_bands_to", "bands", *start, *common])
        cli.main(["dedup", "--checkpoint_dir", ckpt,
                  "--checkpoint_format", "iceberg",
                  "--from_snapshot", mark])
        out = capsys.readouterr().out
        mark = out.rsplit("consumed_to_snapshot=", 1)[1].split()[0]
    cat = NativeIcebergCatalog(spark, ckpt)
    inc = {(r["__id__"], r["component"])
           for r in cat.read("clusters").collect()}
    cli.main(["dedup", "--checkpoint_dir", ckpt,
              "--checkpoint_format", "iceberg",
              "--datasets", "d0", "d1"])
    full = {(r["__id__"], r["component"])
            for r in cat.read("clusters").collect()}
    assert inc == full and len(inc) > 0
    # guard rails
    with pytest.raises(SystemExit, match="cannot be combined"):
        cli.main(["dedup", "--checkpoint_dir", ckpt,
                  "--checkpoint_format", "iceberg",
                  "--from_snapshot", "begin", "--datasets", "d0"])
    with pytest.raises(SystemExit, match="iceberg"):
        cli.main(["dedup", "--checkpoint_dir", str(tmp_path / "pq"),
                  "--from_snapshot", "begin"])
