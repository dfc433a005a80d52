"""Bucketed checkpoint tables: co-located joins with zero exchange.

The scale claim under test: once the id-stamped corpus snapshot and the
cluster table are written hash-bucketed on id (ParquetCatalog.write_bucketed),
every later same-key join/agg — in particular stage C's survivor split —
runs with NO shuffle of the wide corpus rows. At 100 TB that is the
difference between re-shuffling payload bytes on every remove run (the
reference's behavior, minhash_spark_onlyRemove.py) and paying the shuffle
once at write time.
"""

import pytest
from pyspark.sql import functions as F

from text_dedup_spark.operators.apply import split_survivors
from text_dedup_spark.operators.ids import ID
from text_dedup_spark.sources.catalog import ParquetCatalog


def formatted_plan(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


@pytest.fixture()
def no_broadcast(spark):
    """Force shuffle-vs-bucketed comparison: with the default 10 MB
    threshold these tiny frames would broadcast and the plan would prove
    nothing about co-location."""
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    yield
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_bucketed_join_has_no_exchange(spark, tmp_path, no_broadcast):
    cat = ParquetCatalog(spark, str(tmp_path))
    a = spark.range(0, 5000).withColumn("x", F.col("id") * 2)
    b = spark.range(0, 5000, 3).withColumn("y", F.col("id") % 7)
    cat.write_bucketed(a, "ta", "id", n_buckets=4)
    cat.write_bucketed(b, "tb", "id", n_buckets=4)

    j = cat.read_bucketed("ta").join(cat.read_bucketed("tb"), "id")
    plan = formatted_plan(j)
    assert "Exchange" not in plan
    assert j.count() == b.count()

    # same key un-bucketed -> the shuffle the bucketing removed
    cat.write(a, "ua")
    cat.write(b, "ub")
    plain = cat.read("ua").join(cat.read("ub"), "id")
    assert "Exchange" in formatted_plan(plain)
    assert sorted(r["id"] for r in j.collect()) == sorted(
        r["id"] for r in plain.collect()
    )


def test_bucketed_groupby_has_no_exchange(spark, tmp_path, no_broadcast):
    cat = ParquetCatalog(spark, str(tmp_path))
    df = spark.range(0, 2000).withColumn("x", F.col("id") % 11)
    cat.write_bucketed(df, "t", "id", n_buckets=4)
    agg = cat.read_bucketed("t").groupBy("id").agg(F.sum("x").alias("sx"))
    assert "Exchange" not in formatted_plan(agg)
    assert agg.count() == 2000


def test_resume_reregisters_from_sidecar(spark, tmp_path, no_broadcast):
    """A fresh session's metastore knows nothing about the checkpoint;
    read_bucketed must rebuild the table from the sidecar spec and the plan
    must STILL be exchange-free (a plain parquet read would silently drop
    the bucketing). Simulated by dropping the table metadata — external
    tables keep their files."""
    cat = ParquetCatalog(spark, str(tmp_path))
    a = spark.range(0, 1000).withColumn("x", F.col("id") + 1)
    b = spark.range(0, 1000, 2).withColumn("y", F.col("id") + 2)
    cat.write_bucketed(a, "ta", "id", n_buckets=4)
    cat.write_bucketed(b, "tb", "id", n_buckets=4)

    spark.sql(f"DROP TABLE {cat._table('ta')}")
    spark.sql(f"DROP TABLE {cat._table('tb')}")
    assert cat.is_bucketed("ta") and cat.exists("ta")  # files survived

    j = cat.read_bucketed("ta").join(cat.read_bucketed("tb"), "id")
    assert "Exchange" not in formatted_plan(j)
    assert j.count() == 500


def test_two_catalogs_do_not_collide(spark, tmp_path):
    c1 = ParquetCatalog(spark, str(tmp_path / "one"))
    c2 = ParquetCatalog(spark, str(tmp_path / "two"))
    c1.write_bucketed(spark.range(0, 10), "t", "id", n_buckets=2)
    c2.write_bucketed(spark.range(0, 20), "t", "id", n_buckets=2)
    assert c1.read_bucketed("t").count() == 10
    assert c2.read_bucketed("t").count() == 20


def test_staged_pipeline_bucketed_split_is_exchange_free(
    spark, tmp_path, no_broadcast
):
    """End-to-end: run the 3-stage pipeline with bucket_by_id and assert
    (a) identical kept/removed results vs the un-bucketed run, and (b) the
    stage-C survivor-split joins over the bucketed checkpoints plan with
    zero exchange on the corpus side."""
    from tests.conftest import synth_corpus

    from text_dedup_spark.config import MinHashConfig
    from text_dedup_spark.plans.staged import run_staged, withid_name

    rows = synth_corpus(120)
    df = spark.createDataFrame(rows, ["doc_id", "text"]).repartition(4)
    cfg = MinHashConfig(num_perm=32)

    cat_b = ParquetCatalog(spark, str(tmp_path / "bucketed"))
    cat_p = ParquetCatalog(spark, str(tmp_path / "plain"))
    res_b = run_staged(cat_b, {"ds": df}, "text", cfg, bucket_by_id=4)
    res_p = run_staged(cat_p, {"ds": df}, "text", cfg)
    assert res_b == res_p

    kept_b = {r[ID] for r in cat_b.read("ds__kept").select(ID).collect()}
    kept_p = {r[ID] for r in cat_p.read("ds__kept").select(ID).collect()}
    assert kept_b == kept_p

    corpus = cat_b.read_bucketed(withid_name("ds"))
    clusters = cat_b.read_bucketed("clusters")
    kept, removed = split_survivors(corpus, clusters, ID)
    assert "Exchange" not in formatted_plan(kept)
    assert "Exchange" not in formatted_plan(removed)
