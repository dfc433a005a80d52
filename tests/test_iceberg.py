"""IcebergCatalog integration — gated on the iceberg-spark runtime jar.

The sandbox image carries no Iceberg jar and no network, so this module
SKIPS there; on any Iceberg-enabled cluster (the production target — the
north rule's storage layer) it runs a full write/append/read/read_many/
exists round trip against a local Hadoop catalog, closing the S2 contract.
"""

from __future__ import annotations

import glob
import os

import pytest


def _iceberg_jar() -> str | None:
    import pyspark

    roots = [
        os.path.join(os.path.dirname(pyspark.__file__), "jars"),
        os.environ.get("SPARK_HOME", ""),
        os.environ.get("ICEBERG_JAR_DIR", ""),
    ]
    for root in filter(None, roots):
        hits = glob.glob(os.path.join(root, "**", "iceberg-spark-runtime*.jar"),
                         recursive=True)
        if hits:
            return hits[0]
    return None


_JAR = _iceberg_jar()
pytestmark = pytest.mark.skipif(
    _JAR is None,
    reason="iceberg-spark-runtime jar not on the classpath (sandbox has no "
    "network to fetch it); runs on Iceberg-enabled clusters",
)


@pytest.fixture(scope="module")
def iceberg_spark(tmp_path_factory):
    from pyspark.sql import SparkSession

    wh = str(tmp_path_factory.mktemp("iceberg_wh"))
    spark = (
        SparkSession.builder.master("local[4]")
        .appName("iceberg-it")
        .config("spark.jars", _JAR)
        .config(
            "spark.sql.extensions",
            "org.apache.iceberg.spark.extensions.IcebergSparkSessionExtensions",
        )
        .config("spark.sql.catalog.it", "org.apache.iceberg.spark.SparkCatalog")
        .config("spark.sql.catalog.it.type", "hadoop")
        .config("spark.sql.catalog.it.warehouse", wh)
        .getOrCreate()
    )
    yield spark
    spark.stop()


def test_iceberg_catalog_round_trip(iceberg_spark):
    from text_dedup_spark.sources.catalog import IcebergCatalog

    spark = iceberg_spark
    spark.sql("CREATE NAMESPACE IF NOT EXISTS it.dedup")
    cat = IcebergCatalog(spark, "it.dedup")

    df = spark.createDataFrame(
        [(1, "a", 10), (2, "b", 20)], "id long, ds string, band int"
    )
    assert not cat.exists("bands")
    cat.write(df, "bands", partition_by=["band"])
    assert cat.exists("bands")
    assert cat.read("bands").count() == 2

    cat.append(spark.createDataFrame([(3, "c", 10)], "id long, ds string, band int"),
               "bands")
    assert cat.read("bands").count() == 3

    cat.write(df.where("id = 1"), "other")
    merged = cat.read_many(["bands", "other"])
    assert merged.count() == 4

    # createOrReplace is idempotent (the staged pipeline's resume contract)
    cat.write(df, "bands")
    assert cat.read("bands").count() == 2
