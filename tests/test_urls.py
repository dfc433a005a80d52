"""URL canonicalization + URL dedup."""

from pyspark.sql import functions as F

from text_dedup_spark.operators.urls import canonical_url_expr, domain_expr, url_dedup


def _canon(spark, urls):
    df = spark.createDataFrame([(u,) for u in urls], "u string")
    return [r["c"] for r in df.select(canonical_url_expr(F.col("u")).alias("c")).collect()]


def test_canonical_url_rules(spark):
    cases = {
        # fragment + default port + www + scheme/host case
        "HTTP://WWW.Example.COM:80/Path/X?q=1#frag": "http://example.com/Path/X?q=1",
        "https://Example.com:443/": "https://example.com/",
        "https://example.com:8443/a": "https://example.com:8443/a",  # non-default kept
        # tracking params: leading / middle / trailing / only
        "http://e.com/p?utm_source=x&id=2": "http://e.com/p?id=2",
        "http://e.com/p?id=2&utm_source=x": "http://e.com/p?id=2",
        "http://e.com/p?a=1&gclid=g&b=2": "http://e.com/p?a=1&b=2",
        "http://e.com/p?fbclid=f": "http://e.com/p",
        "http://e.com/p?utm_a=1&utm_b=2&x=3": "http://e.com/p?x=3",
        # empty path
        "http://e.com": "http://e.com/",
        "http://e.com#top": "http://e.com/",
        # non-URL passes through untouched
        "not a url at all": "not a url at all",
        "mailto:x@e.com": "mailto:x@e.com",
    }
    got = _canon(spark, list(cases))
    assert got == list(cases.values())


def test_domain_and_url_dedup(spark):
    df = spark.createDataFrame(
        [
            (1, "http://www.E.com/a?utm_source=x"),
            (2, "http://e.com:80/a"),          # same canonical as 1
            (3, "http://e.com/b"),
            (4, "https://other.org/a"),
            (5, "HTTP://E.COM/a#z"),           # same canonical as 1/2
        ],
        "doc_id long, url string",
    )
    doms = {r["doc_id"]: r["d"] for r in df.select(
        "doc_id", domain_expr(F.col("url")).alias("d")).collect()}
    assert doms == {1: "e.com", 2: "e.com", 3: "e.com", 4: "other.org", 5: "e.com"}
    assigns = {r["doc_id"]: r["component"] for r in url_dedup(df, "url", "doc_id").collect()}
    assert assigns == {2: 1, 5: 1}  # roots absent, min id survives
