"""URL canonicalization + URL-level dedup — the cheapest dedup signal a
web corpus has (Common-Crawl pipelines drop re-fetches of the same page
by canonical URL before any content hashing; pairs with the WARC
``target_uri`` column from ``sources/warc.py``).

Canonical form (documented precisely because dedup keys must be stable
across releases):

1. fragment stripped (``#...``),
2. scheme and host lowercased; path/query case preserved,
3. default ports stripped (``:80`` for http, ``:443`` for https),
4. a leading ``www.`` dropped,
5. tracking parameters removed (``utm_*``, ``fbclid``, ``gclid``),
6. an empty path becomes ``/``.

Strings without a ``scheme://`` prefix pass through unchanged (a
canonicalizer that mangles non-URLs corrupts keys silently).

Everything is Catalyst ``regexp_extract`` / ``regexp_replace`` in the
common Java-regex / RE2 subset — whole-stage codegen, zero shuffle, and
the DuckDB oracle replays the exact same expressions. ``url_dedup`` is
then a groupBy-min on the canonical string: one map-side-combined
shuffle, identical scale shape to exact-hash dedup."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_SCHEME = r"^([A-Za-z][A-Za-z0-9+.-]*)://"
_HOSTPORT = r"^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)"
_REST = r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^#]*)"
_TRACK = r"(utm_[A-Za-z]+|fbclid|gclid)=[^&#]*"


def canonical_url_expr(col: Column) -> Column:
    scheme = F.lower(F.regexp_extract(col, _SCHEME, 1))
    host = F.lower(F.regexp_extract(col, _HOSTPORT, 1))
    host = F.when(scheme == "http", F.regexp_replace(host, ":80$", "")).when(
        scheme == "https", F.regexp_replace(host, ":443$", "")
    ).otherwise(host)
    host = F.regexp_replace(host, r"^www\.", "")
    rest = F.regexp_extract(col, _REST, 1)  # path+query, fragment excluded
    rest = F.regexp_replace(rest, "&" + _TRACK, "")  # non-leading params
    rest = F.regexp_replace(rest, r"\?" + _TRACK + "&", "?")  # leading, more follow
    rest = F.regexp_replace(rest, r"\?" + _TRACK + "$", "")  # leading, last
    rest = F.when(rest == "", F.lit("/")).otherwise(rest)
    return F.when(
        col.rlike(_SCHEME), F.concat(scheme, F.lit("://"), host, rest)
    ).otherwise(col)


def domain_expr(col: Column) -> Column:
    """Lowercased host without port / leading www, '' for non-URLs."""
    host = F.lower(F.regexp_extract(col, _HOSTPORT, 1))
    return F.regexp_replace(F.regexp_replace(host, ":[0-9]+$", ""), r"^www\.", "")


def url_dedup(df: DataFrame, url_col: str, id_col: str) -> DataFrame:
    """Roots-absent assignment table (id_col, component) over canonical-URL
    equality — min id survives; drop-in for split_survivors /
    reassign_survivors."""
    keyed = df.select(
        F.col(id_col), canonical_url_expr(F.col(url_col)).alias("__cu__")
    )
    roots = keyed.groupBy("__cu__").agg(F.min(id_col).alias("component"))
    return (
        keyed.join(roots, "__cu__")
        .where(F.col(id_col) != F.col("component"))
        .select(id_col, "component")
    )
