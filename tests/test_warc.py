"""WARC / WET ingestion tests.

The reference's deployment target is Common-Crawl-scale text (reference
README.md "on 600 GB text(CC dedup ready)"); these tests pin the archive
parser, the HTTP/HTML text extraction, the error contract, and the
Spark-side `read_warc` end-to-end path against spec-shaped fixtures built
with the module's own deterministic writer.
"""

import gzip

import pytest

from text_dedup_spark.sources.warc import (
    WARC_SCHEMA,
    build_warc,
    build_warc_record,
    extract_text,
    http_response_payload,
    iter_warc_records,
    read_warc,
)


def _sample_records():
    return [
        build_warc_record(
            "warcinfo", b"software: test\r\n", "info-0", content_type="application/warc-fields"
        ),
        build_warc_record(
            "conversion",
            "Plain WET text.\nSecond line.".encode(),
            "conv-1",
            target_uri="http://a.example/page",
            content_type="text/plain",
        ),
        build_warc_record(
            "response",
            http_response_payload(
                b"<html><head><script>var x=1;</script><style>p{}</style></head>"
                b"<body><h1>Title &amp; More</h1><p>Body  text</p></body></html>"
            ),
            "resp-2",
            target_uri="http://b.example/",
            content_type="application/http; msgtype=response",
        ),
        build_warc_record("request", b"GET / HTTP/1.1\r\n\r\n", "req-3"),
    ]


# ---------------------------------------------------------------- kernel


@pytest.mark.parametrize("gz", [False, True])
def test_iter_records_round_trip(gz):
    recs = _sample_records()
    data = build_warc(recs, gzip_per_record=gz)
    parsed = list(iter_warc_records(data))
    assert [f["warc-type"] for f, _ in parsed] == [
        "warcinfo",
        "conversion",
        "response",
        "request",
    ]
    # Content-Length is honored exactly: conversion payload round-trips
    assert parsed[1][1] == "Plain WET text.\nSecond line.".encode()


def test_iter_records_single_member_gzip():
    # one gzip member wrapping the whole archive (wget-style), not per-record
    data = gzip.compress(build_warc(_sample_records(), gzip_per_record=False))
    assert len(list(iter_warc_records(data))) == 4


def test_extract_text_conversion_and_response():
    recs = _sample_records()
    parsed = list(iter_warc_records(build_warc(recs)))
    assert extract_text(*parsed[0]) is None  # warcinfo: no text
    assert extract_text(*parsed[1]) == "Plain WET text.\nSecond line."
    html_text = extract_text(*parsed[2])
    assert "Title & More" in html_text  # entity unescaped
    assert "Body text" in html_text  # whitespace collapsed
    assert "script" not in html_text and "var x" not in html_text
    assert extract_text(*parsed[3]) is None  # request: no text


def test_extract_text_non_html_response_passthrough():
    rec = build_warc_record(
        "response", http_response_payload(b"raw plain body", "text/plain"), "r"
    )
    fields, payload = next(iter_warc_records(rec))
    assert extract_text(fields, payload) == "raw plain body"


def test_extract_text_cap_bounds_memory():
    body = b"A" * 100
    rec = build_warc_record("conversion", body, "c")
    fields, payload = next(iter_warc_records(rec))
    assert extract_text(fields, payload, max_text_bytes=10) == "A" * 10


# ----------------------------------------------------------- error contract


def test_truncated_payload_raises():
    rec = build_warc_record("conversion", b"full payload", "c")
    with pytest.raises(ValueError, match="truncated"):
        list(iter_warc_records(rec[:-10]))


def test_missing_content_length_raises():
    bad = b"WARC/1.0\r\nWARC-Type: conversion\r\n\r\n\r\nbody"
    with pytest.raises(ValueError, match="Content-Length"):
        list(iter_warc_records(bad))


def test_bad_magic_raises():
    with pytest.raises(ValueError, match="version line"):
        list(iter_warc_records(b"NOT-A-WARC\r\n\r\n"))


def test_empty_archive_raises():
    with pytest.raises(ValueError, match="no WARC records"):
        list(iter_warc_records(b"\r\n\r\n"))


def test_truncated_gzip_member_raises():
    data = build_warc(_sample_records(), gzip_per_record=True)
    with pytest.raises(ValueError, match="gzip member truncated"):
        list(iter_warc_records(data[: len(data) - 8]))


# ------------------------------------------------------------- spark e2e


def test_read_warc_end_to_end(spark, tmp_path):
    d = tmp_path / "crawl"
    d.mkdir()
    (d / "seg-0.warc.gz").write_bytes(build_warc(_sample_records()))
    (d / "seg-1.warc").write_bytes(
        build_warc(
            [
                build_warc_record(
                    "conversion", b"second archive text", "conv-9",
                    target_uri="http://c.example/",
                )
            ],
            gzip_per_record=False,
        )
    )
    df = read_warc(spark, str(d))
    assert df.schema == WARC_SCHEMA
    rows = {r.record_id: r for r in df.collect()}
    # only text-bearing records survive: 2 from seg-0 + 1 from seg-1
    assert set(rows) == {"<conv-1>", "<resp-2>", "<conv-9>"}
    assert rows["<conv-1>"].text == "Plain WET text.\nSecond line."
    assert rows["<conv-1>"].warc_type == "conversion"
    assert rows["<conv-9>"].target_uri == "http://c.example/"
    assert rows["<resp-2>"].file.endswith("seg-0.warc.gz")


def test_read_input_warc_feeds_dedup_surface(spark, tmp_path):
    from text_dedup_spark.operators.exact import exact_dedup
    from text_dedup_spark.sources.text import read_input

    d = tmp_path / "crawl"
    d.mkdir()
    recs = [
        build_warc_record("conversion", b"alpha beta gamma", "a"),
        build_warc_record("conversion", b"alpha beta gamma", "b"),  # exact dup
        build_warc_record("conversion", b"delta epsilon", "c"),
    ]
    (d / "x.warc.gz").write_bytes(build_warc(recs))
    df = read_input(spark, str(d), fmt="warc")
    kept = exact_dedup(df, "text", "record_id")
    assert kept.count() == 2
