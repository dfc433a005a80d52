"""WARC / WET ingestion (ISO 28500, the Common-Crawl container format).

Web-scale text corpora — the reference's stated deployment target is
Common-Crawl-sized dedup (reference README.md "on 600 GB text(CC dedup
ready)") — arrive as `.warc.gz` / `.wet.gz` archives: concatenated
records, each usually an independent gzip member so readers can split on
member boundaries. The reference ingests pre-extracted text files; this
module closes the gap upstream of that by parsing the archives
themselves, entirely executor-side:

- ``spark.read.format("binaryFile")`` yields one row per archive —
  parallelism is bounded by file count, which is the natural unit for
  WARC (per-record gzip members are not seekable-splittable without an
  external index; Common Crawl ships ~1 GB segments by the tens of
  thousands, so file-level parallelism saturates any fleet).
- an Arrow-batched ``mapInPandas`` walks records per archive: WARC
  header block (CRLF key: value lines), exact ``Content-Length`` payload,
  CRLF CRLF separator. Handles plain and gzip (single- or multi-member)
  archives via ``zlib`` only.
- payload extraction per record type: ``conversion`` (WET) payloads are
  already text; ``response`` payloads are HTTP messages — status line +
  headers stripped, HTML bodies reduced to visible text with a
  deterministic tag/script/style strip + entity unescape (the level of
  extraction a dedup pipeline needs; not a browser).

The output schema feeds the existing dedup surface directly: ``text``
goes to MinHash/SimHash/suffix exactly like the `documents` table.

Error contract matches the codec seams: ValueError for corrupt archives
(bad magic, malformed header, truncated payload), with low-level crashes
normalized. A `max_text_bytes` cap bounds per-record memory so one
pathological record cannot blow an executor on a 100-TB crawl.
"""

from __future__ import annotations

import html as _html
import re
import zlib
from typing import Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StringType, StructField, StructType

WARC_SCHEMA = StructType(
    [
        StructField("file", StringType(), False),
        StructField("record_id", StringType(), True),
        StructField("warc_type", StringType(), False),
        StructField("target_uri", StringType(), True),
        StructField("warc_date", StringType(), True),
        StructField("content_type", StringType(), True),
        StructField("text", StringType(), False),
    ]
)

_CRLF2 = b"\r\n\r\n"
_TAG_DROP = re.compile(
    r"<(script|style)\b[^>]*>.*?</\1\s*>", re.IGNORECASE | re.DOTALL
)
_TAG = re.compile(r"<[^>]+>")
_WS = re.compile(r"[ \t\r\f\v]+")
_BLANKS = re.compile(r"\n\s*\n+")


def _gunzip_members(data: bytes) -> bytes:
    """Decompress a gzip stream of one or MORE concatenated members
    (per-record-gzipped WARC) into one plain byte string."""
    out = []
    rest = data
    while rest:
        d = zlib.decompressobj(wbits=31)
        out.append(d.decompress(rest))
        out.append(d.flush())
        if not d.eof:
            raise ValueError("gzip member truncated")
        rest = d.unused_data.lstrip(b"\x00")
    return b"".join(out)


def _parse_header(block: bytes) -> dict:
    lines = block.split(b"\r\n")
    if not lines or not lines[0].startswith(b"WARC/"):
        raise ValueError("WARC record missing version line")
    fields: dict[str, str] = {}
    for ln in lines[1:]:
        if not ln:
            continue
        k, sep, v = ln.partition(b":")
        if not sep:
            raise ValueError(f"malformed WARC header line {ln[:40]!r}")
        fields[k.strip().decode("ascii", "replace").lower()] = v.strip().decode(
            "utf-8", "replace"
        )
    return fields


def iter_warc_records(data: bytes) -> Iterator[tuple[dict, bytes]]:
    """WARC archive bytes (plain or gzip, any member layout) -> iterator of
    (header_fields, payload_bytes). Strict on structure, tolerant of
    trailing CRLF padding between records."""
    if data[:2] == b"\x1f\x8b":
        data = _gunzip_members(data)
    pos = 0
    n = len(data)
    saw_record = False
    while pos < n:
        # skip inter-record CRLF padding
        while pos < n and data[pos : pos + 2] == b"\r\n":
            pos += 2
        if pos >= n:
            break
        head_end = data.find(_CRLF2, pos)
        if head_end < 0:
            raise ValueError("WARC header not terminated")
        fields = _parse_header(data[pos:head_end])
        try:
            length = int(fields["content-length"])
        except (KeyError, ValueError) as e:
            raise ValueError("WARC record missing valid Content-Length") from e
        body_at = head_end + 4
        if body_at + length > n:
            raise ValueError("WARC payload truncated")
        yield fields, data[body_at : body_at + length]
        saw_record = True
        pos = body_at + length
    if not saw_record:
        raise ValueError("no WARC records in archive")


def _strip_html(markup: str) -> str:
    txt = _TAG_DROP.sub(" ", markup)
    txt = _TAG.sub(" ", txt)
    txt = _html.unescape(txt)
    txt = _WS.sub(" ", txt)
    return _BLANKS.sub("\n\n", txt).strip()


def extract_text(fields: dict, payload: bytes, max_text_bytes: int = 1 << 20) -> str | None:
    """Record -> plain text, or None when the record carries none
    (warcinfo/request/metadata, non-text responses).

    `conversion` (WET) payloads pass through; `response` payloads get the
    HTTP envelope stripped and, when the body is HTML, a deterministic
    tag strip. Text is capped at `max_text_bytes` BEFORE decode so a
    pathological record bounds per-task memory."""
    wtype = fields.get("warc-type", "")
    if wtype == "conversion":
        return payload[:max_text_bytes].decode("utf-8", "replace").strip()
    if wtype != "response":
        return None
    sep = payload.find(_CRLF2)
    if sep < 0 or not payload[:5].startswith(b"HTTP/"):
        return None  # non-HTTP response payload: nothing to extract
    http_head = payload[:sep].decode("latin-1", "replace").lower()
    body = payload[sep + 4 : sep + 4 + max_text_bytes]
    is_html = "content-type: text/html" in http_head or body[:256].lstrip()[:1] == b"<"
    text = body.decode("utf-8", "replace")
    return (_strip_html(text) if is_html else text.strip()) or None


def read_warc(
    spark: SparkSession,
    paths: str | list[str],
    max_text_bytes: int = 1 << 20,
) -> DataFrame:
    """WARC/WET archives -> one row per text-bearing record.

    Columns: (file, record_id, warc_type, target_uri, warc_date,
    content_type, text). Corrupt archives raise (fail the task — an
    ingest-time archive error should be loud); corrupt INDIVIDUAL records
    cannot exist in WARC (lengths are explicit), so there is no silent
    row drop to account for."""
    if isinstance(paths, str):
        paths = [paths]
    files = spark.read.format("binaryFile").load(paths).select("path", "content")

    def gen(batches):
        import pandas as pd

        for pdf in batches:
            rows = []
            for path, blob in zip(pdf["path"], pdf["content"]):
                for fields, payload in iter_warc_records(bytes(blob)):
                    text = extract_text(fields, payload, max_text_bytes)
                    if text:
                        rows.append(
                            {
                                "file": path,
                                "record_id": fields.get("warc-record-id"),
                                "warc_type": fields["warc-type"],
                                "target_uri": fields.get("warc-target-uri"),
                                "warc_date": fields.get("warc-date"),
                                "content_type": fields.get("content-type"),
                                "text": text,
                            }
                        )
            yield pd.DataFrame(
                rows, columns=[f.name for f in WARC_SCHEMA.fields]
            )

    return files.mapInPandas(gen, WARC_SCHEMA)


# --- fixture writer ----------------------------------------------------------


def build_warc_record(
    warc_type: str,
    payload: bytes,
    record_id: str,
    target_uri: str | None = None,
    date: str = "2024-01-01T00:00:00Z",
    content_type: str | None = None,
) -> bytes:
    """One spec-shaped WARC/1.0 record (fixture writer for tests/synth)."""
    head = [f"WARC/1.0", f"WARC-Type: {warc_type}", f"WARC-Record-ID: <{record_id}>"]
    head.append(f"WARC-Date: {date}")
    if target_uri:
        head.append(f"WARC-Target-URI: {target_uri}")
    if content_type:
        head.append(f"Content-Type: {content_type}")
    head.append(f"Content-Length: {len(payload)}")
    return "\r\n".join(head).encode("ascii") + _CRLF2 + payload + _CRLF2


def build_warc(records: list[bytes], gzip_per_record: bool = True) -> bytes:
    """Records -> archive bytes; per-record gzip members by default (the
    Common-Crawl layout), else one plain concatenation."""
    if not gzip_per_record:
        return b"".join(records)
    out = []
    for r in records:
        c = zlib.compressobj(9, zlib.DEFLATED, 31)
        out.append(c.compress(r) + c.flush())
    return b"".join(out)


def http_response_payload(body: bytes, content_type: str = "text/html") -> bytes:
    """Minimal deterministic HTTP/1.1 envelope for response fixtures."""
    head = (
        f"HTTP/1.1 200 OK\r\nContent-Type: {content_type}\r\n"
        f"Content-Length: {len(body)}\r\n"
    ).encode("ascii")
    return head + b"\r\n" + body
