"""PII redaction: replace emails / IPv4 addresses / SSN-shaped ids /
phone numbers with placeholder tokens, and count per-document hits — the
privacy-hygiene pass a training-data pipeline runs alongside dedup
(C4 strips pages on a blocklist; modern pipelines redact in place so the
surrounding text survives).

Pure Catalyst ``regexp_replace`` / ``regexp_extract_all`` — whole-stage
codegen, zero shuffle, and every pattern stays inside the common
Java-regex / RE2 subset so the DuckDB oracle replays it verbatim
(no lookaround, no backreferences). Patterns are deliberately
conservative: a redactor that over-matches destroys clean text silently,
which is worse at 100 TB than letting an exotic format through — extend
``PII_PATTERNS`` per corpus, the plumbing is format-agnostic."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# ordered: replacements are applied top-down (the placeholder tokens
# contain no digits/@, so later patterns cannot match earlier rewrites)
PII_PATTERNS: tuple[tuple[str, str, str], ...] = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ssn", r"\b\d{3}-\d{2}-\d{4}\b", "<ID>"),
    ("phone", r"\+\d{1,2}-\d{3}-\d{4}\b", "<PHONE>"),
    ("ipv4", r"\b(\d{1,3}\.){3}\d{1,3}\b", "<IP>"),
)


def redact_expr(col: Column) -> Column:
    for _, pat, token in PII_PATTERNS:
        col = F.regexp_replace(col, pat, token)
    return col


def redact_pii(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Per-doc redacted text plus one ``n_<kind>`` count column per
    pattern (counted on the ORIGINAL text) and ``n_pii`` total — the
    counts are the audit trail that redaction executed."""
    counts = [
        F.size(F.regexp_extract_all(F.col(text_col), F.lit(pat), 0))
        .alias(f"n_{name}")
        for name, pat, _ in PII_PATTERNS
    ]
    out = df.select(
        F.col(id_col),
        redact_expr(F.col(text_col)).alias(text_col),
        *counts,
    )
    total = None
    for name, _, _ in PII_PATTERNS:
        c = F.col(f"n_{name}")
        total = c if total is None else total + c
    return out.withColumn("n_pii", total)
