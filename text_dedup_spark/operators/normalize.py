"""Deterministic text normalization for dedup keys (CCNet-style).

CCNet (Wenzek et al. 2020, "CCNet: Extracting High Quality Monolingual
Datasets from Web Crawl Data") deduplicates on a *normalized* rendering of
each paragraph: lowercased, digits replaced, accents folded, punctuation
stripped, whitespace collapsed — so "Hello,  World 42!" and "héllo world 7"
hash to the same key. The reference engine (exact_hash.py:45) hashes the raw
text only; this operator adds the normalized tier ABOVE it: same exact-hash
dataflow (`operators/exact.py` — one shuffle on the key, map-side partial
min), different key expression.

Every step is a built-in Catalyst expression (lower / translate /
regexp_replace / trim — whole-stage codegen, zero Python) and each has an
IDENTICAL DuckDB restatement (translate is per-codepoint in both engines;
DuckDB regexp_replace needs the explicit 'g' flag Spark implies), so the
contract query `normalized_exact_dup_assignments` is fully oracled.

Normalization pipeline (ORDER MATTERS — documented so the oracle can
restate it exactly):

1. lowercase
2. translate: every ASCII digit -> '0' (CCNet's digit bucketing) and the
   Latin-1-supplement accented letters -> their base letter
3. strip ASCII punctuation (the four contiguous ranges ``!-/ :-@ [-` {-~``)
4. collapse whitespace runs (``\\s+``) to one space
5. trim

Anything outside those classes (CJK, emoji, em-dash, ...) passes through
unchanged — deterministic and engine-agnostic beats aggressive-but-
implementation-defined (full Unicode NFKD differs between ICU builds).

Scale shape: identical to ``exact_assignments`` — the normalized key is
computed map-side inside the scan's codegen stage and only (id, key) rows
shuffle; the document payload never moves.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .exact import exact_assignments, exact_dedup
from .ids import ID

# digit bucketing + Latin-1-supplement accent folding, one translate pass.
# Kept to characters whose per-codepoint translate behaves identically in
# Spark (UTF8String codepoint walk) and DuckDB (UTF-8 codepoint walk).
TRANSLATE_SRC = "0123456789àáâãäåçèéêëìíîïñòóôõöøùúûüýÿ"
TRANSLATE_DST = "0000000000aaaaaaceeeeiiiinoooooouuuuyy"

# ASCII punctuation as four contiguous ranges — valid, identical semantics
# in Java regex (Spark) and RE2 (DuckDB).
PUNCT_RE = "[!-/:-@\\[-`{-~]"
WS_RE = "\\s+"


def normalize_text_expr(col: Column) -> Column:
    """The normalization pipeline as one Catalyst expression tree."""
    x = F.lower(col)
    x = F.translate(x, TRANSLATE_SRC, TRANSLATE_DST)
    x = F.regexp_replace(x, PUNCT_RE, "")
    x = F.regexp_replace(x, WS_RE, " ")
    return F.trim(x)


def normalize_sql(expr: str) -> str:
    """The SAME pipeline as ANSI/DuckDB SQL over a column expression —
    single source of truth for the contract-query oracle (DuckDB's
    regexp_replace replaces only the first match without 'g')."""
    return (
        "trim(regexp_replace(regexp_replace(translate(lower("
        + expr
        + f"), '{TRANSLATE_SRC}', '{TRANSLATE_DST}'),"
        + f" '{PUNCT_RE}', '', 'g'), '{WS_RE}', ' ', 'g'))"
    )


def normalized_docs(df: DataFrame, text_col: str, out_col: str = "normalized") -> DataFrame:
    """Adds the normalized rendering as a column (for feeding MinHash /
    SimHash / line dedup with normalization on)."""
    return df.withColumn(out_col, normalize_text_expr(F.col(text_col)))


def normalized_exact_assignments(
    df: DataFrame, text_col: str, id_col: str = ID, algo: str = "md5"
) -> DataFrame:
    """(id, component) rows for normalized-exact duplicates — the CCNet
    tier. Same output contract as ``exact_assignments`` (min-id
    representative absent), so the same apply/split stage works downstream.
    """
    keyed = df.select(
        F.col(id_col), normalize_text_expr(F.col(text_col)).alias(text_col)
    )
    return exact_assignments(keyed, text_col, id_col, algo)


def normalized_exact_dedup(
    df: DataFrame, text_col: str, id_col: str = ID, algo: str = "md5"
) -> DataFrame:
    """Survivors only (one ORIGINAL row per distinct normalized content,
    the min-id one) — payload columns pass through untouched; only the
    key is normalized."""
    keyed = df.withColumn("__norm__", normalize_text_expr(F.col(text_col)))
    return exact_dedup(keyed, "__norm__", id_col, algo).drop("__norm__")
