"""Text-analysis operators for training-data pipelines: token counting,
quality scoring, document fingerprinting.

Everything here is pure Catalyst expression (whole-stage codegen, ANSI-SQL
mirrorable 1:1 in DuckDB for the correctness oracle). The tokenizer regex is
the reference's NON_ALPHA character class ([A-Za-z_0-9]+ tokens,
minhash_spark.py:25) so stats agree with what the dedup shingles see.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

TOKEN_RE = "[A-Za-z_0-9]+"
BPE_ISH_RE = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"  # word/number/punct pieces
PUNCT_RE = "[^A-Za-z0-9\\s]"
STOPWORDS = ("the", "a", "an", "of", "and", "or", "with", "from", "to", "in")


def tokens_expr(col: Column) -> Column:
    return F.regexp_extract_all(col, F.lit(TOKEN_RE), 0)


def token_count_expr(col: Column) -> Column:
    return F.size(tokens_expr(col))


def bpe_piece_count_expr(col: Column) -> Column:
    """Whitespace+BPE-ish piece count (words, digit runs, punctuation)."""
    return F.size(F.regexp_extract_all(col, F.lit(BPE_ISH_RE), 0))


def doc_stats(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Per-document stats: token/piece counts, length, punctuation ratio,
    stopword ratio, average token length — all rounded to 4 decimals where
    fractional so engine/oracle float hashing agrees."""
    toks = tokens_expr(F.col(text_col))
    n_tok = F.size(toks)
    total_tok_chars = F.aggregate(
        toks, F.lit(0), lambda acc, t: acc + F.length(t)
    )
    n_stop = F.size(
        F.filter(toks, lambda t: F.lower(t).isin(*STOPWORDS))
    )
    n_punct = F.size(F.regexp_extract_all(F.col(text_col), F.lit(PUNCT_RE), 0))
    n_chars = F.length(F.col(text_col))
    return df.select(
        F.col(id_col),
        n_chars.alias("n_chars"),
        n_tok.alias("n_tokens"),
        bpe_piece_count_expr(F.col(text_col)).alias("n_pieces"),
        F.round(
            F.when(n_tok > 0, total_tok_chars.cast("double") / n_tok).otherwise(0.0), 4
        ).alias("avg_token_len"),
        F.round(
            F.when(n_chars > 0, n_punct.cast("double") / n_chars).otherwise(0.0), 4
        ).alias("punct_ratio"),
        F.round(
            F.when(n_tok > 0, n_stop.cast("double") / n_tok).otherwise(0.0), 4
        ).alias("stopword_ratio"),
    )


def quality_score(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Composite quality score in [0,1]: length band, token length band,
    punctuation penalty, stopword presence — the usual cheap pretraining
    filters (C4-style heuristics), deterministic and SQL-mirrorable."""
    s = doc_stats(df, text_col, id_col)
    len_ok = F.when((F.col("n_tokens") >= 10) & (F.col("n_tokens") <= 5000), 1.0).otherwise(0.3)
    tok_ok = F.when((F.col("avg_token_len") >= 2.0) & (F.col("avg_token_len") <= 12.0), 1.0).otherwise(0.5)
    punct_ok = F.when(F.col("punct_ratio") <= 0.2, 1.0).otherwise(0.4)
    stop_ok = F.when(F.col("stopword_ratio") >= 0.05, 1.0).otherwise(0.7)
    return s.select(
        id_col,
        F.round(len_ok * tok_ok * punct_ok * stop_ok, 4).alias("quality"),
    )


def doc_fingerprint(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """64-bit-equivalent content fingerprint as the first 16 hex chars of
    md5 — stable across engines; duplicate fingerprints == exact duplicates
    (used for fast dup audits without full-text comparison)."""
    return df.select(
        F.col(id_col),
        F.substring(F.md5(F.col(text_col)), 1, 16).alias("fingerprint"),
    )
