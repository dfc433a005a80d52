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


def _dup_char_sum(sorted_arr: str) -> str:
    """SQL expr: total characters of repeat occurrences (2nd+ of an
    identical element) in a SORTED string array — linear adjacent-equal
    fold, no quadratic membership tests."""
    return f"""
      aggregate({sorted_arr},
        named_struct('prev', cast(null as string), 'dupc', cast(0 as bigint)),
        (acc, x) -> named_struct(
          'prev', x,
          'dupc', acc.dupc + if(acc.prev is not null and x = acc.prev,
                                cast(length(x) as bigint), cast(0 as bigint))),
        acc -> acc.dupc)
    """


def _top_run_weight(sorted_arr: str, sep_chars: int) -> str:
    """SQL expr: max over distinct elements of count(elem) * (length(elem)
    - sep_chars) in a SORTED string array — run-length fold. `sep_chars`
    removes the n-gram joiner spaces so the weight counts token chars only."""
    return f"""
      aggregate({sorted_arr},
        named_struct('prev', cast(null as string), 'run', 0,
                     'best', cast(0 as bigint)),
        (acc, x) -> named_struct(
          'prev', x,
          'run', if(acc.prev is not null and x = acc.prev, acc.run + 1, 1),
          'best', greatest(acc.best,
            cast(if(acc.prev is not null and x = acc.prev, acc.run + 1, 1)
                 * (length(x) - {sep_chars}) as bigint))),
        acc -> acc.best)
    """


def repetition_stats(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Gopher-style repetition signals (Rae et al. 2021, "Scaling Language
    Models", Table A1 — the standard pretraining repetition filters the
    reference's dedup pipeline sits next to), per document:

    - ``n_lines``: non-empty trimmed '\\n'-separated lines
    - ``dup_line_frac``: repeat line occurrences / all line occurrences
    - ``dup_line_char_frac``: chars in repeat line occurrences / chars in
      all line occurrences
    - ``top_2gram_char_frac`` / ``top_3gram_char_frac``: for the most
      repeated lowercase word n-gram, count * (token chars in the gram)
      / total token chars

    All fractions round to 4 decimals (engine/oracle hash agreement); all
    0.0 on empty / too-short docs.

    Scale shape: pure Catalyst higher-order expressions — per-row compute,
    ZERO shuffle (no explode+groupBy re-aggregation). Repetition counting
    is sort + one linear adjacent-equal fold per array, so cost is
    O(L log L) in the doc's own line/token count, embarrassingly parallel
    at any corpus size."""
    t, i = text_col, id_col
    lines = f"filter(transform(split({t}, '\\n'), x -> trim(x)), x -> x != '')"
    toks = f"transform(regexp_extract_all({t}, '{TOKEN_RE}', 0), w -> lower(w))"
    # zip_with pads the shorter side with null -> concat yields null -> filter;
    # avoids element_at, which throws out-of-bounds under ANSI mode
    g2 = (
        f"filter(zip_with({toks}, slice({toks}, 2, greatest(size({toks}) - 1, 0)),"
        f" (a, b) -> concat(a, ' ', b)), g -> g is not null)"
    )
    g3 = (
        f"filter(zip_with({g2}, slice({toks}, 3, greatest(size({toks}) - 2, 0)),"
        f" (a, b) -> concat(a, ' ', b)), g -> g is not null)"
    )
    n_lines = F.expr(f"size({lines})")
    n_dup = n_lines - F.expr(f"size(array_distinct({lines}))")
    line_chars = F.expr(
        f"aggregate({lines}, cast(0 as bigint), (acc, x) -> acc + length(x))"
    )
    dup_chars = F.expr(_dup_char_sum(f"array_sort({lines})"))
    tok_chars = F.expr(
        f"aggregate({toks}, cast(0 as bigint), (acc, x) -> acc + length(x))"
    )
    best2 = F.expr(_top_run_weight(f"array_sort({g2})", 1))
    best3 = F.expr(_top_run_weight(f"array_sort({g3})", 2))

    def frac(num, den):
        # least(1.0): overlapping self-similar n-grams ("spam spam spam")
        # can cover more weighted chars than the doc has — clamp so the
        # signal stays a fraction
        return F.round(
            F.when(den > 0, F.least(num.cast("double") / den, F.lit(1.0))).otherwise(0.0),
            4,
        )

    return df.select(
        F.col(i),
        n_lines.alias("n_lines"),
        frac(n_dup, n_lines).alias("dup_line_frac"),
        frac(dup_chars, line_chars).alias("dup_line_char_frac"),
        frac(best2, tok_chars).alias("top_2gram_char_frac"),
        frac(best3, tok_chars).alias("top_3gram_char_frac"),
    )


def doc_fingerprint(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """64-bit-equivalent content fingerprint as the first 16 hex chars of
    md5 — stable across engines; duplicate fingerprints == exact duplicates
    (used for fast dup audits without full-text comparison)."""
    return df.select(
        F.col(id_col),
        F.substring(F.md5(F.col(text_col)), 1, 16).alias("fingerprint"),
    )
