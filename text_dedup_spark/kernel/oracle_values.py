"""Constructed DuckDB oracle row sets for the non-SQL-expressible kernel
queries on the correctness board.

The driver's correctness gate compares each ``queries()`` entry against a
DuckDB ``oracle_sql()`` string.  MinHash/SimHash clustering, LSH-verified
Jaccard, global suffix cleanup, and language-ID are not expressible in
ANSI SQL — but their EXPECTED OUTPUT on the deterministic test corpus is
computable without Spark, so the oracle pins the literal row set instead
(the same constructed-oracle technique the board already uses for
``semantic_dedup`` and the synthetic-media queries).

Independence argument, per query family:

- MinHash / SimHash / verified-Jaccard: rows come from the single-node
  brute-force path in ``kernel/oracle.py`` — an explicit per-bucket pair
  enumeration + ``UnionFind`` (the reference's own clustering shape,
  minhash_spark.py:295-312 / simhash.py:305-378), with NO distributed CC,
  no star rounds, no Spark joins.  A green cell therefore cross-checks
  the whole distributed candidate-edge + connected-components machinery
  against exhaustive enumeration.  Signature computation itself is shared
  with the engine by design — its correctness is pinned separately and
  bit-exactly against the EXECUTED reference kernels
  (tests/test_reference_parity.py, tests/test_reference_executed_kernels.py).
- Suffix cleanup: rows come from ``kernel/substr.dedup_documents`` on the
  single concatenated stream — the oracle the distributed three-round
  pass is proven byte-identical to in tests/test_suffix.py.
- Language-ID: the same scalar ``detect_language`` evaluated driver-side;
  this pins determinism and the Spark aggregation plumbing (the
  classifier itself is pinned by the 22-language matrix in
  tests/test_langid.py), and is honestly weaker than the families above.

All builders are cached per (sf_dir, params): the driver calls
``oracle_sql()`` once and each corpus is read and clustered once.
"""

from __future__ import annotations

import functools
from decimal import ROUND_HALF_UP, Decimal
from typing import Iterable, List, Sequence, Tuple


# --------------------------------------------------------------------------
# corpus loading (duckdb, no Spark)
# --------------------------------------------------------------------------


@functools.lru_cache(maxsize=4)
def _documents(sf_dir: str) -> Tuple[Tuple[int, str], ...]:
    import duckdb

    con = duckdb.connect()
    try:
        rows = con.execute(
            "SELECT doc_id, text FROM read_parquet(?) ORDER BY doc_id",
            [f"{sf_dir}/documents.parquet"],
        ).fetchall()
    finally:
        con.close()
    return tuple((int(i), t if t is not None else "") for i, t in rows)


def _near_dup_corpus(sf_dir: str, id_shift: int, tail: str):
    docs = _documents(sf_dir)
    return list(docs) + [(i + id_shift, t + tail) for i, t in docs]


def _exact_dup_corpus(sf_dir: str, id_shift: int):
    docs = _documents(sf_dir)
    return list(docs) + [(i + id_shift, t) for i, t in docs]


# --------------------------------------------------------------------------
# VALUES SQL emission
# --------------------------------------------------------------------------


def _lit(v, typ: str) -> str:
    if v is None:
        return f"CAST(NULL AS {typ})"
    if typ == "DOUBLE":
        return f"{v:.6f}"
    if typ in ("BIGINT", "INTEGER"):
        return str(int(v))
    # VARCHAR: double the single quotes (standard SQL escaping)
    return "'" + str(v).replace("'", "''") + "'"


def values_sql(rows: Iterable[Sequence], columns: List[Tuple[str, str]]) -> str:
    """``SELECT CAST(...) AS name, ... FROM (VALUES ...)`` over literal rows.

    ``columns`` is ``[(name, duckdb_type), ...]``. An empty row set emits a
    typed WHERE FALSE select so schema comparison still works.
    """
    rows = list(rows)
    sel = ", ".join(f"CAST(c{i} AS {t}) AS {n}" for i, (n, t) in enumerate(columns))
    names = ", ".join(f"c{i}" for i in range(len(columns)))
    if not rows:
        null_row = ", ".join(f"CAST(NULL AS {t})" for _, t in columns)
        return f"SELECT {sel} FROM (VALUES ({null_row})) t({names}) WHERE FALSE"
    body = ",\n".join(
        "(" + ", ".join(_lit(v, columns[i][1]) for i, v in enumerate(r)) + ")"
        for r in rows
    )
    return f"SELECT {sel} FROM (VALUES\n{body}\n) t({names})"


def _spark_round6(x: float) -> float:
    """Spark's round(col, 6) on DOUBLE: shortest-repr decimal, HALF_UP."""
    return float(Decimal(repr(float(x))).quantize(Decimal("0.000001"),
                                                  rounding=ROUND_HALF_UP))


# --------------------------------------------------------------------------
# row-set builders
# --------------------------------------------------------------------------


@functools.lru_cache(maxsize=4)
def minhash_board_rows(
    sf_dir: str, id_shift: int, tail: str,
    ngram_size: int, num_perm: int, threshold: float,
):
    """(assignment_rows, survivor_rows) for the near-dup corpus."""
    from ..config import MinHashConfig
    from .oracle import minhash_oracle

    corpus = _near_dup_corpus(sf_dir, id_shift, tail)
    cfg = MinHashConfig(ngram_size=ngram_size, num_perm=num_perm,
                        threshold=threshold)
    comp = minhash_oracle(corpus, cfg).components()  # roots absent
    assigns = sorted(comp.items())
    survivors = sorted(i for i, _ in corpus if i not in comp)
    return assigns, [(i,) for i in survivors]


@functools.lru_cache(maxsize=8)
def simhash_board_rows(
    sf_dir: str, id_shift: int, tail: str,
    f: int, bit_diff: int, num_bucket: int, ngram: int,
):
    from ..config import SimHashConfig
    from .oracle import simhash_oracle

    corpus = _near_dup_corpus(sf_dir, id_shift, tail)
    cfg = SimHashConfig(f=f, bit_diff=bit_diff, num_bucket=num_bucket,
                        ngram=ngram)
    return sorted(simhash_oracle(corpus, cfg).components().items())


@functools.lru_cache(maxsize=4)
def jaccard_verified_rows(
    sf_dir: str, id_shift: int, tail: str,
    ngram_size: int, num_perm: int, threshold: float,
    n: int, jaccard_threshold: float,
):
    """Star candidate edges from brute-force LSH buckets, verified by exact
    word-n-gram Jaccard (the kernel tokenizer mirrors shingles_expr)."""
    from ..config import MinHashConfig
    from .minhash import (band_bytes, generate_permutations,
                          minhash_signature, tokenize)

    corpus = _near_dup_corpus(sf_dir, id_shift, tail)
    cfg = MinHashConfig(ngram_size=ngram_size, num_perm=num_perm,
                        threshold=threshold).resolve()
    permutations = generate_permutations(cfg.num_perm, cfg.seed)
    buckets: dict = {}
    for idx, text in corpus:
        sig = minhash_signature(text, cfg.num_perm, cfg.ngram_size, permutations)
        for band_idx, h in enumerate(band_bytes(sig, cfg.ranges)):
            buckets.setdefault((band_idx, h), []).append(idx)
    edges = set()
    for members in buckets.values():
        if len(members) <= 1:
            continue
        mn = min(members)
        edges.update((x, mn) for x in members if x != mn)
    text_of = dict(corpus)
    sh_cache: dict = {}

    def sh(i):
        if i not in sh_cache:
            sh_cache[i] = tokenize(text_of[i], n)
        return sh_cache[i]

    out = []
    for src, dst in sorted(edges):
        a, b = sh(src), sh(dst)
        union = len(a | b)
        j = (len(a & b) / union) if union else 0.0
        j = _spark_round6(j)
        if j >= jaccard_threshold:
            out.append((src, dst, j))
    return out


@functools.lru_cache(maxsize=4)
def langid_count_rows(sf_dir: str):
    from collections import Counter

    from ..functions.langid import detect_language

    counts = Counter(detect_language(t) for _, t in _documents(sf_dir))
    return sorted(counts.items())


@functools.lru_cache(maxsize=4)
def suffix_cleaned_rows(sf_dir: str, id_shift: int, k: int,
                        merge_strategy: str = "overlapping"):
    from .substr import dedup_documents

    corpus = sorted(_exact_dup_corpus(sf_dir, id_shift))
    rows = dedup_documents(corpus, k, merge_strategy)
    return [(i, t, d) for i, t, d in rows if len(t) > 0]
