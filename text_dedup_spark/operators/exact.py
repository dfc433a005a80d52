"""Exact-hash dedup — fully distributed replacement for the reference's
driver-local ``set()`` of md5 hexdigests (exact_hash.py:45-63) and its
Bloom-filter variant (bloom_filter.py:52-68).

The reference scans sequentially and keeps the FIRST occurrence; ours keeps
the MIN-id occurrence — identical when ids follow scan order (they do: both
use enumeration order), and well-defined under distribution.

All expressions are built-in (md5/sha2, window/groupBy min): whole-stage
codegen, zero Python. The Bloom filter is subsumed: it existed only to bound
single-node memory, which a distributed shuffle already does; a probabilistic
variant would only *lose* duplicates (error_rate misses), so exact grouping
strictly dominates at equal cost (one shuffle on the hash key).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .ids import ID


def content_hash(col, algo: str = "md5"):
    """Hash expression for a string/binary column. md5 matches the reference
    default (exact_hash.py:45); sha256 offered for collision-paranoid runs;
    'precomputed' passes the column through (it already holds the hash —
    the compute-early-shuffle-small pattern)."""
    if algo == "md5":
        return F.md5(col)
    if algo in ("sha256", "sha2"):
        return F.sha2(col, 256)
    if algo == "precomputed":
        return col
    raise ValueError(f"unknown hash algo {algo!r}")


def exact_assignments(
    df: DataFrame, text_col: str, id_col: str = ID, algo: str = "md5"
) -> DataFrame:
    """(id, component) rows for exact duplicates, min-id representative
    absent — same output contract as the MinHash CC table, so the same
    apply/split stage works downstream.

    Plan shape: project(hash) -> shuffle on hash -> partial/final min -> join
    back. The join is on the hash (high cardinality, uniform) — no skew
    concern except pathological single-value corpora, which AQE splits.
    """
    col = content_hash(F.col(text_col), algo)
    hashed = df.select(F.col(id_col), col.alias("__h__"))
    mins = hashed.groupBy("__h__").agg(F.min(id_col).alias("component"))
    return (
        hashed.join(mins, "__h__")
        .where(F.col(id_col) != F.col("component"))
        .select(id_col, "component")
    )


def exact_dedup(
    df: DataFrame, text_col: str, id_col: str = ID, algo: str = "md5"
) -> DataFrame:
    """Survivors only (one row per distinct content, the min-id one).

    Single-shuffle alternative when assignments aren't needed:
    row_number over (hash) window == 1.
    """
    col = content_hash(F.col(text_col), algo)
    w = Window.partitionBy(col).orderBy(F.col(id_col))
    return (
        df.withColumn("__rn__", F.row_number().over(w))
        .where(F.col("__rn__") == 1)
        .drop("__rn__")
    )
