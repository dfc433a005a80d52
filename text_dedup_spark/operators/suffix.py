"""Suffix-array-equivalent substring dedup operator.

Reference pipeline (suffix_array.py:274-358, SURVEY §2.7): concatenate the
corpus into one byte stream, external SA tools find >= k-byte duplicate
ranges, `restore` maps them into documents, ranges are blanked out and empty
docs dropped.

Spark mapping: `mapInPandas` partition-local passes of the vectorized
rolling-hash kernel (kernel/substr.py). Each task concatenates ITS partition
— the same memory envelope as the reference's one-file-per-machine scheme,
but parallel. Cross-partition duplicate substrings are out of scope for a
partition-local pass (documented semantic difference, SURVEY §7.4: the
reference's pass is inherently single-stream); set ``global_scope=True`` to
force one partition and reproduce the exact global semantics, or rely on
the MinHash/exact layers for cross-partition near-dups.

``repartition(col)`` by a stable key (not round-robin) makes the partition
contents — hence the output — deterministic for a given partition count.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StringType, StructField, StructType

from ..config import SuffixConfig
from ..kernel.substr import dedup_documents
from .ids import ID


def remove_duplicate_substrings(
    df: DataFrame,
    text_col: str,
    cfg: SuffixConfig | None = None,
    id_col: str = ID,
    num_partitions: int | None = None,
) -> DataFrame:
    """Returns (id, <text_col> cleaned, dup_bytes). Empty survivors are
    filtered (suffix_array.py:354-357 / P8)."""
    cfg = cfg or SuffixConfig()
    schema = StructType(
        [
            StructField(id_col, LongType()),
            StructField(text_col, StringType()),
            StructField("dup_bytes", LongType()),
        ]
    )
    k, strategy = cfg.k, cfg.merge_strategy

    def process(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # whole-partition pass: concatenate the partition's batches so the
        # dedup scope is the partition, not the Arrow batch
        parts = list(batches)
        if not parts:
            return
        pdf = pd.concat(parts, ignore_index=True)
        docs = list(zip(pdf[id_col].tolist(), pdf[text_col].fillna("").tolist()))
        rows = dedup_documents(docs, k, strategy)
        yield pd.DataFrame(rows, columns=[id_col, text_col, "dup_bytes"])

    selected = df.select(id_col, text_col)
    if cfg.global_scope:
        selected = selected.repartition(1)
    elif num_partitions is not None:
        selected = selected.repartition(num_partitions, F.col(id_col))

    cleaned = selected.mapInPandas(process, schema)
    return cleaned.where(F.length(F.col(text_col)) > 0)


def duplicate_byte_stats(
    df: DataFrame,
    text_col: str,
    cfg: SuffixConfig | None = None,
    id_col: str = ID,
) -> DataFrame:
    """(total_bytes, dup_bytes, dup_ratio) aggregate — the reference logs
    'total duplicate size' (suffix_array.py:187-233 return value)."""
    cfg = cfg or SuffixConfig()
    cleaned = remove_duplicate_substrings(df, text_col, cfg, id_col)
    original = df.select(
        F.sum(F.octet_length(F.col(text_col))).alias("total_bytes")
    )
    dup = cleaned.select(F.sum("dup_bytes").alias("dup_bytes"))
    return original.crossJoin(dup).select(
        "total_bytes",
        "dup_bytes",
        (F.col("dup_bytes") / F.col("total_bytes")).alias("dup_ratio"),
    )
