"""One-shot MinHash-LSH near-dedup pipeline (DataFrame end-to-end).

Equivalent capability to the reference's `minhash_spark.py` main
(:276-395), restructured per SURVEY §3.1: no DF->RDD downgrade, no driver
collect of the component map, Catalyst/AQE owns every shuffle.

    corpus --(pandas UDF: MinHash bands)--> band rows
           --(bucket min + skew-aware join)--> candidate edges
           --(large/small-star CC)--> assignments (roots absent)
           --(left_anti)--> survivors
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame

from ..config import MinHashConfig
from ..operators.apply import split_survivors, with_cluster
from ..operators.cc import connected_components
from ..operators.ids import ID, assign_unique_ids
from ..operators.lsh import band_rows, candidate_edges


@dataclass
class MinHashDedupResult:
    corpus: DataFrame       # input + id column
    assignments: DataFrame  # (id, component), roots absent
    kept: DataFrame
    removed: DataFrame

    def clustered(self) -> DataFrame:
        return with_cluster(self.corpus, self.assignments)


def minhash_dedup(
    df: DataFrame,
    text_col: str,
    cfg: MinHashConfig | None = None,
    id_col: str | None = None,
    hot_threshold: int | None = None,
    short_doc_policy: str = "cluster",
) -> MinHashDedupResult:
    """Near-deduplicate ``df`` on ``text_col``.

    If ``id_col`` is None an internal unique int64 id is attached
    (monotonically_increasing_id, as minhash_spark.py:343); pass an existing
    int column (e.g. doc_id) to make representatives deterministic.
    """
    cfg = (cfg or MinHashConfig()).resolve()
    if id_col is None:
        df = assign_unique_ids(df, ID)
        id_col = ID
    corpus = df.persist()  # reused: banding + final join (minhash_spark.py:343)

    from pyspark import StorageLevel

    # bands feed two shuffles (bucket-min + join back) — persist so the
    # signature UDF runs once; CC eagerly materializes edges, after which
    # the band rows are dead weight and can be dropped.
    bands = band_rows(corpus, text_col, cfg, id_col,
                      short_doc_policy=short_doc_policy).persist(StorageLevel.MEMORY_AND_DISK)
    edges = candidate_edges(bands, id_col, hot_threshold=hot_threshold)
    assignments = connected_components(edges, id_col)
    bands.unpersist()
    kept, removed = split_survivors(corpus, assignments, id_col)
    return MinHashDedupResult(corpus, assignments, kept, removed)
