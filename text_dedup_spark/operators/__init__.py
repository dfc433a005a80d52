"""DataFrame operators. Everything here takes and returns DataFrames so
Catalyst/AQE owns physical planning; no RDDs anywhere."""

from .ann import (  # noqa: F401
    brute_force_topk,
    embedding_near_pairs,
    ivf_topk,
    lsh_topk,
)
from .apply import keep_survivors, split_survivors, with_cluster  # noqa: F401
from .audit import audit_false_positives, audit_summary  # noqa: F401
from .cc import connected_components  # noqa: F401
from .exact import exact_assignments, exact_dedup  # noqa: F401
from .ids import ID, assign_dense_ids, assign_unique_ids  # noqa: F401
from .jaccard import jaccard_dedup_edges, verify_pairs  # noqa: F401
from .lsh import band_rows, candidate_edges, minhash_edges  # noqa: F401
from .semdedup import hashed_shingle_embeddings, semantic_dedup  # noqa: F401
from .simhash_dedup import (  # noqa: F401
    simhash_assignments_from_fingerprint,
    simhash_assignments_from_text,
    simhash_edges,
)
from .suffix import duplicate_byte_stats, remove_duplicate_substrings  # noqa: F401
from .textstats import doc_fingerprint, doc_stats, quality_score  # noqa: F401
