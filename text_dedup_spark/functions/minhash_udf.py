"""MinHash pandas UDFs.

The reference ships a per-row RDD flatMap (minhash_spark.py:352-361) that
crosses the JVM<->Python pipe once per row. Here the kernel runs inside an
Arrow-batched pandas UDF: one JVM<->Python transfer per ~10k-row batch, with
a per-batch sha1 token cache (shingles repeat heavily across near-duplicate
documents, which is the whole premise of the workload).

The UDF emits one ``array<binary>`` column (one element per LSH band, the
reference's exact big-endian byte serialization, minhash_spark.py:155);
``posexplode`` then plays the UDTF role to produce (band, band_hash) rows —
band hashing stays declarative so Catalyst owns the shuffle.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.pandas.functions import pandas_udf
from pyspark.sql.types import ArrayType, BinaryType, LongType

from ..config import MinHashConfig
from ..kernel.minhash import (
    band_bytes,
    generate_permutations,
    minhash_signatures_batch,
)


def make_band_hashes_udf(cfg: MinHashConfig):
    """Returns a pandas UDF: caption:string -> array<binary> of B band keys
    in the reference's exact big-endian byte serialization
    (minhash_spark.py:155). NOTE: the pipelines do NOT use this — they emit
    the raw signature and derive equality-equivalent 8-byte band keys
    JVM-side (operators/lsh.band_keys_expr); this path exists for consumers
    that need byte-compatible checkpoints with the reference."""
    cfg = cfg.resolve()
    permutations = generate_permutations(cfg.num_perm, cfg.seed)
    ranges = cfg.ranges
    num_perm, ngram_size = cfg.num_perm, cfg.ngram_size

    @pandas_udf(ArrayType(BinaryType()))
    def band_hashes(texts: pd.Series) -> pd.Series:
        sigs = minhash_signatures_batch(
            texts.tolist(), num_perm, ngram_size, permutations, token_cache={}
        )
        return pd.Series([band_bytes(sig, ranges) for sig in sigs])

    return band_hashes


def make_signature_udf(cfg: MinHashConfig):
    """Returns a pandas UDF: caption:string -> array<long> (the uint64
    signature bit-cast to int64) — used by the signature checkpoint table so
    resume can re-band without re-shingling."""
    cfg = cfg.resolve()
    permutations = generate_permutations(cfg.num_perm, cfg.seed)
    num_perm, ngram_size = cfg.num_perm, cfg.ngram_size

    @pandas_udf(ArrayType(LongType()))
    def signature(texts: pd.Series) -> pd.Series:
        sigs = minhash_signatures_batch(
            texts.tolist(), num_perm, ngram_size, permutations, token_cache={}
        )
        # list of numpy int64 row-views: Arrow converts ndarray elements
        # directly, avoiding 64 python ints per row
        return pd.Series(list(sigs.view(np.int64)))

    return signature


def bands_from_signature_col(sig_col, cfg: MinHashConfig):
    """Catalyst-only re-banding of a stored array<long> signature: slice the
    array per band and serialize to the reference byte layout with
    JVM-side expressions (no Python). Returns array<binary>."""
    cfg = cfg.resolve()
    # slice() is 1-indexed; each uint64 -> 8 big-endian bytes via overlay of
    # hex; simplest exact JVM path: conv each long to padded hex then unhex.
    bands = []
    for start, end in cfg.ranges:
        r = end - start
        parts = [
            F.lpad(F.hex(F.element_at(sig_col, start + i + 1)), 16, "0")
            for i in range(r)
        ]
        bands.append(F.unhex(F.concat(*parts)))
    return F.array(*bands)
