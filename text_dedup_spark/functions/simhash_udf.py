"""SimHash pandas UDF (caption -> 64-bit fingerprint as LongType) and the
Catalyst bit-rotation bucketing expressions.

The signature computation (char n-grams -> xxh64 -> bit majority,
simhash.py:263-302) is Python-side (Arrow-batched). The *bucketing* — the
reference's Permutation.permute + search-mask (simhash.py:114-138,293-301) —
compiles to pure Catalyst bitwise expressions on LongType (shiftleft /
shiftrightunsigned / AND / OR), so the shuffle key derivation runs inside
whole-stage codegen with zero Python. Verification (Hamming <= k) is
``bit_count(a ^ b)``, also pure Catalyst.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.pandas.functions import pandas_udf
from pyspark.sql.types import LongType

from ..config import SimHashConfig
from ..kernel.simhash import (
    Permutation,
    create_permutations,
    simhash_signatures_batch,
)


def _to_signed64(x: int) -> int:
    return x - (1 << 64) if x >= (1 << 63) else x


def make_simhash_udf(cfg: SimHashConfig):
    """caption:string -> signature:long (uint64 fingerprint bit-cast)."""
    if cfg.f != 64:
        raise NotImplementedError(
            "LongType signature path supports f=64 only (phash and the "
            "reference default); f=128 would need two longs"
        )
    f, ngram = cfg.f, cfg.ngram

    @pandas_udf(LongType())
    def simhash64(texts: pd.Series) -> pd.Series:
        import numpy as np

        sigs = simhash_signatures_batch(texts.tolist(), f=f, ngram=ngram)
        return pd.Series(sigs.view(np.int64))

    return simhash64


def permute_expr(col: Column, perm: Permutation) -> Column:
    """Catalyst expression computing perm.permute(x) on a LongType column.

    bitarray '<< s toward MSB' == Java long '<< s' (overflow naturally
    dropped at 64 bits); '>>' must be LOGICAL, hence shiftrightunsigned.
    """
    assert perm.f == 64, "Catalyst path is 64-bit"
    result = F.lit(0).cast("long")
    for mask, offset in zip(perm.masks, perm.offsets):
        masked = col.bitwiseAND(F.lit(_to_signed64(mask)))
        if offset > 0:
            part = F.shiftleft(masked, offset)
        elif offset < 0:
            part = F.shiftrightunsigned(masked, -offset)
        else:
            part = masked
        result = result.bitwiseOR(part)
    return result


def bucket_keys_expr(col: Column, cfg: SimHashConfig) -> Column:
    """array<long> of bucket keys, one per permutation:
    permute(x) & search_mask (simhash.py:293-301)."""
    perms = create_permutations(cfg.f, cfg.bit_diff, cfg.num_bucket)
    keys = [
        permute_expr(col, p).bitwiseAND(F.lit(_to_signed64(p.search_mask)))
        for p in perms
    ]
    return F.array(*keys)


def hamming_expr(a: Column, b: Column) -> Column:
    """bit_count(a ^ b) — pure Catalyst (simhash.py:41-64 equivalent)."""
    return F.bit_count(a.bitwiseXOR(b))
