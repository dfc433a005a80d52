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
            "LongType signature path is f=64; use make_simhash128_udf for "
            "the two-long f=128 representation"
        )
    f, ngram = cfg.f, cfg.ngram

    @pandas_udf(LongType())
    def simhash64(texts: pd.Series) -> pd.Series:
        import numpy as np

        sigs = simhash_signatures_batch(texts.tolist(), f=f, ngram=ngram)
        return pd.Series(sigs.view(np.int64))

    return simhash64


def make_simhash128_udf(cfg: SimHashConfig):
    """caption:string -> struct(sig_hi:long, sig_lo:long) — the 128-bit
    fingerprint split MSB-half/LSB-half (reference f=128, simhash.py:224-227:
    xxh128 digest bits via bitarray; here two bit-cast uint64 halves)."""
    assert cfg.f == 128
    ngram = cfg.ngram

    @pandas_udf("sig_hi long, sig_lo long")
    def simhash128(texts: pd.Series) -> pd.DataFrame:
        import numpy as np

        from ..kernel.simhash import simhash128_signatures_batch

        hi, lo = simhash128_signatures_batch(texts.tolist(), ngram)
        return pd.DataFrame(
            {"sig_hi": hi.view(np.int64), "sig_lo": lo.view(np.int64)}
        )

    return simhash128


def _slice128_expr(hi: Column, lo: Column, s: int, e: int) -> Column:
    """Bits [s, e) of a 128-bit value (MSB-first index space) held as two
    longs, right-aligned into one long. e - s <= 64."""
    w = e - s
    if e <= 64:
        piece = F.shiftrightunsigned(hi, 64 - e)
    elif s >= 64:
        piece = F.shiftrightunsigned(lo, 128 - e)
    else:
        hi_bits = 64 - s  # low hi_bits of hi word
        lo_bits = e - 64  # top lo_bits of lo word
        piece = F.shiftleft(
            hi.bitwiseAND(F.lit(_to_signed64((1 << hi_bits) - 1))), lo_bits
        ).bitwiseOR(F.shiftrightunsigned(lo, 64 - lo_bits))
    if w < 64:
        piece = piece.bitwiseAND(F.lit(_to_signed64((1 << w) - 1)))
    return piece


def _place128(pieces: list, d: int, w: int, piece: Column) -> None:
    """Place a w-bit piece at MSB-first offset d of a (hi, lo) accumulator
    list [hi_expr, lo_expr]."""
    if d + w <= 64:
        pieces[0] = pieces[0].bitwiseOR(F.shiftleft(piece, 64 - (d + w)))
    elif d >= 64:
        pieces[1] = pieces[1].bitwiseOR(F.shiftleft(piece, 128 - (d + w)))
    else:
        lo_bits = d + w - 64
        pieces[0] = pieces[0].bitwiseOR(F.shiftrightunsigned(piece, lo_bits))
        pieces[1] = pieces[1].bitwiseOR(
            F.shiftleft(
                piece.bitwiseAND(F.lit(_to_signed64((1 << lo_bits) - 1))),
                128 - (d + w),
            )
        )


def bucket_keys128_expr(hi: Column, lo: Column, cfg: SimHashConfig) -> Column:
    """array<struct<key_hi:long, key_lo:long>> of bucket keys for a 128-bit
    fingerprint in two longs — pure Catalyst, like the 64-bit path.

    permute(x) & search_mask keeps exactly the leading (b-k) blocks placed
    consecutively from the MSB, so the key is assembled directly from the
    leading blocks' source slices (no full permute needed)."""
    perms = create_permutations(cfg.f, cfg.bit_diff, cfg.num_bucket)
    keys = []
    for p in perms:
        acc = [F.lit(0).cast("long"), F.lit(0).cast("long")]
        d = 0
        n_lead = p.b - p.k
        for width, offset in zip(p.widths[:n_lead], p.offsets[:n_lead]):
            # source interval in MSB-first space: dest d, source d + offset
            s = d + offset
            _place128(acc, d, width, _slice128_expr(hi, lo, s, s + width))
            d += width
        keys.append(F.struct(acc[0].alias("key_hi"), acc[1].alias("key_lo")))
    return F.array(*keys)


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


def hamming128_expr(a_hi: Column, a_lo: Column, b_hi: Column, b_lo: Column) -> Column:
    """128-bit Hamming distance over two-long fingerprints — pure Catalyst."""
    return F.bit_count(a_hi.bitwiseXOR(b_hi)) + F.bit_count(a_lo.bitwiseXOR(b_lo))
