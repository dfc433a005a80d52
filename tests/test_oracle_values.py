"""kernel/oracle_values.py — the constructed-oracle layer behind the
driver correctness board's kernel queries (VERDICT r3 #2).

Two evidence layers:
- values_sql emission is pinned through a REAL DuckDB round trip
  (escaping, NULLs, floats, empty row sets);
- the brute-force row sets agree with the SPARK queries at sf0.001 —
  the same cross-check the driver gate performs at sf0.01, kept here so
  any operator change that would flip the board fails in pytest first.
"""

from __future__ import annotations

import duckdb
import pytest

from text_dedup_spark.kernel import oracle_values as ov

SF = "/root/testdata/sf0.001"
TAIL = " appended tail marker"
ID_SHIFT = 10_000_000


def test_values_sql_roundtrip_escaping_and_types():
    rows = [
        (1, "it's got 'quotes'", 0.5),
        (2, "newline\nand | pipe", 1.0),
        (3, "", 0.123456),
    ]
    sql = ov.values_sql(
        rows, [("id", "BIGINT"), ("t", "VARCHAR"), ("x", "DOUBLE")]
    )
    got = duckdb.connect().execute(sql).fetchall()
    assert got == rows
    # empty set keeps the schema, yields zero rows
    empty = ov.values_sql([], [("id", "BIGINT"), ("t", "VARCHAR")])
    cur = duckdb.connect().execute(empty)
    assert cur.fetchall() == []
    assert [d[0] for d in cur.description] == ["id", "t"]


def test_spark_round6_half_up():
    # HALF_UP on the shortest repr — Spark's BigDecimal.valueOf semantics
    assert ov._spark_round6(0.1234565) == 0.123457
    assert ov._spark_round6(0.5e-6) == 1e-6
    assert ov._spark_round6(1.0) == 1.0
    assert ov._spark_round6(2 / 3) == 0.666667


@pytest.mark.parametrize(
    "name",
    ["minhash_assignments", "minhash_survivors", "simhash_assignments",
     "simhash128_assignments", "jaccard_verified_pairs", "langid_counts",
     "suffix_cleaned"],
)
def test_board_rows_match_spark_queries_at_sf0001(spark, name):
    import __spark_entry__ as e

    got = {tuple(r) for r in e.queries()[name](spark, SF).collect()}
    if name == "minhash_assignments":
        rows, _ = ov.minhash_board_rows(SF, ID_SHIFT, TAIL, 5, 64, 0.7)
    elif name == "minhash_survivors":
        _, rows = ov.minhash_board_rows(SF, ID_SHIFT, TAIL, 5, 64, 0.7)
    elif name == "simhash_assignments":
        rows = ov.simhash_board_rows(SF, ID_SHIFT, TAIL, 64, 3, 4, 3)
    elif name == "simhash128_assignments":
        rows = ov.simhash_board_rows(SF, ID_SHIFT, TAIL, 128, 6, 8, 3)
    elif name == "jaccard_verified_pairs":
        rows = ov.jaccard_verified_rows(SF, ID_SHIFT, TAIL, 5, 64, 0.7, 5, 0.7)
    elif name == "langid_counts":
        rows = ov.langid_count_rows(SF)
    else:
        rows = ov.suffix_cleaned_rows(SF, ID_SHIFT, 100)
    assert got == {tuple(r) for r in rows}, name


@pytest.mark.parametrize("name", ["ann_lsh_topk", "ann_ivfpq_topk"])
def test_ann_board_rows_match_spark_queries_at_sf0001(spark, name):
    """The two seeded ANN paths (the last rows-only board queries through
    r3): driver-side brute-force re-derivation of the candidate sets and
    ranked windows — margin-audited so a last-ulp divergence in the
    distributed k-means avg can only OMIT the oracle, never mis-pin it."""
    import __spark_entry__ as e

    got = {tuple(r) for r in e.queries()[name](spark, SF).collect()}
    if name == "ann_lsh_topk":
        rows = ov.ann_lsh_topk_rows(SF, 10, 10, 8)
    else:
        rows = ov.ann_ivfpq_topk_rows(SF, 10, 32, 8, 8, 30)
    assert got == {tuple(r) for r in rows}, name


def test_ann_margin_audit_raises_not_mispins():
    """A corpus that genuinely sits on a decision boundary must raise
    OracleMarginError (-> entry omitted, query stays rows-only) rather
    than emit a row set that could disagree with Spark."""
    with pytest.raises(ov.OracleMarginError):
        ov._require_margin(0.0, "synthetic boundary")
    with pytest.raises(ov.OracleMarginError):
        ov._audit_round_boundary([0.1234565000000000001], "synthetic score")
    # entries vanish (not crash) when a builder raises
    import __spark_entry__ as e

    orig = ov.ann_lsh_topk_rows
    try:
        def boom(*a, **k):
            raise ov.OracleMarginError("forced")
        ov.ann_lsh_topk_rows = boom
        sqls = e._ann_board_oracles(ov, SF)
        assert "ann_lsh_topk" not in sqls and "ann_ivfpq_topk" in sqls
    finally:
        ov.ann_lsh_topk_rows = orig
