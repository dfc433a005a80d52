#!/usr/bin/env python
"""Local emulation of the driver's correctness gate.

Runs every ``queries()`` entry on Spark and, where an ``oracle_sql()`` entry
exists, the same query on DuckDB over the identical parquet tables; compares
row count, sorted column names, and a value hash (columns sorted by name,
rows sorted, floats rounded to 6 decimals).
"""

from __future__ import annotations

import decimal
import hashlib
import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

import __spark_entry__ as entrymod

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def norm_cell(v):
    if v is None:
        return "NULL"
    if isinstance(v, decimal.Decimal):
        v = float(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return f"{v:.6f}"
    if isinstance(v, bool):
        return str(int(v))
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, list):
        return "[" + ",".join(norm_cell(x) for x in v) + "]"
    return str(v)


def value_hash(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted("|".join(norm_cell(r[i]) for i in order) for r in rows)
    h = hashlib.sha256()
    for line in lines:
        h.update(line.encode())
        h.update(b"\n")
    return h.hexdigest()[:16]


def main():
    from text_dedup_spark.sources.session import build_session

    spark = build_session(master="local[8]", shuffle_partitions=16,
                          app_name="correctness-check")

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    only = sys.argv[1:]
    fails = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        sdf = fn(spark, SF_DIR)
        srows = sdf.collect()
        scols = sdf.columns
        if name not in oracles:
            print(f"{name:28s} rows-only: {len(srows)} rows")
            continue
        ores = con.execute(oracles[name])
        ocols = [d[0] for d in ores.description]
        orows = ores.fetchall()
        ok_cols = sorted(scols) == sorted(ocols)
        ok_rows = len(srows) == len(orows)
        sh = value_hash(scols, [tuple(r) for r in srows])
        oh = value_hash(ocols, orows)
        ok_hash = sh == oh
        status = "OK" if (ok_cols and ok_rows and ok_hash) else "FAIL"
        if status == "FAIL":
            fails.append(name)
        print(f"{name:28s} {status}  rows {len(srows)}/{len(orows)} "
              f"cols={'=' if ok_cols else f'{sorted(scols)} vs {sorted(ocols)}'} "
              f"hash={'=' if ok_hash else f'{sh} vs {oh}'}")
    spark.stop()
    if fails:
        print("FAILURES:", fails)
        sys.exit(1)
    print("all oracled queries match")


if __name__ == "__main__":
    main()
