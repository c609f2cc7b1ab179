#!/usr/bin/env python
"""Local replica of the driver's correctness gate: run every
``queries()`` entry on Spark and its ``oracle_sql()`` on DuckDB over the
same parquet, compare row count + column names + order-insensitive
values. Usage: python scripts/check_oracles.py [sf_dir] [query ...]"""

from __future__ import annotations

import math
import sys
import time
from decimal import Decimal
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import duckdb  # noqa: E402

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def canon_cell(v):
    if v is None:
        return None
    # TYPE-SENSITIVE on numerics: the driver's value hash distinguishes
    # int64 from float64 (round 1: DuckDB windowed sum() → HUGEINT →
    # float64 vs Spark BIGINT hashed differently even though 1.0 == 1
    # compares equal in Python). Tag floats so the replica catches it.
    if isinstance(v, bool):
        return v
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return ("f", round(v, 6))
    if isinstance(v, Decimal):
        # DuckDB HUGEINT/DECIMAL via arrow — non-BIGINT, like the driver
        return ("f", round(float(v), 6))
    if isinstance(v, int):
        return ("i", v)
    if isinstance(v, (list, tuple)):
        return tuple(canon_cell(x) for x in v)
    if hasattr(v, "isoformat"):
        return v.isoformat()
    if isinstance(v, bytes):
        return v.hex()
    return v


def canon_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(canon_cell(r[i]) for i in order) for r in rows]
    return sorted(cols), sorted(out, key=lambda t: tuple(str(x) for x in t))


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    # lazy VALUES oracles (e.g. dedup_simhash) recompute over the corpus
    # at THIS sf — keep them pointed at the dir being checked
    import os

    os.environ["SPARK_GRAFT_ORACLE_SF_DIR"] = sf_dir

    from datamatcher_spark.queries_catalog import CATALOG
    from datamatcher_spark.session import get_spark

    spark = get_spark("oracle-check", master="local[8]", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    n_pass = n_fail = n_rows_only = 0
    for name, entry in CATALOG.items():
        if only and name not in only:
            continue
        t0 = time.monotonic()
        try:
            sdf = entry.spark(spark, sf_dir)
            s_rows = sdf.collect()
            s_cols = sdf.columns
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: spark error: {str(e)[:300]}")
            n_fail += 1
            continue
        if entry.sql is None:
            print(f"ROWS  {name}: {len(s_rows)} rows ({time.monotonic()-t0:.1f}s)")
            n_rows_only += 1
            continue
        try:
            # fetch through ARROW, not .df() and not fetchall():
            # - fetchall() hands HUGEINT back as a Python int, masking the
            #   type drift that slipped through in round 1;
            # - .df() widens nullable BIGINT columns containing NULLs to
            #   float64, creating FALSE ('f' vs 'i') mismatches, and its
            #   NaN round-trip conflated real float NaN with NULL.
            # Arrow preserves nullable int64 as int64 (NULL stays None in
            # to_pylist) while HUGEINT/DECIMAL surface as decimal.Decimal,
            # which canon_cell tags as float — so genuine type drift is
            # still caught.
            sql = entry.sql() if callable(entry.sql) else entry.sql
            tbl = con.execute(sql).arrow()
            d_cols = list(tbl.column_names)
            d_rows = [
                tuple(rec[c] for c in d_cols) for rec in tbl.to_pylist()
            ]
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: duckdb error: {str(e)[:300]}")
            n_fail += 1
            continue
        sc, sr = canon_rows(s_cols, [tuple(r) for r in s_rows])
        dc, dr = canon_rows(d_cols, d_rows)
        if sc != dc:
            print(f"FAIL  {name}: schema {sc} != {dc}")
            n_fail += 1
        elif len(sr) != len(dr):
            print(f"FAIL  {name}: rows {len(sr)} != {len(dr)}")
            n_fail += 1
        elif sr != dr:
            diff = [(a, b) for a, b in zip(sr, dr) if a != b][:3]
            print(f"FAIL  {name}: values differ, e.g. {diff}")
            n_fail += 1
        else:
            print(f"PASS  {name}: {len(sr)} rows ({time.monotonic()-t0:.1f}s)")
            n_pass += 1

    print(f"\n{n_pass} pass, {n_fail} fail, {n_rows_only} rows-only")
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
