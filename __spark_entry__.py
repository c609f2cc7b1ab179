"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship near-dup clustering over the sf0.001
documents table. ``queries()`` / ``oracle_sql()`` — one entry per
implemented operator from SURVEY.md §2 plus the training-data operator
families (dedup / similarity search / text analysis); each Spark
DataFrame query is paired with ANSI SQL DuckDB runs on the same parquet
for row-count + schema + value-hash comparison. Deterministic seeded
operators (MinHash-LSH, SimHash, IVF ANN) are paired via LAZY VALUES
oracles — a pure-Python recompute over the same parquet, resolved inside
``oracle_sql()``. Those recomputes read the driver's correctness scale
factor, /root/testdata/sf0.01, by default; a driver comparing at any
other SF must export ``SPARK_GRAFT_ORACLE_SF_DIR=<sf_dir>`` before
calling ``oracle_sql()`` (scripts/check_oracles.py does).

Implementation lives in datamatcher_spark.queries_catalog; this module
stays a thin adapter so the driver import is cheap.
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, str(Path(__file__).resolve().parent))

from datamatcher_spark.queries_catalog import CATALOG, flagship  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: fingerprint + MinHash near-dup clustering of the sf0.001
    documents table (runs the blocking → pair → cluster path end to end)."""
    return flagship(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: entry.spark for name, entry in CATALOG.items()}


def oracle_sql() -> dict[str, str]:
    # a callable sql is a LAZY oracle (VALUES built by a Python recompute
    # over the corpus) — resolved here, once, at driver-compare time
    return {
        name: entry.sql() if callable(entry.sql) else entry.sql
        for name, entry in CATALOG.items()
        if entry.sql is not None
    }
