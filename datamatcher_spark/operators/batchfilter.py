"""Row-subset batch filters (SURVEY §2.2 P1-P4) — the reference's
BatchFilter (utils/session.py:101-148) as predicate/limit pushdowns."""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def filter_range(df: DataFrame, order_col: str, start: int, end: int) -> DataFrame:
    """P1 — keep rows with start ≤ row_index ≤ end (0-based, ordered by
    ``order_col`` for determinism; the reference uses file order)."""
    w = Window.orderBy(F.col(order_col))
    return (
        df.withColumn("__rn", F.row_number().over(w) - 1)
        .filter((F.col("__rn") >= start) & (F.col("__rn") <= end))
        .drop("__rn")
    )


def filter_key_list(df: DataFrame, key_col: str, keys: Sequence[str]) -> DataFrame:
    """P2 — key ∈ list. Small lists fold to an ``isin`` (pushed to the
    scan); big lists should broadcast-semi-join instead."""
    if len(keys) <= 1000:
        return df.filter(F.col(key_col).cast("string").isin([str(k) for k in keys]))
    spark = df.sparkSession
    keys_df = spark.createDataFrame([(str(k),) for k in keys], ["__k"])
    return df.join(
        F.broadcast(keys_df),
        F.col(key_col).cast("string") == F.col("__k"),
        "left_semi",
    )


def filter_limit(df: DataFrame, n: int, order_col: str | None = None) -> DataFrame:
    """P3 — first N rows (ordered when determinism matters)."""
    return (df.orderBy(order_col) if order_col else df).limit(n)


def filter_key_regex(df: DataFrame, key_col: str, pattern: str) -> DataFrame:
    """P4 — re.search(pattern, key, IGNORECASE) (utils/session.py:141-146)."""
    return df.filter(F.col(key_col).cast("string").rlike(f"(?i){pattern}"))
