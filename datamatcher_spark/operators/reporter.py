"""Reporting aggregations (SURVEY §2.4 A1-A7) — execution stats, key
stats, match rates — as single-pass DataFrame aggregates over data or
lineage tables (reference: core/matcher.py:489-510, utils/
key_normalizer.py:179-223, core/reporter.py)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from datamatcher_spark.norm.keys import is_empty_expr, normalize_key_expr


def change_type_counts(lineage: DataFrame, change_col: str) -> DataFrame:
    """A1/A7 — counts by change type."""
    return lineage.groupBy(F.col(change_col).alias("change_type")).agg(
        F.count("*").alias("n")
    )


def key_stats(df: DataFrame, key_col: str, key_options: dict | None = None) -> DataFrame:
    """A2 — total / unique / duplicated / empty over the normalized key
    (one row). Mirrors get_key_stats (key_normalizer.py:179-223)."""
    nk = normalize_key_expr(F.col(key_col), **(key_options or {}))
    # ONE scan + ONE shuffle: group by the normalized key INCLUDING nulls
    # (empty keys normalize to NULL), then fold the per-key counts into
    # all four stats in a single final aggregate. The previous version
    # scanned the table twice (per-key pass + totals pass) and
    # cross-joined — at 100 TB that is two full reads for one report row.
    # r7: _spread the raw key column first — the input tables ship as
    # single-row-group parquet, so without it the normalize (and the
    # partial aggregate) runs on ONE task (see operators/dedup._spread)
    from datamatcher_spark.operators.dedup import _spread

    per_key = _spread(df.select(F.col(key_col))).select(
        nk.alias("k")
    ).groupBy("k").agg(
        F.count("*").alias("c")
    )
    return per_key.agg(
        F.coalesce(F.sum("c"), F.lit(0)).alias("total_rows"),
        F.count_if(F.col("k").isNotNull()).alias("unique_keys"),
        F.count_if(F.col("k").isNotNull() & (F.col("c") > 1)).alias(
            "duplicated_keys"
        ),
        F.coalesce(
            F.sum(F.when(F.col("k").isNull(), F.col("c"))), F.lit(0)
        ).alias("empty_keys"),
    ).select("total_rows", "unique_keys", "duplicated_keys", "empty_keys")


def uniqueness_profile(df: DataFrame, columns: list[str] | None = None) -> DataFrame:
    """A6 — per-column distinct/non-null ratio in ONE pass (key-column
    auto-detection signal, key_normalizer.py:156-174). Output long-form:
    (column, uniqueness)."""
    cols = columns or df.columns
    wide = df.agg(
        *[
            (F.count_distinct(F.col(c)) / F.count(F.col(c))).alias(c)
            for c in cols
        ]
    )
    stack = ", ".join(f"'{c}', `{c}`" for c in cols)
    return wide.selectExpr(
        f"stack({len(cols)}, {stack}) as (column, uniqueness)"
    ).select("column", F.round("uniqueness", 6).alias("uniqueness"))


def duplicate_key_count(df: DataFrame, key_col: str,
                        key_options: dict | None = None) -> DataFrame:
    """A3 — number of normalized keys appearing more than once."""
    nk = normalize_key_expr(F.col(key_col), **(key_options or {}))
    return (
        df.select(nk.alias("k"))
        .groupBy("k").agg(F.count("*").alias("c"))
        .agg(F.count_if(F.col("c") > 1).alias("duplicate_keys"))
    )


def empty_key_count(df: DataFrame, key_col: str) -> DataFrame:
    """A4 — sentinel-aware empty count."""
    return df.agg(
        F.count_if(is_empty_expr(F.col(key_col))).alias("empty_keys")
    )
