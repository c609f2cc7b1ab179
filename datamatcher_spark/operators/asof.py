"""As-of (backward) join — an operator Spark's DataFrame API lacks.

For each left row, attach the most recent right row with the same key
whose time is ≤ the left time. Implemented as a composition of existing
operators (SURVEY §2 custom-operator rule: composition first): tag and
union both sides, one window pass per key ordered by (time, tag) carries
the last-seen right payload forward, then keep left rows. ONE shuffle on
the key — the same cost as a regular join, no per-row Python, no range
explosion. (pandas ``merge_asof`` inside ``applyInPandas`` would be the
fallback for semantics this composition can't express, e.g. tolerance
windows — not needed here.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import StructField, StructType


def _null_struct(df: DataFrame, cols: list[str]):
    """Typed NULL struct literal matching ``df``'s columns — built from the
    actual schema objects (simpleString round-trips lose nested/char
    types)."""
    t = StructType(
        [StructField(c, df.schema[c].dataType, True) for c in cols]
    )
    return F.lit(None).cast(t)


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key_cols: list[str],
    left_time: str,
    right_time: str,
    right_payload: list[str] | None = None,
    prefix: str = "asof_",
) -> DataFrame:
    """Backward as-of join; right columns arrive null when no right row
    precedes the left row for that key."""
    payload = right_payload or [
        c for c in right.columns if c not in key_cols and c != right_time
    ]
    l_tag = left.select(
        *key_cols,
        F.col(left_time).alias("__t"),
        F.lit(1).alias("__is_left"),
        F.struct(*[F.col(c) for c in left.columns]).alias("__l"),
        _null_struct(right, payload + [right_time]).alias("__r"),
    )
    r_tag = right.select(
        *key_cols,
        F.col(right_time).alias("__t"),
        F.lit(0).alias("__is_left"),
        _null_struct(left, list(left.columns)).alias("__l"),
        F.struct(*[F.col(c) for c in payload + [right_time]]).alias("__r"),
    )
    # right rows sort before left rows at equal times (__is_left asc), so
    # a right row AT the left timestamp is visible to it (ts_left >= ts_right)
    w = (
        Window.partitionBy(*key_cols)
        .orderBy(F.col("__t").asc(), F.col("__is_left").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    merged = l_tag.unionByName(r_tag).withColumn(
        "__last_r", F.last("__r", ignorenulls=True).over(w)
    )
    out = merged.filter("__is_left = 1").select(
        *[F.col(f"__l.{c}").alias(c) for c in left.columns],
        *[F.col(f"__last_r.{c}").alias(prefix + c) for c in payload + [right_time]],
    )
    return out
