"""The reference's enrichment join family (SURVEY §2.3 J1-J9) as
DataFrame compositions.

The desktop engine probes a per-source hash index row by row
(core/matcher.py:211-299). Here the same semantics are one declarative
join pipeline: variant-expand the source ("index") side, pick the best
row per key per target column with a window, left-join the base, and
derive lineage columns — Catalyst then chooses broadcast vs shuffled
hash join by size, which is exactly the build/probe asymmetry the
reference hand-rolled.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from datamatcher_spark.norm.keys import (
    ean_variants_expr,
    is_empty_expr,
    normalize_key_expr,
    probe_key_expr,
)


def build_variant_index(source: DataFrame, key_column: str,
                        expand_ean_variants: bool = True) -> DataFrame:
    """J1 — the build side: one row per (variant key, source row), with
    ``__src_order`` preserving file order (duplicate strategy 'first')."""
    src = source.withColumn("__src_order", F.monotonically_increasing_id())
    key = F.col(key_column)
    if expand_ean_variants:
        keys = ean_variants_expr(key)
    else:
        keys = F.array(probe_key_expr(key))
    return (
        src.withColumn("__bk", F.explode(keys))
        .filter(F.col("__bk").isNotNull() & (F.col("__bk") != ""))
    )


def best_row_per_key(index: DataFrame, target_column: str) -> DataFrame:
    """J3 — duplicate-aware best row: among rows sharing a key, prefer the
    first (by source order) whose target column has data; count the other
    data-bearing rows as conflicts (core/data_source.py:231-270)."""
    has_data = (~is_empty_expr(F.col(target_column))).cast("int")
    w = Window.partitionBy("__bk").orderBy(F.desc("__has_data"), F.asc("__src_order"))
    wc = Window.partitionBy("__bk")
    return (
        index.withColumn("__has_data", has_data)
        .withColumn("__conflicts",
                    F.greatest(F.sum("__has_data").over(wc) - 1, F.lit(0)))
        .withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn", "__has_data", "__src_order")
    )


def enrich_join(
    base: DataFrame,
    source: DataFrame,
    base_key: str,
    source_key: str,
    target_column: str,
    *,
    key_options: dict | None = None,
    src_prefix: str = "src_",
) -> DataFrame:
    """J2 — left-outer enrichment lookup: normalize the probe key, join the
    best-row variant index, prefix source columns. Adds ``__matched`` and
    ``__conflicts`` lineage columns."""
    opts = key_options or {}
    probe = normalize_key_expr(F.col(base_key), **opts)
    idx = best_row_per_key(build_variant_index(source, source_key), target_column)
    idx = idx.select(
        F.col("__bk"),
        F.col("__conflicts"),
        *[F.col(c).alias(src_prefix + c) for c in source.columns],
    )
    joined = base.withColumn("__bk", probe).join(idx, "__bk", "left")
    return joined.withColumn(
        "__matched", F.col(src_prefix + source_key).isNotNull() | F.col("__conflicts").isNotNull()
    ).drop("__bk")


def anti_join_unmatched(base: DataFrame, source: DataFrame, base_key: str,
                        source_key: str, key_options: dict | None = None) -> DataFrame:
    """J8 — rows of base whose key has no source match (unmatched export,
    core/reporter.py:92-116)."""
    opts = key_options or {}
    probe = normalize_key_expr(F.col(base_key), **opts)
    idx = build_variant_index(source, source_key).select("__bk").distinct()
    return base.withColumn("__bk", probe).join(idx, "__bk", "left_anti").drop("__bk")


def match_stats(base: DataFrame, source: DataFrame, base_key: str, source_key: str,
                key_options: dict | None = None) -> dict:
    """J9/A5 — match-rate via semi-join count (core/data_source.py:324-350)."""
    opts = key_options or {}
    probe = normalize_key_expr(F.col(base_key), **opts)
    keyed = base.withColumn("__bk", probe).filter(F.col("__bk").isNotNull())
    idx = build_variant_index(source, source_key).select("__bk").distinct()
    total = keyed.count()
    matched = keyed.join(idx, "__bk", "left_semi").count()
    return {
        "matched": matched,
        "unmatched": total - matched,
        "total_base": total,
        "match_percent": (matched / total * 100) if total else 0.0,
    }


def fuzzy_enrich_candidates(
    base: DataFrame,
    source: DataFrame,
    base_key: str,
    source_key: str,
    *,
    threshold: float = 0.85,
    block_expr: Column | None = None,
) -> DataFrame:
    """J4 — fuzzy fallback as a blocked similarity join: candidate pairs
    pruned by the reference's cheap filters (first char match OR length
    delta ≤ 2 — utils/fuzzy_matcher.py:79-87), scored with the built-in
    Levenshtein ratio, best match per base key kept (O4 argmax)."""
    from datamatcher_spark.functions.similarity import levenshtein_sim_expr

    b = base.select(F.lower(probe_key_expr(F.col(base_key))).alias("probe")).distinct()
    s = source.select(F.lower(probe_key_expr(F.col(source_key))).alias("cand")).distinct()
    # The reference prunes with `first char matches OR |len delta| ≤ 2`
    # (utils/fuzzy_matcher.py:79-87). A crossJoin + filter would be a
    # cartesian scan at scale; instead each disjunct becomes an
    # equi-join blocking key — key side exploded to (first-char) ∪
    # (length-bucket ± neighbors), then a hash join per key. Same
    # candidate set, zero cartesian products.
    def keyed(df: DataFrame, col: str, expand: bool) -> DataFrame:
        first = F.concat(F.lit("c:"), F.substring(col, 1, 1))
        if expand:  # probe side carries one key per admissible length
            lens = F.array(*[
                F.concat(F.lit("l:"), (F.length(col) + d).cast("string"))
                for d in (-2, -1, 0, 1, 2)
            ])
        else:
            lens = F.array(F.concat(F.lit("l:"), F.length(col).cast("string")))
        return df.withColumn("__fk", F.explode(F.concat(F.array(first), lens)))

    pruned = (
        keyed(b, "probe", expand=True)
        .join(keyed(s, "cand", expand=False), "__fk")
        .drop("__fk")
        .dropDuplicates(["probe", "cand"])
    )
    if block_expr is not None:
        pruned = pruned.filter(block_expr)
    scored = pruned.withColumn(
        "sim", levenshtein_sim_expr(F.col("probe"), F.col("cand"))
    ).filter(F.col("sim") >= threshold)
    w = Window.partitionBy("probe").orderBy(F.desc("sim"), F.asc("cand"))
    return scored.withColumn("__rn", F.row_number().over(w)).filter("__rn = 1").drop("__rn")
