"""Result finalization + soft validation (SURVEY §2.2 P6-P8, §2.8).

The reference reorders output columns (unmapped base columns first, then
mapped targets in mapping order — core/matcher.py:391-417), renames via
``output_name`` (:419-428), previews with change-type filters (:512-526),
and soft-validates types with warnings, never errors (:148-174)."""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# the reference's three accepted date shapes (core/matcher.py:163-168)
DATE_PATTERNS = [
    r"^\d{4}-\d{2}-\d{2}",          # ISO
    r"^\d{2}[./-]\d{2}[./-]\d{4}",  # EU
    r"^\d{2}[./-]\d{2}[./-]\d{2}$", # short
]


def reorder_columns(df: DataFrame, mapped_targets: Sequence[str]) -> DataFrame:
    """P6 — unmapped columns first (original order), then mapped targets in
    mapping order; lineage columns stay last."""
    mapped = [c for c in mapped_targets if c in df.columns]
    lineage = [c for c in df.columns if c.startswith("__")]
    unmapped = [c for c in df.columns if c not in mapped and c not in lineage]
    return df.select(*unmapped, *mapped, *lineage)


def rename_outputs(df: DataFrame, rename_map: dict[str, str]) -> DataFrame:
    """P7 — output_name aliasing."""
    return df.withColumnsRenamed(rename_map)


def preview(df: DataFrame, n: int = 100, *, change_filter: str | None = None,
            search: str | None = None, hard_cap: int = 2000) -> DataFrame:
    """P8/P9 — bounded preview with change-type filter and whole-row
    substring search (gui/panels/preview_panel.py:240-290)."""
    out = df
    if change_filter and change_filter != "all":
        change_cols = [c for c in df.columns if c.startswith("__change_")]
        if change_cols:
            pred = F.lit(False)
            for c in change_cols:
                pred = pred | (F.col(c) == change_filter)
            out = out.filter(pred)
    if search:
        out = out.filter(
            F.lower(F.concat_ws(" ", *[F.col(c).cast("string") for c in df.columns]))
            .contains(search.lower())
        )
    return out.limit(min(n, hard_cap))


def validate_number_expr(c: Column) -> Column:
    """Soft number validation: True = OK. The reference float-parses after
    ','→'.' replacement; empties pass (warnings only on real values)."""
    s = F.replace(F.trim(c.cast("string")), F.lit(","), F.lit("."))
    return c.isNull() | (F.trim(c.cast("string")) == "") | s.try_cast("double").isNotNull()


def validate_date_expr(c: Column) -> Column:
    """Soft date validation against the reference's regex shapes."""
    s = F.trim(c.cast("string"))
    ok = F.lit(False)
    for pat in DATE_PATTERNS:
        ok = ok | s.rlike(pat)
    return c.isNull() | (s == "") | ok


def validation_warnings(df: DataFrame, column: str, expected_type: str) -> DataFrame:
    """Aggregate warning counts per column/type — the lineage-table shape
    of the reference's warning list (stringly, never failing the job)."""
    if expected_type == "number":
        ok = validate_number_expr(F.col(column))
    elif expected_type == "date":
        ok = validate_date_expr(F.col(column))
    else:  # 'string' or unknown → everything valid
        ok = F.lit(True)
    return df.agg(
        F.lit(column).alias("column"),
        F.lit(expected_type).alias("expected_type"),
        F.count_if(~ok).alias("warning_count"),
        F.count("*").alias("total_rows"),
    )
