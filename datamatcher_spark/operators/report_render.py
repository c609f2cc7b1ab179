"""Human-readable run report — the reference's summary artifact
(core/reporter.py:22-89 ``generate_summary``, 138-149 ``save_report``,
93-117 ``export_unmatched``) assembled from ONE DataFrame aggregation
pass instead of a per-row CellChange list.

The reference walks a Python list of cell changes accumulated during the
merge; at 100 TB there is no such list — the lineage lives in the
``__change_<col>`` columns the merge operators emit, so every number in
the report folds out of a single ``agg`` over the merged frame (plus one
bounded top-50 collect for the unmatched-key preview). Section structure,
labels, and numbers mirror the reference artifact; documented drift: the
unmatched-key preview is sorted (a distributed frame has no "first 50 in
file order"), and the unmatched CSV has no ``wiersz_w_pliku`` row index
(no stable row numbers at scale).
"""

from __future__ import annotations

import datetime as dt
from functools import reduce
from operator import or_
from pathlib import Path

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from datamatcher_spark.operators.merge import (
    WRITE_MODE_DISPLAY,
    ChangeType,
    WriteMode,
)
from datamatcher_spark.sources.ingest import write_csv_report

# 'conflict' only ever appears when the merge opted into conflict
# stamping (apply_mappings(conflicts=...)); a conflict-stamped cell WAS
# written (reference applies the first candidate), so every counter and
# export here treats it as a change
_CHANGED = (
    ChangeType.NEW.value,
    ChangeType.CHANGED.value,
    ChangeType.CONFLICT.value,
)


def collect_run_stats(
    merged: DataFrame,
    key_col: str,
    *,
    change_prefix: str = "__change_",
    unmatched_preview: int = 50,
) -> dict:
    """All report numbers in ONE scan: total rows, rows with changes,
    per-mapping changed-cell counts, no-match rows, distinct unmatched
    keys — then one bounded limit-collect for the key preview."""
    change_cols = sorted(c for c in merged.columns if c.startswith(change_prefix))

    def is_changed(c: str):
        return F.col(c).isin(*_CHANGED)

    aggs = [F.count("*").alias("total_rows")]
    if change_cols:
        any_change = reduce(or_, [is_changed(c) for c in change_cols])
        any_no_match = reduce(
            or_, [F.col(c) == ChangeType.NO_MATCH.value for c in change_cols]
        )
        aggs += [
            F.count_if(any_change).alias("rows_with_changes"),
            F.count_if(any_no_match).alias("rows_no_match"),
            F.count_distinct(
                F.when(any_no_match, F.col(key_col).cast("string"))
            ).alias("unmatched_key_count"),
        ]
        aggs += [
            F.count_if(is_changed(c)).alias(f"__chg_{i}")
            for i, c in enumerate(change_cols)
        ]
    row = merged.agg(*aggs).first()

    per_mapping = {
        c[len(change_prefix):]: row[f"__chg_{i}"]
        for i, c in enumerate(change_cols)
    }
    stats = {
        "total_rows": row["total_rows"],
        "rows_with_changes": row["rows_with_changes"] if change_cols else 0,
        "rows_no_match": row["rows_no_match"] if change_cols else 0,
        "unmatched_key_count": row["unmatched_key_count"] if change_cols else 0,
        "cells_total_modified": sum(per_mapping.values()),
        "cells_changed_by_target": per_mapping,
        "unmatched_keys": [],
    }
    if change_cols and stats["unmatched_key_count"]:
        any_no_match = reduce(
            or_, [F.col(c) == ChangeType.NO_MATCH.value for c in change_cols]
        )
        # NULL base keys are excluded here to stay consistent with
        # unmatched_key_count (count_distinct skips NULL) — and a None in
        # this list would crash the ', '.join in generate_summary
        stats["unmatched_keys"] = [
            r.k
            for r in merged.filter(any_no_match & F.col(key_col).isNotNull())
            .select(F.col(key_col).cast("string").alias("k"))
            .distinct()
            .orderBy("k")
            .limit(unmatched_preview)
            .collect()
        ]
    return stats


def generate_summary(
    stats: dict,
    base_filename: str,
    base_key_column: str,
    sources_info: list[dict],
    mappings_info: list[dict],
    *,
    timestamp: dt.datetime | None = None,
) -> str:
    """Render the reference's text report from precomputed stats.

    ``sources_info``: dicts with filename, key_column, matched, total_base.
    ``mappings_info``: dicts with source_column, target_column, write_mode,
    cells_changed (fill from ``stats['cells_changed_by_target']``).
    ``timestamp`` is injectable so golden-file tests are deterministic.
    """
    ts = timestamp or dt.datetime.now()
    lines = [
        "═" * 70,
        "                    RAPORT DATAMATCHER",
        f"                    {ts.strftime('%Y-%m-%d %H:%M:%S')}",
        "═" * 70,
        "",
        f"PLIK BAZOWY: {base_filename}",
        f"KLUCZ: {base_key_column}",
        f"WIERSZY: {stats.get('total_rows', 0):,}",
        "",
        "ŹRÓDŁA DANYCH:",
    ]
    for i, src in enumerate(sources_info, 1):
        matched = src.get("matched", 0)
        total = src.get("total_base", 0)
        pct = (matched / total * 100) if total > 0 else 0
        lines.append(f"  {i}. {src['filename']} (klucz: {src['key_column']})")
        lines.append(f"     Dopasowano: {matched:,} / {total:,} ({pct:.1f}%)")
        lines.append("")

    lines.append("WYKONANE MAPOWANIA:")
    lines.append("  ┌────┬─────────────────────┬─────────────────┬────────────────┐")
    lines.append("  │ Nr │ Źródło → Cel        │ Tryb            │ Zmienionych    │")
    lines.append("  ├────┼─────────────────────┼─────────────────┼────────────────┤")
    for i, m in enumerate(mappings_info, 1):
        source_target = f"{m['source_column'][:8]} → {m['target_column'][:8]}"
        mode = str(m["write_mode"])[:15]
        changed = m.get("cells_changed", 0)
        lines.append(
            f"  │ {i:<2} │ {source_target:<19} │ {mode:<15} │ {changed:>14,} │"
        )
    lines.append("  └────┴─────────────────────┴─────────────────┴────────────────┘")
    lines.append("")
    lines.append("PODSUMOWANIE:")

    total = stats.get("total_rows", 0)
    with_changes = stats.get("rows_with_changes", 0)
    no_match = stats.get("rows_no_match", 0)
    cells_mod = stats.get("cells_total_modified", 0)
    pct_changed = (with_changes / total * 100) if total > 0 else 0
    pct_no_match = (no_match / total * 100) if total > 0 else 0
    lines.append(f"  • Wierszy przetworzonych: {total:,}")
    lines.append(f"  • Wierszy ze zmianami: {with_changes:,} ({pct_changed:.1f}%)")
    lines.append(f"  • Komórek zmodyfikowanych: {cells_mod:,}")
    lines.append(f"  • Wierszy bez dopasowania: {no_match:,} ({pct_no_match:.1f}%)")

    if stats.get("unmatched_keys"):
        n_unmatched = stats.get("unmatched_key_count", len(stats["unmatched_keys"]))
        lines.append("")
        lines.append("NIEDOPASOWANE KLUCZE (pierwsze 50):")
        lines.append(f"  {', '.join(stats['unmatched_keys'][:50])}")
        if n_unmatched > 50:
            lines.append(f"  (i {n_unmatched - 50} więcej...)")

    lines.append("")
    lines.append("═" * 70)
    return "\n".join(lines)


def save_report(
    filepath: str | Path,
    stats: dict,
    base_filename: str,
    base_key_column: str,
    sources_info: list[dict],
    mappings_info: list[dict],
    *,
    timestamp: dt.datetime | None = None,
) -> None:
    """Write the full text report (reference core/reporter.py:138-149)."""
    Path(filepath).write_text(
        generate_summary(
            stats, base_filename, base_key_column, sources_info,
            mappings_info, timestamp=timestamp,
        ),
        encoding="utf-8",
    )


def change_log(
    merged: DataFrame,
    key_col: str,
    mappings_info: list[dict],
    *,
    change_prefix: str = "__change_",
    old_prefix: str = "__old_",
    row_index_col: str | None = None,
) -> DataFrame:
    """The reference's per-cell change-log artifact as a DataFrame
    (core/reporter.py:118-136 ``export_change_log``): one row per
    modified cell — (kolumna, klucz, wartosc_przed, wartosc_po, zrodlo,
    tryb, typ_zmiany), NEW/CHANGED cells only.

    The reference walks its in-memory CellChange list; at scale the same
    rows fold out of the merged frame itself, provided the merge ran with
    ``apply_mappings(..., retain_old=True)`` so each target carries its
    pre-write value in ``__old_<target>``. The unpivot is ONE projection
    (array-of-structs explode) + a filter — no shuffle, no per-row
    Python. Documented drift from the artifact: no ``wiersz`` file-row
    index (a distributed frame has no stable row numbers; ``klucz``
    identifies the row) — same drift as the unmatched-keys CSV.

    ``mappings_info`` dicts need ``target_column`` (or ``output_name``),
    ``write_mode`` (WriteMode or its value) and optionally
    ``source_name``. Mappings stacked on the SAME resolved target are
    deduplicated keeping the LAST one — matching ``apply_mappings``' fold
    order, where only the final transition survives in the
    ``__old_``/``__change_`` columns; emitting a row per stacked mapping
    would duplicate identical before/after values under each mapping's
    labels.

    ``row_index_col``: desktop-parity hook for the reference's ``wiersz``
    file-row index (core/reporter.py:123) — name a column carrying a
    stable row number (e.g. loaded with the file, or a monotonic id
    stamped at ingest) and it is emitted as ``wiersz`` after ``klucz``.
    Default None: no such column exists in a distributed frame, ``klucz``
    identifies the row (documented drift).
    """
    by_target: dict[str, dict] = {}
    for m in mappings_info:
        by_target[m.get("output_name") or m["target_column"]] = m
    structs = []
    for tgt, m in by_target.items():
        chg, old = f"{change_prefix}{tgt}", f"{old_prefix}{tgt}"
        if tgt not in merged.columns or chg not in merged.columns:
            continue
        mode = m.get("write_mode", "")
        if not isinstance(mode, WriteMode):
            try:
                mode = WriteMode(str(mode))
            except ValueError:
                mode = None
        tryb = WRITE_MODE_DISPLAY.get(mode, str(m.get("write_mode", "")))
        old_col = (
            F.col(old).cast("string")
            if old in merged.columns
            else F.lit(None).cast("string")
        )
        structs.append(
            F.struct(
                F.lit(tgt).alias("kolumna"),
                old_col.alias("wartosc_przed"),
                F.col(tgt).cast("string").alias("wartosc_po"),
                F.lit(m.get("source_name", "")).alias("zrodlo"),
                F.lit(tryb).alias("tryb"),
                F.col(chg).alias("ct"),
            )
        )
    wiersz = (
        [F.col(row_index_col).cast("long").alias("wiersz")]
        if row_index_col
        else []
    )
    if not structs:
        return merged.sparkSession.createDataFrame(
            [],
            "kolumna string, klucz string, "
            + ("wiersz long, " if row_index_col else "")
            + "wartosc_przed string, "
            "wartosc_po string, zrodlo string, tryb string, typ_zmiany string",
        )
    return (
        merged.select(
            F.col(key_col).cast("string").alias("klucz"),
            *wiersz,
            F.explode(F.array(*structs)).alias("c"),
        )
        .filter(F.col("c.ct").isin(*_CHANGED))
        .select(
            F.col("c.kolumna").alias("kolumna"),
            "klucz",
            *(["wiersz"] if row_index_col else []),
            F.col("c.wartosc_przed").alias("wartosc_przed"),
            F.col("c.wartosc_po").alias("wartosc_po"),
            F.col("c.zrodlo").alias("zrodlo"),
            F.col("c.tryb").alias("tryb"),
            F.when(F.col("c.ct") == ChangeType.NEW.value, F.lit("nowa"))
            .otherwise(F.lit("zmieniona"))
            .alias("typ_zmiany"),
        )
    )


def export_change_log(
    merged: DataFrame,
    key_col: str,
    mappings_info: list[dict],
    path: str | Path,
    **kwargs,
) -> None:
    """Write the change-log CSV distributed (reference reporter.py:136
    ``df.to_csv``)."""
    write_csv_report(change_log(merged, key_col, mappings_info, **kwargs), path)


def export_unmatched(
    merged: DataFrame,
    key_col: str,
    path: str | Path,
    *,
    change_prefix: str = "__change_",
) -> None:
    """Unmatched-keys CSV (reference core/reporter.py:93-117) — distinct
    base keys whose row matched no source, written distributed."""
    change_cols = [c for c in merged.columns if c.startswith(change_prefix)]
    if not change_cols:
        return
    any_no_match = reduce(
        or_, [F.col(c) == ChangeType.NO_MATCH.value for c in change_cols]
    )
    write_csv_report(
        merged.filter(any_no_match & F.col(key_col).isNotNull())
        .select(F.col(key_col).cast("string").alias("klucz_bazowy"))
        .distinct(),
        path,
    )
