"""The reference's merge semantics as Catalyst expressions.

Write modes (core/mapping.py:11-19, decision table core/matcher.py:441-487),
conditional rule operators (core/mapping.py:40-127), change-type taxonomy
(core/matcher.py:17-24) — each a pure ``(current, new) → Column`` /
predicate builder, so an entire mapping chain compiles into one Spark
projection (no UDFs, no shuffles). Mapping priority order (core/
mapping.py:318-323) is preserved by folding mappings sequentially: later
mappings see earlier writes, exactly like the reference's in-place row
loop.

Everything is stringly-typed on purpose: the reference compares
``str(current) != str(new)`` and treats a sentinel list as empty; those
exact semantics are reproduced (SURVEY §2.9 hard part (d) — drifting here
silently changes F1/lineage).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from enum import Enum
from typing import Callable, Optional, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from datamatcher_spark.norm.keys import is_empty_expr, pystrip_expr
from datamatcher_spark.norm.transforms import template_expr, transform_expr


class WriteMode(str, Enum):
    OVERWRITE = "overwrite"
    FILL_EMPTY = "fill_empty"
    APPEND = "append"
    OVERWRITE_IF_DIFFERENT = "diff"
    OVERWRITE_IF_LONGER = "longer"
    OVERWRITE_IF_NOT_EMPTY = "not_empty"


# Human-readable mode names, exactly the reference's display strings
# (core/mapping.py:22-32 get_display_name) — they appear verbatim in the
# exported change-log artifact's 'tryb' column
WRITE_MODE_DISPLAY: dict["WriteMode", str] = {}


class ChangeType(str, Enum):
    UNCHANGED = "unchanged"
    NEW = "new"
    CHANGED = "changed"
    NO_MATCH = "no_match"
    CONFLICT = "conflict"
    SKIPPED = "skipped"


WRITE_MODE_DISPLAY.update(
    {
        WriteMode.OVERWRITE: "Nadpisz zawsze",
        WriteMode.FILL_EMPTY: "Uzupełnij puste",
        WriteMode.APPEND: "Dopisz",
        WriteMode.OVERWRITE_IF_DIFFERENT: "Nadpisz jeśli inne",
        WriteMode.OVERWRITE_IF_LONGER: "Nadpisz jeśli dłuższe",
        WriteMode.OVERWRITE_IF_NOT_EMPTY: "Nadpisz jeśli niepuste",
    }
)


def _str(c: Column) -> Column:
    return c.cast("string")


def _neq(cur: Column, new: Column) -> Column:
    """str(current) != str(new) with Python-ish null handling: the
    reference stringifies both sides ('None' vs value), so null != value."""
    return ~_str(cur).eqNullSafe(_str(new))


def should_write_expr(
    cur: Column,
    new: Column,
    mode: WriteMode,
    *,
    cur_empty: Column | None = None,
    new_empty: Column | None = None,
) -> tuple[Column, Column]:
    """(write?, change_type) column pair for a write mode — the decision
    table of core/matcher.py:441-487, row for row.

    ``cur_empty``/``new_empty``: optionally pass PRECOMPUTED emptiness
    flags (e.g. a boolean column from a prior projection). The sentinel
    check costs two regexp trims per side; when several modes stack over
    one row (write_modes_all explode), inlining it per mode multiplies
    that by 12 — precomputing keeps it at 2."""
    if cur_empty is None:
        cur_empty = is_empty_expr(cur)
    if new_empty is None:
        new_empty = is_empty_expr(new)
    t = lambda ct: F.lit(ct.value)  # noqa: E731

    if mode == WriteMode.OVERWRITE:
        write = cur_empty | _neq(cur, new)
        change = F.when(cur_empty, t(ChangeType.NEW)).when(
            _neq(cur, new), t(ChangeType.CHANGED)
        ).otherwise(t(ChangeType.UNCHANGED))
    elif mode == WriteMode.FILL_EMPTY:
        write = cur_empty & ~new_empty
        change = F.when(write, t(ChangeType.NEW)).otherwise(t(ChangeType.UNCHANGED))
    elif mode == WriteMode.APPEND:
        write = ~new_empty
        change = F.when(~new_empty & cur_empty, t(ChangeType.NEW)).when(
            ~new_empty, t(ChangeType.CHANGED)
        ).otherwise(t(ChangeType.UNCHANGED))
    elif mode == WriteMode.OVERWRITE_IF_DIFFERENT:
        write = _neq(cur, new)
        change = F.when(write & cur_empty, t(ChangeType.NEW)).when(
            write, t(ChangeType.CHANGED)
        ).otherwise(t(ChangeType.UNCHANGED))
    elif mode == WriteMode.OVERWRITE_IF_LONGER:
        # len(str(new) if new else "") — Python falsiness: None/'' → ''
        ln = F.when(new.isNull() | (_str(new) == ""), F.lit(0)).otherwise(
            F.length(_str(new))
        )
        lc = F.when(cur.isNull() | (_str(cur) == ""), F.lit(0)).otherwise(
            F.length(_str(cur))
        )
        write = ln > lc
        change = F.when(write & cur_empty, t(ChangeType.NEW)).when(
            write, t(ChangeType.CHANGED)
        ).otherwise(t(ChangeType.UNCHANGED))
    elif mode == WriteMode.OVERWRITE_IF_NOT_EMPTY:
        write = ~new_empty & (cur_empty | _neq(cur, new))
        change = F.when(~new_empty & cur_empty, t(ChangeType.NEW)).when(
            write, t(ChangeType.CHANGED)
        ).otherwise(t(ChangeType.UNCHANGED))
    else:
        raise ValueError(f"unknown write mode: {mode}")
    return write, change


def apply_write_mode(cur: Column, new: Column, mode: WriteMode,
                     append_separator: str = " | ",
                     *,
                     cur_empty: Column | None = None,
                     new_empty: Column | None = None) -> tuple[Column, Column]:
    """(result_value, change_type). APPEND concatenates like the reference
    (core/matcher.py:352-356): both non-empty → 'cur<sep>new'."""
    write, change = should_write_expr(
        cur, new, mode, cur_empty=cur_empty, new_empty=new_empty
    )
    if mode == WriteMode.APPEND:
        nonempty_cur = ~(is_empty_expr(cur) if cur_empty is None else cur_empty)
        value = F.when(
            write & nonempty_cur,
            F.concat(_str(cur), F.lit(append_separator), _str(new)),
        ).when(write, _str(new)).otherwise(_str(cur))
    else:
        value = F.when(write, _str(new)).otherwise(_str(cur))
    return value, change


class RuleOperator(str, Enum):
    EQUALS = "equals"
    NOT_EQUALS = "not_equals"
    CONTAINS = "contains"
    NOT_CONTAINS = "not_contains"
    STARTS_WITH = "starts_with"
    ENDS_WITH = "ends_with"
    IS_EMPTY = "is_empty"
    IS_NOT_EMPTY = "is_not_empty"
    GREATER_THAN = "gt"
    LESS_THAN = "lt"
    REGEX_MATCH = "regex"


def rule_predicate(op: RuleOperator, c: Column, value: str) -> Column:
    """Case-insensitive stringly predicates — core/mapping.py:82-127.
    The reference stringifies with '' for None (check_str = '' if null)."""
    s = F.coalesce(_str(c), F.lit(""))
    low = F.lower(s)
    v = value.lower()
    if op == RuleOperator.EQUALS:
        return low == F.lit(v)
    if op == RuleOperator.NOT_EQUALS:
        return low != F.lit(v)
    if op == RuleOperator.CONTAINS:
        return low.contains(v) if v else F.lit(True)
    if op == RuleOperator.NOT_CONTAINS:
        return ~low.contains(v) if v else F.lit(False)
    if op == RuleOperator.STARTS_WITH:
        return low.startswith(v)
    if op == RuleOperator.ENDS_WITH:
        return low.endswith(v)
    if op == RuleOperator.IS_EMPTY:
        return c.isNull() | (pystrip_expr(c) == "")
    if op == RuleOperator.IS_NOT_EMPTY:
        return c.isNotNull() & (pystrip_expr(c) != "")
    if op == RuleOperator.GREATER_THAN:
        # float-parse both sides; unparseable → False (mapping.py:111-115)
        return F.coalesce(s.try_cast("double") > F.lit(value).try_cast("double"),
                          F.lit(False))
    if op == RuleOperator.LESS_THAN:
        return F.coalesce(s.try_cast("double") < F.lit(value).try_cast("double"),
                          F.lit(False))
    if op == RuleOperator.REGEX_MATCH:
        return s.rlike(f"(?i){value}")
    raise ValueError(f"unknown rule operator: {op}")


@dataclass
class RuleCondition:
    column: str
    operator: RuleOperator
    value: str = ""
    is_source_column: bool = True

    def to_predicate(self, col_for: Callable[[str, bool], Column]) -> Column:
        return rule_predicate(self.operator, col_for(self.column, self.is_source_column),
                              self.value)


@dataclass
class ColumnMapping:
    """Declarative merge instruction — core/mapping.py:149-177 lifted to a
    Column-expression compiler."""

    source_column: str = ""
    target_column: str = ""
    write_mode: WriteMode = WriteMode.OVERWRITE
    transform: Optional[str] = None
    append_separator: str = " | "
    priority: int = 0
    enabled: bool = True
    output_name: str = ""
    source_template: str = ""
    conditions: Sequence[RuleCondition] = field(default_factory=tuple)
    condition_logic: str = "AND"
    # binds the mapping to a named source in a multi-source profile
    # (reference core/mapping.py:154 DataSource.id); "" → default source
    source_id: str = ""
    # 'x'-expression / lambda applied AFTER the named transform, exactly
    # like the reference (core/mapping.py:174, core/matcher.py:333-334);
    # compiled to Column expressions, error → passthrough
    custom_script: str = ""

    def source_value(self, src_col: Callable[[str], Column]) -> Column:
        if self.source_template:
            val = template_expr(self.source_template, src_col)
        else:
            val = src_col(self.source_column)
        val = transform_expr(self.transform, val)
        if self.custom_script:
            from datamatcher_spark.norm.custom_script import custom_script_expr

            val = custom_script_expr(self.custom_script, val)
        return val

    def condition_predicate(self, src_col: Callable[[str], Column],
                            tgt_col: Callable[[str], Column]) -> Column:
        if not self.conditions:
            return F.lit(True)
        preds = [
            c.to_predicate(lambda name, is_src: src_col(name) if is_src else tgt_col(name))
            for c in self.conditions
        ]
        combined = preds[0]
        for p in preds[1:]:
            combined = (combined | p) if self.condition_logic == "OR" else (combined & p)
        return combined


def apply_conflict_overrides(
    df: DataFrame,
    key_col: str,
    overrides: DataFrame,
    columns: Sequence[str],
    *,
    change_prefix: str = "__change_",
) -> DataFrame:
    """Apply user-chosen conflict winners to a merged frame.

    The reference resolves write conflicts interactively: the user picks
    the winning value per (row, column) and the engine patches the result
    frame in place (gui/dialogs/conflict_resolver.py:112-124,
    ``result_df.at[row_idx, target_col] = val``). The distributed form:
    ``overrides`` is a tiny long-format DataFrame
    ``(key, column, chosen_value)`` — pivoted to one row per key, then
    BROADCAST left-joined onto the big frame (override sets are human-
    sized by construction: a person clicked each one) and folded into the
    target columns. Lineage: patched cells get change type 'override' in
    the ``__change_<col>`` column (created or updated), so downstream
    change-count reports see exactly what the user forced.
    """
    ov_cols = {"key", "column", "chosen_value"}
    if not ov_cols <= set(overrides.columns):
        raise ValueError(f"overrides must have columns {sorted(ov_cols)}")
    # one row per key, one column per overridable target; values=columns
    # keeps the pivot single-pass (no distinct-scan job over overrides).
    # Deterministic winner on duplicate (key, column) rows: max_by over an
    # explicit ordering — a 'seq' column when provided (last click wins,
    # matching the reference's sequential in-place patches), else the
    # value itself (arbitrary but stable; F.first over unordered shuffle
    # output was nondeterministic). chosen_value rides inside a struct so
    # an explicit NULL ("blank this cell") survives the pivot: struct
    # non-null ⇒ an override row existed, struct.v NULL ⇒ blank the cell.
    order = (
        F.col("seq")
        if "seq" in overrides.columns
        else F.coalesce(F.col("chosen_value").cast("string"), F.lit(""))
    )
    wide = (
        overrides.filter(F.col("column").isin(list(columns)))
        .groupBy("key")
        .pivot("column", list(columns))
        .agg(F.max_by(F.struct(F.col("chosen_value").cast("string").alias("v")), order))
    )
    sel = [F.col("key").alias("__ov_key")] + [
        F.col(c).alias(f"__ov_{c}") for c in columns
    ]
    patched = df.join(
        F.broadcast(wide.select(*sel)),
        df[key_col].cast("string") == F.col("__ov_key").cast("string"),
        "left",
    )
    updates: dict[str, Column] = {}
    for c in columns:
        ov = F.col(f"__ov_{c}")
        # ov non-null ⇒ override exists; ov.v may be NULL ⇒ blank the cell
        updates[c] = F.when(ov.isNotNull(), ov["v"]).otherwise(
            F.col(c).cast("string")
        )
        chg = f"{change_prefix}{c}"
        prev = F.col(chg) if chg in df.columns else F.lit(ChangeType.UNCHANGED.value)
        updates[chg] = F.when(ov.isNotNull(), F.lit("override")).otherwise(prev)
    return patched.withColumns(updates).drop(
        "__ov_key", *[f"__ov_{c}" for c in columns]
    )


def apply_mappings(
    joined: DataFrame,
    mappings: Sequence[ColumnMapping],
    *,
    src_prefix: str = "src_",
    matched: Column | None = None,
    retain_old: bool = False,
    conflicts: Column | None = None,
) -> DataFrame:
    """Fold a mapping chain over an enrichment-joined DataFrame.

    ``joined`` holds base columns plus source columns prefixed with
    ``src_prefix`` (null when unmatched). Mappings run in priority order;
    each emits ``<target>`` (merged value) and ``__change_<target>``
    lineage. Unmatched rows keep their values with NO_MATCH lineage
    (core/matcher.py:226-229).

    ``retain_old=True`` additionally emits ``__old_<target>`` — the
    stringified PRE-write value — so the per-cell change-log artifact
    (reference core/reporter.py:118-136 ``export_change_log``) can be
    produced distributed; see ``report_render.change_log``. When several
    mappings stack on one target, the old value (like the change type)
    reflects the LAST mapping applied — the reference logs one CellChange
    per mapping, and the last one is the cell's final transition.

    ``conflicts``: optional per-row count of LOSING data-bearing source
    candidates (J3's ``__conflicts`` window — reference core/
    data_source.py:263-282 ``get_best_row_for_key`` alternatives count).
    When given, a cell that was WRITTEN (NEW/CHANGED) from a source key
    that carried extra candidates is stamped ``ChangeType.CONFLICT``
    instead — the engine-side twin of the reference's duplicate-conflict
    feed (core/matcher.py:262-282). Report counters treat 'conflict' as a
    change; the change-log export labels it 'zmieniona' like the
    reference (which applies the first candidate and logs the write).
    """
    if matched is None:
        matched = F.lit(True)
    df = joined
    for m in sorted([m for m in mappings if m.enabled], key=lambda m: m.priority):
        src = lambda name: F.col(src_prefix + name)  # noqa: E731
        tgt = lambda name: F.col(name)  # noqa: E731
        new_val = m.source_value(src)
        cond = m.condition_predicate(src, tgt)
        target = m.target_column
        cur = F.col(target) if target in df.columns else F.lit(None).cast("string")
        value, change = apply_write_mode(cur, new_val, m.write_mode, m.append_separator)
        if conflicts is not None:
            change = F.when(
                (F.coalesce(conflicts, F.lit(0)) > 0)
                & change.isin(ChangeType.NEW.value, ChangeType.CHANGED.value),
                F.lit(ChangeType.CONFLICT.value),
            ).otherwise(change)
        out_name = m.output_name or target
        # one withColumns call: ALL expressions bind against the pre-write
        # row — a chained withColumn would re-resolve `cur` against the
        # already-merged column and report every write as UNCHANGED
        updates = {
            out_name: F.when(~matched, cur.cast("string"))
            .when(cond, value)
            .otherwise(cur.cast("string")),
            f"__change_{out_name}": F.when(
                ~matched, F.lit(ChangeType.NO_MATCH.value)
            )
            .when(cond, change)
            .otherwise(F.lit(ChangeType.SKIPPED.value)),
        }
        if retain_old:
            updates[f"__old_{out_name}"] = cur.cast("string")
        df = df.withColumns(updates)
    return df
