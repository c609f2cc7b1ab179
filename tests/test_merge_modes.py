"""Write modes / rule operators / mapping fold vs reference semantics.

The write-mode oracle is transcribed from the decision table at
/root/reference/core/matcher.py:441-487 (matcher.py can't be imported
standalone — it has relative imports); rule conditions use the reference
``RuleCondition.evaluate`` directly.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from datamatcher_spark.operators.merge import (
    ChangeType,
    ColumnMapping,
    RuleCondition,
    RuleOperator,
    WriteMode,
    apply_mappings,
    apply_write_mode,
    rule_predicate,
)

VALUES = [None, "", "  ", "N/A", "brak", "x", "X", "abc", "abcdef", "1", "1.0",
          "long value here", "nan"]


def ref_is_empty(ref, v):
    return ref.kn.is_empty(v)


def ref_should_write(ref, cur, new, mode: WriteMode):
    """Oracle for core/matcher.py:441-487."""
    cur_empty, new_empty = ref_is_empty(ref, cur), ref_is_empty(ref, new)
    CT = ChangeType
    if mode == WriteMode.OVERWRITE:
        if cur_empty:
            return True, CT.NEW
        if str(cur) != str(new):
            return True, CT.CHANGED
        return False, CT.UNCHANGED
    if mode == WriteMode.FILL_EMPTY:
        return (True, CT.NEW) if cur_empty and not new_empty else (False, CT.UNCHANGED)
    if mode == WriteMode.APPEND:
        if not new_empty:
            return (True, CT.NEW) if cur_empty else (True, CT.CHANGED)
        return False, CT.UNCHANGED
    if mode == WriteMode.OVERWRITE_IF_DIFFERENT:
        if str(cur) != str(new):
            return (True, CT.NEW) if cur_empty else (True, CT.CHANGED)
        return False, CT.UNCHANGED
    if mode == WriteMode.OVERWRITE_IF_LONGER:
        if len(str(new) if new else "") > len(str(cur) if cur else ""):
            return (True, CT.NEW) if cur_empty else (True, CT.CHANGED)
        return False, CT.UNCHANGED
    if mode == WriteMode.OVERWRITE_IF_NOT_EMPTY:
        if not new_empty:
            if cur_empty:
                return True, CT.NEW
            if str(cur) != str(new):
                return True, CT.CHANGED
        return False, CT.UNCHANGED
    raise AssertionError(mode)


@pytest.mark.parametrize("mode", list(WriteMode))
def test_write_modes_match_reference(spark, ref, mode):
    rows = [(c, n) for c in VALUES for n in VALUES]
    df = spark.createDataFrame(rows, "cur string, new string")
    value, change = apply_write_mode(F.col("cur"), F.col("new"), mode, " | ")
    got = df.select("cur", "new", value.alias("v"), change.alias("ct")).collect()
    for r in got:
        write, ct = ref_should_write(ref, r.cur, r.new, mode)
        if write:
            if mode == WriteMode.APPEND and not ref_is_empty(ref, r.cur):
                expected_val = f"{r.cur} | {r.new}"
            else:
                expected_val = str(r.new) if r.new is not None else None
        else:
            expected_val = r.cur
        assert r.ct == ct.value, (mode, r.cur, r.new, r.ct, ct)
        assert r.v == expected_val, (mode, r.cur, r.new, r.v, expected_val)


RULE_CASES = [
    (RuleOperator.EQUALS, "ABC", ["abc", "ab", None, ""]),
    (RuleOperator.NOT_EQUALS, "abc", ["ABC", "x", None]),
    (RuleOperator.CONTAINS, "bc", ["abcd", "BCD", "x", None]),
    (RuleOperator.NOT_CONTAINS, "bc", ["abcd", "x", None]),
    (RuleOperator.STARTS_WITH, "ab", ["abc", "ba", None]),
    (RuleOperator.ENDS_WITH, "bc", ["abc", "cb", None]),
    (RuleOperator.IS_EMPTY, "", ["", "  ", "x", None]),
    (RuleOperator.IS_NOT_EMPTY, "", ["", "  ", "x", None]),
    (RuleOperator.GREATER_THAN, "5", ["6", "5", "4", "x", None, "5.5"]),
    (RuleOperator.LESS_THAN, "5", ["6", "4", "x", None]),
    (RuleOperator.REGEX_MATCH, "^a.c$", ["abc", "ABC", "abbc", None, "xabc"]),
]


@pytest.mark.parametrize("op,value,checks", RULE_CASES,
                         ids=[c[0].value for c in RULE_CASES])
def test_rule_operators_match_reference(spark, ref, op, value, checks):
    cond = ref.mp.RuleCondition(column="c", operator=ref.mp.RuleOperator(op.value),
                                value=value, is_source_column=True)
    expected = [cond.evaluate({}, {"c": v}) for v in checks]
    df = spark.createDataFrame([(v,) for v in checks], "c string")
    got = [r.p for r in df.select(rule_predicate(op, F.col("c"), value).alias("p")).collect()]
    assert got == expected


def test_mapping_fold_priority_and_conditions(spark):
    """Later mappings see earlier writes; conditions gate writes; unmatched
    rows get NO_MATCH."""
    df = spark.createDataFrame(
        [
            ("r1", "old", "newA", "premium", True),
            ("r2", None, "newB", "basic", True),
            ("r3", "keep", "newC", "premium", False),
        ],
        "id string, title string, src_title string, src_tier string, matched boolean",
    )
    mappings = [
        ColumnMapping(source_column="title", target_column="title",
                      write_mode=WriteMode.FILL_EMPTY, priority=1),
        ColumnMapping(
            source_column="title", target_column="title",
            write_mode=WriteMode.APPEND, append_separator=" + ", priority=2,
            conditions=[RuleCondition("tier", RuleOperator.EQUALS, "premium")],
        ),
    ]
    out = apply_mappings(df, mappings, matched=F.col("matched"))
    rows = {r.id: r for r in out.collect()}
    # r1: fill_empty skipped (non-empty), append fires (premium): old + newA
    assert rows["r1"].title == "old + newA"
    assert rows["r1"]["__change_title"] == "changed"
    # r2: fill_empty fires (NEW), append condition false (basic) → SKIPPED
    assert rows["r2"].title == "newB"
    assert rows["r2"]["__change_title"] == "skipped"
    # r3: unmatched → untouched, NO_MATCH
    assert rows["r3"].title == "keep"
    assert rows["r3"]["__change_title"] == "no_match"
