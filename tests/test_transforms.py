"""Transform registry vs the reference TRANSFORMS executed as oracles.

The engine is stringly-typed like the reference: we compare the
*stringified* outputs (str(x) on the oracle side), since the reference
writes every result back into object-dtype pandas columns.
"""

from __future__ import annotations

import pytest

from datamatcher_spark.norm.transforms import (
    TRANSFORMS,
    template_expr,
    value_mapping_expr,
)
from tests.conftest import spark_one_col

STRINGS = [
    None,
    "",
    "  padded  ",
    "Hello World",
    "hello world",
    "o'neill and co",
    "mixed CASE 123",
    "<b>bold</b> and <i>it</i>",
    "a < b << c <unclosed",
    "line1\nline2\r\nline3",
    "x  y\t z",
    "price: 1 234,56 zł",
    "abc123def456",
    "3.14159",
    "2.675",
    "2.5",
    "-7.5",
    "42",
    "42.0",
    "not a number",
    "1e3",
    "ZAŻÓŁĆ gęślą jaźń",
    "a" * 600,
]

NUMERIC_IDS = {"round_2", "round_0", "int"}


def oracle(ref, tid, v):
    out = ref.tr.apply_transform(v, tid)
    return None if out is None else str(out)


@pytest.mark.parametrize("tid", sorted(TRANSFORMS.keys() - {"none"}))
def test_transform_matches_reference(spark, ref, tid):
    expected = [oracle(ref, tid, v) for v in STRINGS]
    got = spark_one_col(
        spark,
        STRINGS,
        lambda c: TRANSFORMS[tid](c).cast("string"),
    )
    assert got == expected, f"transform {tid}"


def test_value_mapping_matches_reference(spark, ref):
    mapping = {"A": "Alpha", "B": "Beta", "42": "answer"}
    vals = [None, "A", " B ", "C", "42", ""]
    expected = [
        None if v is None else str(ref.tr.apply_value_mapping(v, mapping))
        for v in vals
    ]
    got = spark_one_col(spark, vals, lambda c: value_mapping_expr(c, mapping))
    assert got == expected


def test_template_matches_reference(spark, ref):
    import pyspark.sql.functions as F

    rows = [
        {"Marka": "Acme", "Model": "X1"},
        {"Marka": None, "Model": "X2"},
        {"Marka": "Solo", "Model": None},
    ]
    template = "{Marka} - {Model} ({Marka})"
    expected = [ref.tr.apply_template(r, template) for r in rows]
    df = spark.createDataFrame(rows)
    got = [
        r.t
        for r in df.select(
            template_expr(template, lambda name: F.col(name)).alias("t")
        ).collect()
    ]
    assert got == expected
