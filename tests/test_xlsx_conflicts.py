"""Stdlib xlsx codec round-trip (SURVEY §2.1 S1) and conflict-override
application (reference gui/dialogs/conflict_resolver.py:112-124)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from datamatcher_spark.sources.xlsx import (
    load_xlsx,
    read_xlsx_rows,
    sheet_names,
    write_xlsx,
)


@pytest.fixture()
def workbook(tmp_path):
    path = tmp_path / "inventory.xlsx"
    write_xlsx(
        [
            ["sku", "name", "qty", "price", "active"],
            ["A-1", "Wídget <large> & fine", 3, 19.99, True],
            ["B-2", "Gadget", 0, 5.5, False],
            ["C-3", None, 12, 100.0, True],
            ["D-4", "Multi\nline", 7, 0.25, True],
        ],
        path,
        sheet_name="Stock & Prices",
    )
    return path


def test_round_trip_grid(workbook):
    grid = read_xlsx_rows(workbook)
    assert grid[0] == ["sku", "name", "qty", "price", "active"]
    assert grid[1] == ["A-1", "Wídget <large> & fine", 3.0, 19.99, True]
    assert grid[3][1] is None
    assert grid[4][1] == "Multi\nline"
    assert sheet_names(workbook) == ["Stock & Prices"]


def test_load_xlsx_dataframe(spark, workbook):
    df, names = load_xlsx(spark, workbook)
    assert names == ["Stock & Prices"]
    assert df.columns == ["sku", "name", "qty", "price", "active"]
    # numeric columns inferred double, mixed/str columns stringly
    types = dict(df.dtypes)
    assert types["qty"] == "double" and types["price"] == "double"
    assert types["sku"] == "string"
    rows = {r.sku: r for r in df.collect()}
    assert rows["A-1"].qty == 3.0
    assert rows["B-2"].active == "False"
    assert rows["C-3"].name is None


def test_sheet_selection_errors(workbook):
    with pytest.raises(ValueError, match="not found"):
        read_xlsx_rows(workbook, sheet="Nope")


def test_load_file_dispatch(spark, workbook):
    from datamatcher_spark.sources.ingest import load_file

    df = load_file(spark, workbook)
    assert df.count() == 4
    # .xls and .xlsb dispatch to their own stdlib codecs now
    # (tests/test_round6.py); unknown extensions still fail loudly
    with pytest.raises(ValueError, match="unsupported"):
        load_file(spark, workbook.with_suffix(".bin"))


def test_header_dedup_and_headerless(spark, tmp_path):
    p = tmp_path / "dup.xlsx"
    write_xlsx([["a", "a", ""], ["1", "2", "3"]], p)
    df, _ = load_xlsx(spark, p)
    assert df.columns == ["a", "a.1", "col2"]
    df2, _ = load_xlsx(spark, p, header=False)
    assert df2.columns == ["col0", "col1", "col2"]
    assert df2.count() == 2


def test_apply_conflict_overrides(spark):
    from datamatcher_spark.operators.merge import apply_conflict_overrides

    merged = spark.createDataFrame(
        [
            (1, "alpha", "x", "changed"),
            (2, "beta", "y", "unchanged"),
            (3, "gamma", "z", "new"),
        ],
        "id int, name string, code string, __change_name string",
    )
    overrides = spark.createDataFrame(
        [("1", "name", "ALPHA-FIXED"), ("3", "code", "Z-FIXED"),
         ("3", "ignored_col", "nope")],
        "key string, column string, chosen_value string",
    )
    out = {
        r.id: r
        for r in apply_conflict_overrides(
            merged, "id", overrides, ["name", "code"]
        ).collect()
    }
    assert out[1].name == "ALPHA-FIXED"
    assert out[1]["__change_name"] == "override"
    assert out[1].code == "x"
    assert out[2].name == "beta"
    assert out[2]["__change_name"] == "unchanged"
    assert out[3].code == "Z-FIXED"
    assert out[3]["__change_code"] == "override"
    assert out[3]["__change_name"] == "new"  # untouched lineage survives
    # row count preserved (patch join is 1:1)
    assert len(out) == 3


def test_conflict_overrides_deterministic_and_blankable(spark):
    """Duplicate (key, column) rows resolve by max 'seq' (last click wins,
    like the reference's sequential patches); an explicit NULL
    chosen_value blanks the cell instead of being silently dropped."""
    from datamatcher_spark.operators.merge import apply_conflict_overrides

    merged = spark.createDataFrame(
        [(1, "alpha", "x"), (2, "beta", "y")],
        "id int, name string, code string",
    )
    overrides = spark.createDataFrame(
        [
            ("1", "name", "FIRST", 1),
            ("1", "name", "LAST", 2),       # same cell clicked twice
            ("2", "code", None, 1),          # user blanked the cell
        ],
        "key string, column string, chosen_value string, seq int",
    )
    out = {
        r.id: r
        for r in apply_conflict_overrides(
            merged, "id", overrides, ["name", "code"]
        ).collect()
    }
    assert out[1].name == "LAST"                 # deterministic last-wins
    assert out[2].code is None                   # blank applied, not dropped
    assert out[2]["__change_code"] == "override"
    # without seq: still deterministic (max of chosen_value), never random
    no_seq = overrides.select("key", "column", "chosen_value")
    vals = {
        r.id: r.name
        for r in apply_conflict_overrides(
            merged, "id", no_seq, ["name", "code"]
        ).collect()
    }
    assert vals[1] == "LAST"  # max("FIRST", "LAST") — stable tie-break


def test_conflict_overrides_requires_long_format(spark):
    from datamatcher_spark.operators.merge import apply_conflict_overrides

    df = spark.range(3)
    bad = spark.createDataFrame([("1", "v")], "key string, value string")
    with pytest.raises(ValueError, match="overrides must have columns"):
        apply_conflict_overrides(df, "id", bad, ["value"])
