"""The reference's core scenario end to end (FIXTURES.md §4): a products
base with key pathologies enriched from a source with duplicate keys and
conflicting values, through variant blocking → best-row → mapping fold →
finalization — the whole desktop workflow as one declarative plan."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from datamatcher_spark.operators.enrich import (
    anti_join_unmatched,
    enrich_join,
    fuzzy_enrich_candidates,
    match_stats,
)
from datamatcher_spark.operators.finalize import (
    preview,
    reorder_columns,
    validation_warnings,
)
from datamatcher_spark.operators.merge import (
    ColumnMapping,
    RuleCondition,
    RuleOperator,
    WriteMode,
    apply_mappings,
)
from datamatcher_spark.plans.profiles import (
    BatchFilterSpec,
    Profile,
    SourceSpec,
)

BASE_ROWS = [
    # ean with float-ification / leading zeros / sentinels; empty titles
    ("1", "78484099216", "", "N/A", "100,50"),
    ("2", "078484099216.0", "Old Title", "BrandX", "brak"),
    ("3", "12345", "Keep Me", "-", "10"),
    ("4", "99999999", None, "nan", "5.5"),
    ("5", "  ", "No Key Row", "B", "1"),
]
SRC_ROWS = [
    # duplicate key with conflicting titles (best-row: first with data)
    ("0078484099216", "Nice Product Title", "premium"),
    ("0078484099216", "Conflicting Title", "premium"),
    ("12345", None, "basic"),          # matched but no title data
    ("00012345", "Padded Variant", "basic"),  # same logical key, padded
    ("55555", "Unrelated", "basic"),
]


@pytest.fixture(scope="module")
def tables(spark):
    base = spark.createDataFrame(
        BASE_ROWS, "id string, ean string, tytul string, marka string, cena string"
    )
    src = spark.createDataFrame(
        SRC_ROWS, "ean string, tytul_pelny string, tier string"
    )
    return base, src


def test_full_enrichment_flow(spark, tables):
    base, src = tables
    joined = enrich_join(base, src, "ean", "ean", "tytul_pelny")
    mappings = [
        ColumnMapping(source_column="tytul_pelny", target_column="tytul",
                      write_mode=WriteMode.FILL_EMPTY, transform="trim", priority=1),
        ColumnMapping(
            source_column="tier", target_column="marka",
            write_mode=WriteMode.OVERWRITE_IF_NOT_EMPTY, transform="upper",
            priority=2,
            conditions=[RuleCondition("tier", RuleOperator.EQUALS, "premium")],
        ),
    ]
    out = apply_mappings(joined, mappings, matched=F.col("__matched"))
    rows = {r.id: r for r in out.collect()}

    # row 1: empty title filled from best source row (first with data);
    # duplicate key with conflicting data → conflict count surfaced
    assert rows["1"].tytul == "Nice Product Title"
    assert rows["1"]["__change_tytul"] == "new"
    assert rows["1"]["__conflicts"] == 1
    assert rows["1"].marka == "PREMIUM"  # premium condition fired

    # row 2: '.0'-suffixed padded key still matches; FILL_EMPTY skips
    # non-empty title
    assert rows["2"].tytul == "Old Title"
    assert rows["2"]["__change_tytul"] == "unchanged"

    # row 3: matches key 12345 via variants; the 12345-keyed row has no
    # title, the padded variant row does → best-row picks the data row
    assert rows["3"].tytul == "Keep Me"  # fill_empty: target non-empty
    assert rows["3"].marka == "-"        # basic ≠ premium → skipped
    assert rows["3"]["__change_marka"] == "skipped"

    # row 4: no match → NO_MATCH lineage, values untouched
    assert not rows["4"]["__matched"]
    assert rows["4"]["__change_tytul"] == "no_match"

    # row 5: empty key → unmatched
    assert not rows["5"]["__matched"]


def test_match_stats_and_anti_join(spark, tables):
    base, src = tables
    stats = match_stats(base, src, "ean", "ean")
    assert stats["matched"] == 3          # rows 1, 2, 3
    assert stats["total_base"] == 4       # row 5's empty key is excluded
    unmatched = anti_join_unmatched(base, src, "ean", "ean")
    assert {r.id for r in unmatched.collect()} == {"4", "5"}


def test_fuzzy_candidates(spark, tables):
    base, src = tables
    cands = fuzzy_enrich_candidates(base, src, "ean", "ean", threshold=0.7)
    got = {(r.probe, r.cand) for r in cands.collect()}
    # 99999999 has no close source key; 12345 matches itself exactly
    assert ("12345", "12345") in got


def test_finalize_and_preview(spark, tables):
    base, src = tables
    joined = enrich_join(base, src, "ean", "ean", "tytul_pelny")
    out = apply_mappings(
        joined,
        [ColumnMapping(source_column="tytul_pelny", target_column="tytul",
                       write_mode=WriteMode.FILL_EMPTY)],
        matched=F.col("__matched"),
    )
    ordered = reorder_columns(out.select("id", "ean", "tytul", "__change_tytul"),
                              ["tytul"])
    assert ordered.columns[:2] == ["id", "ean"]
    assert ordered.columns[2] == "tytul"

    changed = preview(out, 10, change_filter="new")
    assert {r.id for r in changed.collect()} == {"1"}
    found = preview(out, 10, search="old title")
    assert {r.id for r in found.collect()} == {"2"}


def test_validation_warnings(spark, tables):
    base, _ = tables
    w = validation_warnings(base, "cena", "number").collect()[0]
    # '100,50' parses after ,→. ; 'brak' doesn't; '10','5.5','1' do
    assert w.warning_count == 1
    assert w.total_rows == 5


def test_profile_roundtrip(tmp_path):
    p = Profile(
        name="demo",
        base=SourceSpec("base", "/data/base.parquet", "ean",
                        {"strip_leading_zeros": True}),
        sources=[SourceSpec("s1", "/data/s1.parquet", "ean")],
        mappings=[
            ColumnMapping(
                source_column="a", target_column="b",
                write_mode=WriteMode.APPEND, transform="upper", priority=3,
                conditions=[RuleCondition("c", RuleOperator.REGEX_MATCH, "^x")],
                condition_logic="OR",
            )
        ],
        batch_filter=BatchFilterSpec(kind="regex", pattern="^A"),
    )
    path = tmp_path / "profile.json"
    p.to_json(path)
    q = Profile.from_json(path)
    assert q.name == "demo"
    assert q.base.key_options == {"strip_leading_zeros": True}
    assert q.mappings[0].write_mode == WriteMode.APPEND
    assert q.mappings[0].conditions[0].operator == RuleOperator.REGEX_MATCH
    assert q.batch_filter.pattern == "^A"
