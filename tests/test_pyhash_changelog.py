"""Round-4 additions: the pure-Python hash twins behind the
``dedup_simhash`` VALUES oracle, the per-cell change-log artifact, and
the CC loop's session-conf isolation."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from datamatcher_spark.functions.pyhash import (
    expected_simhash_pairs,
    simhash_py,
    tokens_py,
    xxh64,
)

XX_CASES = [
    "",                      # zero-length
    "a",                     # 1-byte tail
    "abc",                   # <4 tail
    "abcd",                  # exact 4-byte lane
    "abcdefg",               # 4+3
    "abcdefgh",              # exact 8-byte lane
    "hello world, xxhash!",  # 8+8+4+tail
    "0123456789abcdef0123456789abcdef",   # exactly 32 (stripe path)
    "0123456789abcdef0123456789abcdefX",  # 32 + tail
    "x" * 100,               # multi-stripe + tails
    "zażółć gęślą jaźń",     # multi-byte UTF-8
]


def test_pyxxhash_matches_spark(spark):
    df = spark.createDataFrame([(s,) for s in XX_CASES], "s string")
    got = {r.s: r.h for r in df.select("s", F.xxhash64("s").alias("h")).collect()}
    for s in XX_CASES:
        assert xxh64(s) == got[s], f"xxh64 mismatch for {s!r}"


DOCS = (
    [(i, f"common shared boilerplate text token{i} alpha beta gamma delta")
     for i in range(30)]
    + [(100 + i, f"common shared boilerplate text token{i} alpha beta gamma CHANGED")
       for i in range(10)]
    + [(200, None), (201, ""), (202, "   ")]
)


def test_simhash_py_matches_udf(spark):
    from datamatcher_spark.functions.minhash import MERSENNE_P, tokens_expr
    from datamatcher_spark.operators.dedup import simhash_udf

    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    th = F.transform(
        tokens_expr(F.col("text")), lambda t: F.pmod(F.xxhash64(t), F.lit(MERSENNE_P))
    )
    got = {
        r.doc_id: r.sh
        for r in docs.select("doc_id", simhash_udf(64, 7)(th).alias("sh")).collect()
    }
    for i, text in DOCS:
        assert simhash_py(text) == got[i], f"simhash mismatch for doc {i}"


def test_expected_pairs_match_operator(spark):
    from datamatcher_spark.operators.dedup import simhash_near_duplicates

    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    got = sorted(
        (r.id_a, r.id_b, r.hamming)
        for r in simhash_near_duplicates(docs, "doc_id", "text", max_hamming=3).collect()
    )
    ids = [i for i, _ in DOCS]
    texts = [t for _, t in DOCS]
    want = sorted(expected_simhash_pairs(ids, texts, max_hamming=3))
    assert got == want
    assert len(want) > 0  # non-vacuous: planted near-dups must collide


def test_tokens_py_edgecases():
    assert tokens_py(None) == []
    assert tokens_py("  A  b\tC\n") == ["a", "b", "c"]
    assert simhash_py(None) == 0 and simhash_py("   ") == 0


# ---------------------------------------------------------------------------
# change log
# ---------------------------------------------------------------------------


@pytest.fixture()
def folded(spark):
    from datamatcher_spark.operators.merge import (
        ColumnMapping,
        WriteMode,
        apply_mappings,
    )

    joined = spark.createDataFrame(
        [
            # key, cur_priority, cur_note, src_segment, src_name, matched
            ("k1", None, "old note", "SEG-A", "Alice", True),   # new + append
            ("k2", "P0", "note2", "SEG-B", "Bob", True),        # changed + append
            ("k3", "SEG-C", "note3", "SEG-C", "Cara", True),    # unchanged + append
            ("k4", "P9", "note4", None, None, False),           # NO_MATCH → excluded
        ],
        "k string, priority string, note string, src_segment string, "
        "src_name string, __matched boolean",
    )
    mappings = [
        ColumnMapping(source_column="segment", target_column="priority",
                      write_mode=WriteMode.OVERWRITE_IF_DIFFERENT),
        ColumnMapping(source_column="name", target_column="note",
                      write_mode=WriteMode.APPEND, priority=1),
    ]
    return apply_mappings(
        joined, mappings, matched=F.col("__matched"), retain_old=True
    )


def test_change_log_rows(folded):
    from datamatcher_spark.operators.merge import WriteMode
    from datamatcher_spark.operators.report_render import change_log

    info = [
        {"target_column": "priority",
         "write_mode": WriteMode.OVERWRITE_IF_DIFFERENT, "source_name": "s.csv"},
        {"target_column": "note", "write_mode": WriteMode.APPEND,
         "source_name": "s.csv"},
    ]
    rows = {(r.kolumna, r.klucz): r for r in change_log(folded, "k", info).collect()}
    # reference semantics (core/reporter.py:118-136): NEW/CHANGED only,
    # old + new value, display-name mode, Polish change-type labels
    assert set(rows) == {
        ("priority", "k1"), ("priority", "k2"),
        ("note", "k1"), ("note", "k2"), ("note", "k3"),
    }
    r = rows[("priority", "k1")]
    assert (r.wartosc_przed, r.wartosc_po, r.typ_zmiany) == (None, "SEG-A", "nowa")
    assert (r.zrodlo, r.tryb) == ("s.csv", "Nadpisz jeśli inne")
    r = rows[("priority", "k2")]
    assert (r.wartosc_przed, r.wartosc_po, r.typ_zmiany) == ("P0", "SEG-B", "zmieniona")
    r = rows[("note", "k3")]
    assert (r.wartosc_przed, r.wartosc_po) == ("note3", "note3 | Cara")
    assert rows[("note", "k1")].tryb == "Dopisz"


def test_change_log_export_csv(folded, tmp_path):
    from datamatcher_spark.operators.merge import WriteMode
    from datamatcher_spark.operators.report_render import export_change_log

    out = tmp_path / "changes_csv"
    export_change_log(
        folded, "k",
        [{"target_column": "priority",
          "write_mode": WriteMode.OVERWRITE_IF_DIFFERENT, "source_name": "s"}],
        out,
    )
    # distributed CSV sink → a directory of part files
    text = "\n".join(
        p.read_text(encoding="utf-8") for p in sorted(out.glob("part-*.csv"))
    )
    assert "kolumna" in text.splitlines()[0]
    assert any("k2" in line for line in text.splitlines()[1:])


def test_summary_with_null_keys_does_not_crash(spark):
    """ADVICE r3: NULL base keys in the unmatched preview crashed
    generate_summary's ', '.join with a Python None."""
    from datamatcher_spark.operators.report_render import (
        collect_run_stats,
        generate_summary,
    )

    merged = spark.createDataFrame(
        [(None, "no_match"), ("kA", "no_match"), ("kB", "changed")],
        "k string, __change_x string",
    )
    stats = collect_run_stats(merged, "k")
    text = generate_summary(stats, "base.csv", "k", [], [])
    assert "kA" in text
    assert stats["unmatched_keys"] == ["kA"]


# ---------------------------------------------------------------------------
# CC session-conf isolation
# ---------------------------------------------------------------------------


def test_cc_never_touches_session_conf(spark, monkeypatch):
    """The partition clamp must be per-operation: the session's
    shuffle-partitions setting is read-only to the loop (a concurrent
    query on the same session must never see a clamped value)."""
    from datamatcher_spark.plans import clustering

    key = "spark.sql.shuffle.partitions"
    before = spark.conf.get(key)
    seen: list[str] = []
    orig = clustering._large_star

    def spy(e, n=None):
        seen.append(spark.conf.get(key))
        return orig(e, n)

    monkeypatch.setattr(clustering, "_large_star", spy)
    edges = spark.createDataFrame(
        [("b", "a"), ("c", "b"), ("e", "d"), ("f", "e"), ("h", "g")],
        "src string, dst string",
    )
    cc, iters = clustering.connected_components(edges)
    got = {(r.node, r.component) for r in cc.collect()}
    assert iters >= 2 and len(seen) >= 2
    assert all(v == before for v in seen), "session conf mutated mid-loop"
    assert spark.conf.get(key) == before
    # correctness unchanged by the rewrite
    assert got == {
        ("a", "a"), ("b", "a"), ("c", "a"),
        ("d", "d"), ("e", "d"), ("f", "d"),
        ("g", "g"), ("h", "g"),
    }
