"""Round-6 additions: change-log-aware resume staleness (ADVICE r5),
and the reworked CC round (window-min stars, 3 exchanges, digest rides
the lazy checkpoint — VERDICT r5 item 3)."""

from __future__ import annotations

import pytest

from datamatcher_spark.operators.merge import ColumnMapping, WriteMode
from datamatcher_spark.plans.profiles import Profile, SourceSpec, execute_profile


@pytest.fixture()
def profile_frames(spark):
    frames = {
        "base": spark.createDataFrame(
            [("001", None, "x"), ("002", "old-t2", "y"), ("003", "t3", "z")],
            "ean string, title string, note string",
        ),
        "s1": spark.createDataFrame(
            [("001", "Title-1"), ("002", "Title-2")], "ean string, tytul string"
        ),
        "s2": spark.createDataFrame(
            [("002", "BrandB"), ("003", "BrandC")], "ean string, marka string"
        ),
    }
    prof = Profile(
        name="p",
        base=SourceSpec(name="base", path="base", key_column="ean"),
        sources=[
            SourceSpec(name="s1", path="s1.csv", key_column="ean"),
            SourceSpec(name="s2", path="s2.csv", key_column="ean"),
        ],
        mappings=[
            ColumnMapping(source_column="tytul", target_column="title",
                          write_mode=WriteMode.OVERWRITE_IF_DIFFERENT,
                          source_id="s1"),
            ColumnMapping(source_column="marka", target_column="note",
                          write_mode=WriteMode.OVERWRITE, source_id="s2"),
        ],
    )
    load = lambda p: frames[str(p).removesuffix(".csv")]  # noqa: E731
    return prof, load


def test_change_log_resume_from_logless_markers(spark, tmp_path, profile_frames):
    """ADVICE r5 (medium): markers committed by a run WITHOUT
    export_change_log carry no per-source log parquet; a resumed run
    WITH the flag must treat them as stale and refold, or the artifact
    silently loses those sources (worst case: an empty CSV)."""
    prof, load = profile_frames
    wd = tmp_path / "wd"

    # run 1: no export — commits fold markers with no change_log capture
    execute_profile(spark, prof, load=load, work_dir=str(wd))
    assert len(list((wd / "commits").glob("*.json"))) == 2

    # run 2: same work_dir, export ON — must NOT resume the logless
    # markers; the artifact must carry every transition of the whole run
    out_csv = tmp_path / "clog"
    out, si, _ = execute_profile(
        spark, prof, load=load, work_dir=str(wd),
        export_change_log=True, change_log_path=out_csv,
    )
    text = "\n".join(
        p.read_text(encoding="utf-8") for p in sorted(out_csv.glob("part-*.csv"))
    )
    lines = [ln for ln in text.splitlines() if ln and "kolumna" not in ln]
    assert len(lines) == 4, lines  # refolded: s1 ×2 + s2 ×2, not empty
    assert sum("s1.csv" in ln for ln in lines) == 2
    assert sum("s2.csv" in ln for ln in lines) == 2
    assert len(si) == 2  # stats rebuilt by the refold, not replayed

    # run 3: export ON again — run 2's markers DO carry logs, so this one
    # resumes (replays the committed per-source logs, identical artifact)
    out_csv3 = tmp_path / "clog3"
    execute_profile(
        spark, prof, load=load, work_dir=str(wd),
        export_change_log=True, change_log_path=out_csv3,
    )
    text3 = "\n".join(
        p.read_text(encoding="utf-8") for p in sorted(out_csv3.glob("part-*.csv"))
    )
    lines3 = [ln for ln in text3.splitlines() if ln and "kolumna" not in ln]
    assert sorted(lines3) == sorted(lines)


def test_cc_converged_input_exits_in_one_round(spark):
    """The digest now compares round 1 against the ENTRY digest (both
    ride checkpoint materialization), so a star-forest input — a fixed
    point of large-star∘small-star — exits after a single round."""
    from datamatcher_spark.plans.clustering import connected_components

    edges = spark.createDataFrame(
        [("b", "a"), ("c", "a"), ("e", "d")], "src string, dst string"
    )
    cc, iters = connected_components(edges)
    assert iters == 1
    got = {(r.node, r.component) for r in cc.collect()}
    assert got == {("a", "a"), ("b", "a"), ("c", "a"), ("d", "d"), ("e", "d")}


def test_cc_round_is_three_exchanges(spark):
    """Regression-guard the r6 plan shape: one large-star + small-star
    round costs exactly THREE shuffle exchanges (sym by src; large-star
    dedup by src, reused exchange-free by small-star's window; final
    dedup) — the r5 groupBy+self-join shape executed five, two of them
    duplicate shuffles of the same rows (self-join aliasing defeats
    ReuseExchange)."""
    from datamatcher_spark.plans.clustering import _large_star, _small_star

    edges = spark.createDataFrame(
        [("b", "a"), ("c", "b"), ("e", "d"), ("f", "e")], "src string, dst string"
    )
    out = _small_star(_large_star(edges, 4), 4, pre_canonical=True)
    out.collect()
    plan = out._jdf.queryExecution().executedPlan().toString()
    final = plan.split("Initial Plan")[0]  # AQE prints final plan first
    n_shuffles = final.count("Exchange hashpartitioning")
    n_reused = final.count("ReusedExchange")
    assert n_shuffles == 3, final
    assert n_reused == 0, final


def test_cc_window_rewrite_matches_union_find(spark):
    """The window-min star rewrite must produce identical components to
    a union-find oracle on a graph that exercises dup emission (cliques)
    and multi-round convergence (long chains)."""
    import random

    from datamatcher_spark.plans.clustering import connected_components

    rng = random.Random(13)
    nodes = [f"n{i:03d}" for i in range(80)]
    edges = []
    # three planted cliques
    for base in (0, 10, 25):
        members = nodes[base:base + 8]
        edges += [(a, b) for a in members for b in members if a < b]
    # one long chain
    edges += [(nodes[i], nodes[i + 1]) for i in range(40, 70)]
    # noise
    edges += [(rng.choice(nodes), rng.choice(nodes)) for _ in range(30)]
    edges = [(a, b) for a, b in edges if a != b]

    parent = {n: n for n in nodes}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    comp: dict[str, list[str]] = {}
    for n in nodes:
        comp.setdefault(find(n), []).append(n)
    in_edge = {x for p in edges for x in p}
    oracle = {
        n: min(m) for m in comp.values() for n in m if n in in_edge
    }

    e = spark.createDataFrame(edges, "src string, dst string")
    cc, iters = connected_components(e)
    got = {r.node: r.component for r in cc.collect()}
    assert got == oracle, f"iters={iters}"
