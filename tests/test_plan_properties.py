"""Physical-plan guards: the properties that make these operators safe at
100 TB must survive refactors, so they are asserted on the optimized
plans, not just prose in SCALE.md.

Checked here: column pruning + filter pushdown reach the parquet scans,
dimension joins broadcast, nothing degenerates into a cartesian product,
the stacked write-modes entry evaluates its join exactly once, and the
fuzzy join stays an equi-join on exploded blocking keys.
"""

from __future__ import annotations

import pytest

from datamatcher_spark.queries_catalog import CATALOG

SF = "/root/testdata/sf0.001"


def plan_of(spark, name: str) -> str:
    df = CATALOG[name].spark(spark, SF)
    return df._jdf.queryExecution().executedPlan().toString()


def optimized_of(spark, name: str) -> str:
    df = CATALOG[name].spark(spark, SF)
    return df._jdf.queryExecution().optimizedPlan().toString()


def test_filter_and_pruning_reach_scan(spark):
    plan = plan_of(spark, "events_json_extract")
    # partition-filterable predicate pushed into the parquet scan
    assert "PushedFilters: [" in plan and "LessThan(event_id,500)" in plan
    # projection pruned to the two used columns
    assert "ReadSchema: struct<event_id:bigint,props:string>" in plan


def test_enrich_join_broadcasts_dimension(spark):
    plan = plan_of(spark, "j2_enrich_left_join")
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_write_modes_single_join_single_scan_pair(spark):
    plan = plan_of(spark, "write_modes_all")
    # the 6-mode stack is an explode over ONE join, not a 6-way union
    assert plan.count("Join") == 1
    assert plan.count("Scan parquet") == 2  # orders + customer, once each
    assert "Generate explode" in plan


def test_no_cartesian_anywhere_in_dedup_paths(spark):
    for name in ("dedup_minhash_lsh", "dedup_simhash", "dedup_ngram_jaccard",
                 "embedding_near_dup_lsh"):
        plan = plan_of(spark, name)
        assert "CartesianProduct" not in plan, name
        assert "BroadcastNestedLoopJoin" not in plan, name


def test_fuzzy_join_is_equi_join(spark):
    """The J4 fallback must stay an equi-join on exploded blocking keys —
    a theta/cartesian here is the classic fuzzy-join scale killer. The
    oracle SQL states the prune as a theta join; the Spark plan must not."""
    plan = plan_of(spark, "j4_fuzzy_levenshtein_join")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert ("SortMergeJoin" in plan or "BroadcastHashJoin" in plan
            or "ShuffledHashJoin" in plan)


def test_conflict_override_broadcasts_patch(spark):
    plan = plan_of(spark, "conflict_override_apply")
    assert "BroadcastHashJoin" in plan


@pytest.mark.parametrize("name", ["q1_pricing_summary", "events_hourly_agg"])
def test_aggregations_have_partial_combine(spark, name):
    """groupBy aggs must do map-side partial aggregation (HashAggregate
    appears above AND below the exchange)."""
    plan = plan_of(spark, name)
    assert plan.count("HashAggregate") >= 2
