"""End-to-end pipeline correctness: the BASELINE gate (pairwise F1 ≥ 0.99
on planted clusters) plus checkpoint-resume behavior."""

from __future__ import annotations

import pytest

from datamatcher_spark.plans.config import PipelineConfig
from datamatcher_spark.plans.run import pairwise_f1, run_pipeline
from datamatcher_spark.sources.synth import (
    generate_labeled_pairs,
    generate_pages_with_truth,
)


@pytest.fixture(scope="module")
def corpus(spark):
    pt = generate_pages_with_truth(spark, n_docs=1500, seed=42).cache()
    pt.count()
    pairs = generate_labeled_pairs(pt).cache()
    pairs.count()
    return pt, pairs


def test_f1_gate(spark, corpus, tmp_path_factory):
    pt, labeled = corpus
    work = str(tmp_path_factory.mktemp("pipe"))
    res = run_pipeline(spark, pt.drop("cluster_id"), work, "r1", PipelineConfig())
    m = pairwise_f1(res.clusters, labeled)
    assert m["f1"] >= 0.99, m
    assert res.stages_run == ["block", "score", "cluster"]
    # lineage rows exist for every stage
    stages = {r.stage for r in res.metrics.read().select("stage").distinct().collect()}
    assert {"block", "score", "cluster"} <= stages
    # score lineage carries a histogram
    hist_rows = res.metrics.read().filter("stage = 'score'").collect()
    assert any(r.score_histogram for r in hist_rows)


def test_resume_skips_committed_stages(spark, corpus, tmp_path_factory):
    pt, labeled = corpus
    work = str(tmp_path_factory.mktemp("pipe_resume"))
    pages = pt.drop("cluster_id")
    first = run_pipeline(spark, pages, work, "r2", PipelineConfig())
    assert first.stages_run == ["block", "score", "cluster"]

    second = run_pipeline(spark, pages, work, "r2", PipelineConfig())
    assert second.stages_run == []
    assert second.stages_skipped == ["block", "score", "cluster"]
    a = {(r.url, r.cluster_id) for r in first.clusters.collect()}
    b = {(r.url, r.cluster_id) for r in second.clusters.collect()}
    assert a == b


def test_partial_resume(spark, corpus, tmp_path_factory):
    """Simulate a crash after stage 2: markers for block+score exist, the
    relaunch runs only cluster."""
    pt, _ = corpus
    work = str(tmp_path_factory.mktemp("pipe_partial"))
    pages = pt.drop("cluster_id")
    full = run_pipeline(spark, pages, work, "r3", PipelineConfig())
    # wipe only the cluster commit marker (as if we died mid-stage-3)
    import os

    os.remove(full.metrics.commits_dir / "cluster.json")
    resumed = run_pipeline(spark, pages, work, "r3", PipelineConfig())
    assert resumed.stages_skipped == ["block", "score"]
    assert resumed.stages_run == ["cluster"]
