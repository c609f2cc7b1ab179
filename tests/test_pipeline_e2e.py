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


def test_uid_bits_128(spark, corpus, tmp_path_factory):
    """The 10^12-doc id width: the pipeline must produce the SAME
    clusters (as url sets) with 16-byte struct uids as with 8-byte longs,
    and the shuffle keys must stay fixed-width either way."""
    from pyspark.sql import functions as F
    from pyspark.sql.types import LongType, StructType

    from datamatcher_spark.plans.blocking import block_keys
    from datamatcher_spark.plans.scoring import candidate_pairs

    pt, labeled = corpus
    pages = pt.drop("cluster_id")
    work64 = str(tmp_path_factory.mktemp("uid64"))
    work128 = str(tmp_path_factory.mktemp("uid128"))
    r64 = run_pipeline(spark, pages, work64, "u64", PipelineConfig())
    r128 = run_pipeline(spark, pages, work128, "u128", PipelineConfig(uid_bits=128))
    assert r64.counts["pairs_scored"] == r128.counts["pairs_scored"]
    assert r64.counts["clusters"] == r128.counts["clusters"]

    def cluster_sets(res):
        rows = res.clusters.groupBy("cluster_id").agg(
            F.sort_array(F.collect_list("url")).alias("urls")
        ).collect()
        return {tuple(r.urls) for r in rows}

    assert cluster_sets(r64) == cluster_sets(r128)
    # fixed-width shuffle keys: long at 64, struct<h1,h2 long> at 128 —
    # never url strings
    p64 = candidate_pairs(block_keys(pages, PipelineConfig()))
    p128 = candidate_pairs(block_keys(pages, PipelineConfig(uid_bits=128)))
    assert isinstance(p64.schema["uid_a"].dataType, LongType)
    t = p128.schema["uid_a"].dataType
    assert isinstance(t, StructType) and [f.dataType for f in t.fields] == [
        LongType(), LongType()
    ]


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
