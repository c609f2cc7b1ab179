"""Pipeline orchestration: block → score → cluster, with per-stage
lineage, commit markers, and resume-from-last-committed-stage.

Analogue of the reference's headless lifecycle (main.py:35-134 +
SessionManager restore, utils/session.py:17-98): each stage writes its
output parquet and a commit marker; relaunching with the same
(work_dir, run_id) skips committed stages and reads their outputs — the
driver-side resume orchestration SURVEY §4 item 4 calls for.
"""

from __future__ import annotations

import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from datamatcher_spark.plans.blocking import (
    block_keys,
    features,
    salted_repartition,
    truncate_oversized,
)
from datamatcher_spark.plans.clustering import connected_components
from datamatcher_spark.plans.config import PipelineConfig
from datamatcher_spark.plans.lineage import MetricsTable, partition_lineage
from datamatcher_spark.plans.scoring import candidate_pairs, score_pairs

STAGES = ("block", "score", "cluster")


class PipelineResult:
    def __init__(self, clusters: DataFrame, metrics: MetricsTable,
                 stages_run: list[str], stages_skipped: list[str],
                 cc_iterations: int, counts: dict):
        self.clusters = clusters
        self.metrics = metrics
        self.stages_run = stages_run
        self.stages_skipped = stages_skipped
        self.cc_iterations = cc_iterations
        self.counts = counts


def run_pipeline(
    spark: SparkSession,
    pages: DataFrame,
    work_dir: str,
    run_id: str,
    cfg: PipelineConfig | None = None,
) -> PipelineResult:
    cfg = cfg or PipelineConfig()
    # a long-lived session may carry storage leftovers from scope-less
    # dedup-operator calls (they grow with corpus size); the pipeline's
    # stages should never compete with them for unified memory
    from datamatcher_spark.operators.dedup import release_orphaned_caches

    release_orphaned_caches()
    mt = MetricsTable(spark, work_dir, run_id)
    stages_run: list[str] = []
    stages_skipped: list[str] = []
    counts: dict = {}
    cc_iters = 0

    # ---- stage 1: block ----------------------------------------------------
    blocks_path = mt.stage_output_path("block")
    feats_path = mt.stage_output_path("features")
    if mt.is_committed("block"):
        stages_skipped.append("block")
    else:
        t0 = time.monotonic()
        feats = features(pages, cfg)
        feats.write.mode("overwrite").parquet(feats_path)
        # persist the raw block table: the size census and the kept-side
        # anti-join both consume it, and recomputing it would run the
        # MinHash signature UDF twice over the whole corpus
        raw_blocks = block_keys(pages, cfg).persist()
        try:
            _, truncated_census = truncate_oversized(raw_blocks, cfg)
            truncated = truncated_census.collect()  # tiny; needed twice below
            truncated_df = spark.createDataFrame(
                truncated or [], "block_key string, block_size long"
            )
            kept = raw_blocks.join(
                F.broadcast(truncated_df.select("block_key")), "block_key", "left_anti"
            )
            salted_repartition(kept, cfg).write.mode("overwrite").parquet(blocks_path)
        finally:
            raw_blocks.unpersist()
        wall = int((time.monotonic() - t0) * 1000)

        blocks_df = spark.read.parquet(blocks_path)
        # ONE pass over the block table serves both the lineage rows and
        # the row count: the per-partition aggregate is tiny (≤ shuffle
        # partitions rows), so collect it, append from the collected rows,
        # and fold the total driver-side — a separate blocks_df.count()
        # was a second full scan of the largest stage-1 output
        lineage_rows = partition_lineage(blocks_df, block_col="block_key").collect()
        mt.append(
            spark.createDataFrame(
                lineage_rows or [], "partition_id int, pair_count long"
            ),
            "block",
            wall,
        )
        # truncated-block census: never silent (one lineage row per block)
        trunc_rows = truncated_df.select(
            F.lit(None).cast("int").alias("partition_id"),
            F.col("block_key"),
            F.col("block_size").alias("pair_count"),
        )
        mt.append(trunc_rows, "block_truncated", wall)
        counts["blocks"] = sum(r.pair_count for r in lineage_rows)
        counts["truncated_blocks"] = len(truncated)
        counts["block_wall_ms"] = wall
        mt.commit("block", **{k: counts[k] for k in ("blocks", "truncated_blocks")})
        stages_run.append("block")

    # ---- stage 2: score ------------------------------------------------------
    edges_path = mt.stage_output_path("score")
    if mt.is_committed("score"):
        stages_skipped.append("score")
    else:
        t0 = time.monotonic()
        blocks_df = spark.read.parquet(blocks_path)
        feats_df = spark.read.parquet(feats_path)
        pairs = candidate_pairs(blocks_df)
        scored = score_pairs(pairs, feats_df, cfg)
        scored.write.mode("overwrite").parquet(edges_path)
        wall = int((time.monotonic() - t0) * 1000)

        scored_df = spark.read.parquet(edges_path)
        # one pass serves lineage + totals (same fusion as the block
        # stage): the per-partition aggregate is tiny, so collect it,
        # append the METRICS_SCHEMA columns, and fold pair/accepted
        # totals driver-side — the separate count/count_if agg was a
        # second full scan of the scored-pair table
        lineage_rows = partition_lineage(
            scored_df, score_col="score", buckets=cfg.histogram_buckets,
            accept_col="accepted",
        ).collect()
        mt.append(
            spark.createDataFrame(
                [(r.partition_id, r.pair_count, r.score_histogram)
                 for r in lineage_rows] or [],
                "partition_id int, pair_count long, "
                "score_histogram map<string,long>",
            ),
            "score",
            wall,
        )
        counts["pairs_scored"] = sum(r.pair_count for r in lineage_rows)
        counts["edges_accepted"] = sum(r.accepted_n for r in lineage_rows)
        counts["score_wall_ms"] = wall
        mt.commit("score", **{k: counts[k] for k in
                              ("pairs_scored", "edges_accepted", "score_wall_ms")})
        stages_run.append("score")

    # ---- stage 3: cluster ----------------------------------------------------
    clusters_path = mt.stage_output_path("cluster")
    if mt.is_committed("cluster"):
        stages_skipped.append("cluster")
    else:
        # The CC loop is GC-sensitive: each round is three small keyed
        # exchanges plus a localCheckpoint, so tenured garbage from the
        # block/score stages (feature arrays, shuffle buffers) turns
        # into repeated old-gen pauses INSIDE the rounds (observed: the
        # same 960k cluster stage at 6.7 s in a fresh session vs 41.4 s
        # after a full suite had filled the heap). One explicit full
        # collection at the stage boundary pays the pause once, outside
        # the loop.
        try:
            spark.sparkContext._jvm.System.gc()
        except Exception:
            pass  # py4j surface may differ; the GC nudge is best-effort
        t0 = time.monotonic()
        edges = spark.read.parquet(edges_path).filter("accepted")
        # CC runs on 8-byte uids; urls are joined back once at the end
        cc, cc_iters = connected_components(
            edges.select(F.col("uid_a").alias("src"), F.col("uid_b").alias("dst")),
            cfg.max_cc_iterations,
            checkpoint_dir=cfg.checkpoint_dir or None,
        )
        uid_url = spark.read.parquet(feats_path).select("uid", "url")
        assigned = cc.select(F.col("node").alias("uid"),
                             F.col("component").alias("cluster_id"))
        clusters = (
            uid_url.join(assigned, "uid", "left")
            .select(
                "url",
                F.coalesce(F.col("cluster_id"), F.col("uid")).alias("cluster_id"),
            )
        )
        clusters.write.mode("overwrite").parquet(clusters_path)
        wall = int((time.monotonic() - t0) * 1000)

        clusters_df = spark.read.parquet(clusters_path)
        mt.append(partition_lineage(clusters_df), "cluster", wall)
        counts["clusters"] = clusters_df.select("cluster_id").distinct().count()
        counts["cc_iterations"] = cc_iters
        counts["cluster_wall_ms"] = wall
        mt.commit("cluster", **{k: counts[k] for k in ("clusters", "cc_iterations")})
        stages_run.append("cluster")

    clusters_df = spark.read.parquet(clusters_path)
    return PipelineResult(clusters_df, mt, stages_run, stages_skipped, cc_iters, counts)


def pairwise_f1(clusters: DataFrame, labeled_pairs: DataFrame) -> dict:
    """Pairwise precision/recall/F1 of cluster assignments against the
    labeled pair set (the BASELINE gate: F1 ≥ 0.99)."""
    ca = clusters.select(F.col("url").alias("url_a"), F.col("cluster_id").alias("cid_a"))
    cb = clusters.select(F.col("url").alias("url_b"), F.col("cluster_id").alias("cid_b"))
    joined = (
        labeled_pairs.join(ca, "url_a").join(cb, "url_b")
        .withColumn("pred", F.col("cid_a") == F.col("cid_b"))
    )
    agg = joined.agg(
        F.count_if(F.col("pred") & F.col("label")).alias("tp"),
        F.count_if(F.col("pred") & ~F.col("label")).alias("fp"),
        F.count_if(~F.col("pred") & F.col("label")).alias("fn"),
    ).collect()[0]
    tp, fp, fn = agg.tp, agg.fp, agg.fn
    precision = tp / (tp + fp) if tp + fp else 1.0
    recall = tp / (tp + fn) if tp + fn else 1.0
    f1 = 2 * precision * recall / (precision + recall) if precision + recall else 0.0
    return {"tp": tp, "fp": fp, "fn": fn,
            "precision": precision, "recall": recall, "f1": f1}
