#!/usr/bin/env python
"""er_pipeline decomposition at the bench's corpus size (guide §1.4):
full run_pipeline stage walls + block-stage sub-pieces."""
from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F

from datamatcher_spark.plans.blocking import (
    block_keys, features, salted_repartition, truncate_oversized,
)
from datamatcher_spark.plans.config import PipelineConfig
from datamatcher_spark.plans.run import run_pipeline
from datamatcher_spark.session import get_spark
from datamatcher_spark.sources.synth import generate_pages


def main() -> None:
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", 32))
    n_docs = int(os.environ.get("N_DOCS", 200_000))
    os.environ.setdefault("SPARK_DRIVER_MEMORY", f"{min(cpus * 2, 16)}g")
    spark = get_spark("measure_er", master=f"local[{cpus}]",
                      shuffle_partitions=max(cpus, 8))
    spark.sparkContext.setLogLevel("ERROR")
    sc = spark.sparkContext
    out: dict = {"n_docs": n_docs, "cpus": cpus}
    cfg = PipelineConfig()

    pages = generate_pages(spark, n_docs=n_docs, seed=42).cache()
    pages.count()

    # full pipeline, bench-identical
    work = tempfile.mkdtemp(prefix="er_probe_")
    t0 = time.monotonic()
    res = run_pipeline(spark, pages, work, "probe", cfg)
    out["t_pipeline"] = round(time.monotonic() - t0, 2)
    out["stage_walls_ms"] = {k: res.counts.get(k) for k in
                             ("block_wall_ms", "score_wall_ms", "cluster_wall_ms")}
    out["pairs_scored"] = res.counts.get("pairs_scored")
    shutil.rmtree(work, ignore_errors=True)

    # block sub-pieces (fresh, warm JVM)
    sc.setJobDescription("er: features noop")
    t0 = time.monotonic()
    features(pages, cfg).write.format("noop").mode("overwrite").save()
    out["t_features_noop"] = round(time.monotonic() - t0, 2)

    sc.setJobDescription("er: features parquet write")
    d = tempfile.mkdtemp(prefix="er_feat_")
    t0 = time.monotonic()
    features(pages, cfg).write.mode("overwrite").parquet(f"{d}/f")
    out["t_features_write"] = round(time.monotonic() - t0, 2)
    shutil.rmtree(d, ignore_errors=True)

    sc.setJobDescription("er: block_keys noop")
    t0 = time.monotonic()
    block_keys(pages, cfg).write.format("noop").mode("overwrite").save()
    out["t_block_keys_noop"] = round(time.monotonic() - t0, 2)

    sc.setJobDescription("er: block stage write path")
    d = tempfile.mkdtemp(prefix="er_blk_")
    t0 = time.monotonic()
    raw_blocks = block_keys(pages, cfg).persist()
    _, census = truncate_oversized(raw_blocks, cfg)
    trunc = census.collect()
    trunc_df = spark.createDataFrame(trunc or [], "block_key string, block_size long")
    kept = raw_blocks.join(F.broadcast(trunc_df.select("block_key")),
                           "block_key", "left_anti")
    salted_repartition(kept, cfg).write.mode("overwrite").parquet(f"{d}/b")
    raw_blocks.unpersist()
    out["t_block_census_salt_write"] = round(time.monotonic() - t0, 2)
    shutil.rmtree(d, ignore_errors=True)

    pages.unpersist()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
