#!/usr/bin/env python
"""spark-submit entry point for the record-linkage pipeline.

Cluster:
  spark-submit --py-files datamatcher_spark.zip scripts/run_pipeline.py \
      --input iceberg_catalog.db.pages --work-dir s3://bucket/linkage \
      --run-id r42 --config job.json

Sandbox / local:
  python scripts/run_pipeline.py --n-docs 20000 --work-dir /tmp/linkage \
      --run-id demo

Analogue of the reference headless CLI (main.py:8-9,154-213): config in,
deterministic job out, stats on stdout, resumable by (work-dir, run-id).
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    ap = argparse.ArgumentParser(description="3-stage record-linkage pipeline")
    src = ap.add_mutually_exclusive_group(required=True)
    src.add_argument("--input", help="pages input: parquet path or catalog table")
    src.add_argument("--n-docs", type=int, help="synthesize a seeded pages corpus")
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument("--work-dir", required=True)
    ap.add_argument("--run-id", required=True)
    ap.add_argument("--config", help="PipelineConfig JSON (optional)")
    ap.add_argument("--master", default=None, help="override master (local only)")
    ap.add_argument("--output", help="also write clusters to this parquet path")
    args = ap.parse_args()

    from datamatcher_spark.plans.config import PipelineConfig
    from datamatcher_spark.plans.run import run_pipeline
    from datamatcher_spark.session import ensure_package_shipped, get_spark

    spark = get_spark("datamatcher-pipeline", master=args.master)
    ensure_package_shipped(spark)
    cfg = PipelineConfig.from_json(args.config) if args.config else PipelineConfig()

    if args.input:
        if "/" in args.input or args.input.endswith(".parquet"):
            pages = spark.read.parquet(args.input)
        else:
            pages = spark.read.table(args.input)
    else:
        from datamatcher_spark.sources.synth import generate_pages

        pages = generate_pages(spark, n_docs=args.n_docs, seed=args.seed)

    res = run_pipeline(spark, pages, args.work_dir, args.run_id, cfg)
    if args.output:
        res.clusters.write.mode("overwrite").parquet(args.output)

    print(
        json.dumps(
            {
                "run_id": args.run_id,
                "stages_run": res.stages_run,
                "stages_skipped": res.stages_skipped,
                "counts": res.counts,
                "clusters_path": res.metrics.stage_output_path("cluster"),
                "metrics_path": str(res.metrics.metrics_dir),
            },
            indent=2,
        )
    )


if __name__ == "__main__":
    main()
