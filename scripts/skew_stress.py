#!/usr/bin/env python
"""Adversarial skew stress at bench shape (judge r5 item 4): a
mega-domain holding ~10% of docs plus a boilerplate band whose text is
byte-identical corpus-wide, run through block → truncate → salt → pair →
score at local[$SPARK_GRAFT_CPUS]. Records the truncation census and the
score stage's per-task wall/row skew (max/median), measured with an
in-job per-partition timer so the pipelined scoring compute is what's
being timed. Writes BENCH/skew_stress_r{N}.json.

Usage: python scripts/skew_stress.py [round_tag] [n_base]
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "r06"
    n_base = int(sys.argv[2]) if len(sys.argv) > 2 else 100_000
    n_mega = n_base // 8
    n_boiler = n_base // 20
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))

    import pandas as pd
    from pyspark import TaskContext
    from pyspark.sql import functions as F

    from datamatcher_spark.plans.blocking import (
        block_keys,
        features,
        salted_repartition,
        truncate_oversized,
    )
    from datamatcher_spark.plans.config import PipelineConfig
    from datamatcher_spark.plans.scoring import candidate_pairs, score_pairs
    from datamatcher_spark.session import get_spark
    from datamatcher_spark.sources.synth import generate_adversarial_pages

    os.environ.setdefault("SPARK_DRIVER_MEMORY", f"{min(cpus * 2, 16)}g")
    spark = get_spark("skew-stress", master=f"local[{cpus}]",
                      shuffle_partitions=max(cpus, 8))
    spark.sparkContext.setLogLevel("ERROR")

    cfg = PipelineConfig()
    pages = generate_adversarial_pages(
        spark, n_base=n_base, n_mega=n_mega, n_boiler=n_boiler, seed=11
    ).cache()
    n_docs = pages.count()

    t0 = time.monotonic()
    raw = block_keys(pages, cfg).persist()
    kept, truncated = truncate_oversized(raw, cfg)
    census = {r.block_key: r.block_size for r in truncated.collect()}
    mega_size = census.get("dom:mega-hub.example")
    big_bands = {k: v for k, v in census.items()
                 if k.startswith("lsh:") and v >= n_boiler}

    feats = features(pages, cfg)
    pairs = candidate_pairs(salted_repartition(kept, cfg))
    scored = score_pairs(pairs, feats, cfg).select(
        "jw_title", "jaccard_text", "score", "accepted"
    )

    def timer(batches):
        s = time.monotonic()
        n = 0
        for b in batches:
            n += len(b)
        yield pd.DataFrame(
            {"pid": [TaskContext.get().partitionId()],
             "rows": [n], "sec": [time.monotonic() - s]}
        )

    stats = scored.mapInPandas(timer, "pid int, rows long, sec double").collect()
    wall = round(time.monotonic() - t0, 3)
    raw.unpersist()
    pages.unpersist()

    rows = sorted(r.rows for r in stats)
    secs = sorted(r.sec for r in stats)
    med_rows = rows[len(rows) // 2]
    med_sec = secs[len(secs) // 2]
    out = {
        "purpose": (
            "Adversarial skew stress: one mega-domain (~10% of docs, "
            "distinct texts) + one boilerplate band (identical text, "
            "distinct domains). Asserts the truncation census logs both "
            "pathologies and measures the salted score stage's task skew."
        ),
        "tag": tag,
        "cpus": cpus,
        "docs": n_docs,
        "n_base": n_base,
        "n_mega": n_mega,
        "n_boiler": n_boiler,
        "wall_sec": wall,
        "census": {
            "entries": len(census),
            "mega_domain_size": mega_size,
            "boiler_bands_logged": len(big_bands),
            "lsh_bands_expected": cfg.lsh_bands,
        },
        "score_stage_tasks": len(stats),
        "pairs_scored": int(sum(rows)),
        "task_rows": {"max": rows[-1], "median": med_rows,
                      "ratio": round(rows[-1] / max(med_rows, 1), 3)},
        "task_sec": {"max": round(secs[-1], 3), "median": round(med_sec, 3),
                     "ratio": round(secs[-1] / max(med_sec, 1e-3), 3)},
    }
    dest = Path(__file__).resolve().parent.parent / "BENCH" / f"skew_stress_{tag}.json"
    dest.write_text(json.dumps(out, indent=2))
    print(json.dumps(out))


if __name__ == "__main__":
    main()
