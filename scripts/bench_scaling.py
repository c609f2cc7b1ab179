#!/usr/bin/env python
"""The BASELINE scaling experiment: identical ER pipeline job, identical
synthetic input, at local[N] and local[4N] — throughput at both plus
scaling efficiency (T_N / T_4N) / 4 (the sandbox proxy for N vs 4N
executors; no real cluster here). Writes BENCH/scaling.json and is the
source for the numbers in BENCH/BASELINE.md.

Usage: python scripts/bench_scaling.py [n_docs] [N]
"""

from __future__ import annotations

import json
import shutil
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def run_once(cores: int, n_docs: int, seed: int = 42) -> dict:
    # fresh JVM per parallelism level so nothing is shared
    from datamatcher_spark.plans.config import PipelineConfig
    from datamatcher_spark.plans.run import run_pipeline
    from datamatcher_spark.session import get_spark
    from datamatcher_spark.sources.synth import corpus_fingerprint, generate_pages

    spark = get_spark(f"scaling-{cores}", master=f"local[{cores}]",
                      shuffle_partitions=max(cores * 2, 8))
    spark.sparkContext.setLogLevel("ERROR")
    pages = generate_pages(spark, n_docs=n_docs, seed=seed,
                           n_partitions=cores * 2).cache()
    n_rows = pages.count()
    fp = corpus_fingerprint(pages)

    work = tempfile.mkdtemp(prefix=f"scale{cores}_")
    t0 = time.monotonic()
    res = run_pipeline(spark, pages, work, f"scale{cores}", PipelineConfig())
    wall = time.monotonic() - t0
    out = {
        "cores": cores,
        "rows": n_rows,
        "corpus_fingerprint": fp,
        "wall_sec": round(wall, 2),
        "pairs_scored": res.counts["pairs_scored"],
        "score_wall_ms": res.counts["score_wall_ms"],
        "pairs_per_sec_score_stage": round(
            res.counts["pairs_scored"] / (res.counts["score_wall_ms"] / 1000.0), 1
        ),
        "docs_per_sec_end_to_end": round(n_rows / wall, 1),
        "clusters": res.counts["clusters"],
    }
    shutil.rmtree(work, ignore_errors=True)
    spark.stop()
    return out


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 60_000
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 8

    lo = run_once(n, n_docs)
    hi = run_once(4 * n, n_docs)
    assert lo["corpus_fingerprint"] == hi["corpus_fingerprint"], "inputs differ!"
    assert lo["clusters"] == hi["clusters"], "results differ across parallelism!"

    eff_e2e = (lo["wall_sec"] / hi["wall_sec"]) / 4
    thr_lo = lo["docs_per_sec_end_to_end"]
    thr_hi = hi["docs_per_sec_end_to_end"]
    result = {
        "n_docs": n_docs,
        "low": lo,
        "high": hi,
        "throughput_ratio": round(thr_hi / thr_lo, 3),
        "scaling_efficiency": round(eff_e2e, 3),
        "target": 0.8,
        "passes": eff_e2e >= 0.8,
    }
    out = Path(__file__).resolve().parent.parent / "BENCH" / "scaling.json"
    out.parent.mkdir(exist_ok=True)
    out.write_text(json.dumps(result, indent=2))
    print(json.dumps(result, indent=2))


if __name__ == "__main__":
    main()
