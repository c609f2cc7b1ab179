#!/usr/bin/env python
"""One-shot COLD timing of dedup_ngram_jaccard: fresh session, one run,
print seconds + output digest (count + order-independent xxhash64 sum
over (id_a,id_b,jaccard)) so before/after equivalence rides along."""
from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F

from datamatcher_spark.operators.dedup import cache_scope, ngram_jaccard_duplicates
from datamatcher_spark.session import get_spark


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", 32))
    os.environ.setdefault("SPARK_DRIVER_MEMORY", f"{min(cpus * 2, 16)}g")
    spark = get_spark("measure_ngram_cold", master=f"local[{cpus}]",
                      shuffle_partitions=max(cpus, 8))
    spark.sparkContext.setLogLevel("ERROR")
    df = spark.read.parquet(f"{sf_dir}/documents.parquet")
    t0 = time.monotonic()
    with cache_scope() as caches:
        ngram_jaccard_duplicates(
            df, "doc_id", "text", n=5, threshold=0.85, caches=caches
        ).write.format("noop").mode("overwrite").save()
    wall = round(time.monotonic() - t0, 2)
    with cache_scope() as caches:
        res = ngram_jaccard_duplicates(
            df, "doc_id", "text", n=5, threshold=0.85, caches=caches
        )
        dig = res.select(
            F.xxhash64("id_a", "id_b", "jaccard").alias("xh")
        ).agg(
            F.count("*").alias("n"), F.expr("bit_xor(xh)").alias("h")
        ).collect()[0]
    print(json.dumps({"sf_dir": sf_dir, "wall_cold": wall,
                      "rows": dig["n"], "digest": dig["h"]}))


if __name__ == "__main__":
    main()
