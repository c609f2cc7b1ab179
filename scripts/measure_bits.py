#!/usr/bin/env python
"""Decompose the dense path's rank+bitset build: how much is the
explode/join/groupBy aggregation vs the _bitset_udf Arrow crossing."""
from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from datamatcher_spark.operators.dedup import _bitset_udf, _spread, cache_scope
from datamatcher_spark.session import get_spark


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", 32))
    reps = int(os.environ.get("REPS", 3))
    os.environ.setdefault("SPARK_DRIVER_MEMORY", f"{min(cpus * 2, 16)}g")
    spark = get_spark("measure_bits", master=f"local[{cpus}]",
                      shuffle_partitions=max(cpus, 8))
    spark.sparkContext.setLogLevel("ERROR")
    sc = spark.sparkContext
    n = 5

    with cache_scope() as caches:
        norm = F.regexp_replace(F.lower(F.col("text").cast("string")), r"\s+", " ")
        df = spark.read.parquet(f"{sf_dir}/documents.parquet")
        base = _spread(df.select(F.col("doc_id"), F.col("text"))).select(
            F.col("doc_id").alias("id"), norm.alias("__norm")
        ).withColumn(
            "gh",
            F.sort_array(F.array_distinct(F.transform(
                F.expr(f"transform(sequence(0, greatest(length(__norm) - {n}, 0)), "
                       f"i -> substring(__norm, i + 1, {n}))"),
                lambda g: F.xxhash64(g)))),
        ).drop("__norm").persist()
        caches.append(base)
        base.count()

        exploded = base.select("id", F.explode("gh").alias("g"))
        dfreq = exploded.groupBy("g").agg(F.count("*").alias("dfreq")).persist()
        caches.append(dfreq)
        vocab = dfreq.count()
        rankmap = dfreq.withColumn(
            "rk", F.row_number().over(Window.orderBy("dfreq", "g")) - 1
        ).select("g", "rk")
        n_words = (vocab + 63) // 64

        rg_only = (
            exploded.join(F.broadcast(rankmap), "g")
            .groupBy("id")
            .agg(F.sort_array(F.collect_list("rk")).alias("rg"))
            .select("id", F.size("rg").alias("sz"), "rg")
        )
        with_udf = rg_only.select(
            "id", "sz", "rg", _bitset_udf(n_words)(F.col("rg")).alias("enc")
        ).select("id", "sz", "rg", F.col("enc.bs").alias("bs"),
                 F.col("enc.sk").alias("sk"))

        out = {"sf_dir": sf_dir, "vocab": vocab,
               "agg_only": [], "with_udf": []}
        for name, d in [("agg_only", rg_only), ("with_udf", with_udf)]:
            d.write.format("noop").mode("overwrite").save()  # warmup
        for r in range(reps):
            for name, d in [("agg_only", rg_only), ("with_udf", with_udf)]:
                sc.setJobDescription(f"bits:{name} rep{r}")
                t0 = time.monotonic()
                d.write.format("noop").mode("overwrite").save()
                out[name].append(round(time.monotonic() - t0, 2))
        out["medians"] = {k: sorted(out[k])[len(out[k]) // 2]
                          for k in ("agg_only", "with_udf")}
        print(json.dumps(out))


if __name__ == "__main__":
    main()
