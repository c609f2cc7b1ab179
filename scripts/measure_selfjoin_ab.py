#!/usr/bin/env python
"""Warm interleaved A/B of the dense-path candidate self-join:
key on rk alone (r7 committed) vs composite (rk, size-bucket).
Both run to a noop sink over the identical banded/bits inputs."""
from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from datamatcher_spark.operators.dedup import (
    _bitset_udf, _prefix_len_expr, _spread, cache_scope,
)
from datamatcher_spark.session import get_spark


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", 32))
    reps = int(os.environ.get("REPS", 3))
    W = float(os.environ.get("W", 16))
    os.environ.setdefault("SPARK_DRIVER_MEMORY", f"{min(cpus * 2, 16)}g")
    spark = get_spark("selfjoin_ab", master=f"local[{cpus}]",
                      shuffle_partitions=max(cpus, 8))
    spark.sparkContext.setLogLevel("ERROR")
    sc = spark.sparkContext
    n, threshold = 5, 0.85

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
        exploded = base.select("id", F.explode("gh").alias("g"))
        dfreq = exploded.groupBy("g").agg(F.count("*").alias("dfreq")).persist()
        caches.append(dfreq)
        vocab = dfreq.count()
        rankmap = dfreq.withColumn(
            "rk", F.row_number().over(Window.orderBy("dfreq", "g")) - 1
        ).select("g", "rk")
        banded = (
            exploded.join(F.broadcast(rankmap), "g")
            .groupBy("id")
            .agg(F.sort_array(F.collect_list("rk")).alias("rg"))
            .select("id", F.size("rg").alias("sz"),
                    F.posexplode(
                        F.slice(F.col("rg"), F.lit(1),
                                _prefix_len_expr(F.size("rg"), threshold))
                    ).alias("pos", "rk"))
        ).persist()
        caches.append(banded)
        n_banded = banded.count()

        def filters(j):
            alpha = F.ceil(
                F.lit(threshold / (1.0 + threshold)) * (F.col("a.sz") + F.col("b.sz"))
                - F.lit(1e-9))
            ubound = 1 + F.least(
                F.col("a.sz") - F.col("a.pos") - 1, F.col("b.sz") - F.col("b.pos") - 1)
            return (
                j.filter(F.col("a.id") < F.col("b.id"))
                .filter((F.col("b.sz") >= F.lit(threshold) * F.col("a.sz"))
                        & (F.col("a.sz") >= F.lit(threshold) * F.col("b.sz")))
                .filter(ubound >= alpha)
                .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"),
                        F.col("a.sz").alias("sz_a"), F.col("b.sz").alias("sz_b"))
            )

        def make_old():
            a, b = banded.alias("a"), banded.alias("b")
            return filters(a.join(b, "rk"))

        def make_comp():
            a = banded.withColumn(
                "q",
                F.explode(F.sequence(
                    F.floor(F.lit(threshold) * F.col("sz") / F.lit(W)),
                    F.floor(F.col("sz") / F.lit(threshold) / F.lit(W)) + 1,
                ))).alias("a")
            b = banded.withColumn("bq", F.floor(F.col("sz") / F.lit(W))).alias("b")
            return filters(a.join(
                b, (F.col("a.rk") == F.col("b.rk")) & (F.col("a.q") == F.col("b.bq"))))

        def make_comp_bcast():
            a = banded.withColumn(
                "q",
                F.explode(F.sequence(
                    F.floor(F.lit(threshold) * F.col("sz") / F.lit(W)),
                    F.floor(F.col("sz") / F.lit(threshold) / F.lit(W)) + 1,
                ))).alias("a")
            b = banded.withColumn("bq", F.floor(F.col("sz") / F.lit(W))).alias("b")
            return filters(a.join(
                F.broadcast(b),
                (F.col("a.rk") == F.col("b.rk")) & (F.col("a.q") == F.col("b.bq"))))

        variants = {"old": make_old, "comp": make_comp, "comp_bcast": make_comp_bcast}
        out = {"sf_dir": sf_dir, "vocab": vocab, "n_banded": n_banded, "W": W,
               "times": {k: [] for k in variants}, "counts": {}}
        for name, mk in variants.items():
            out["counts"][name] = mk().count()  # warms + sanity: identical candidates
        for r in range(reps):
            for name, mk in variants.items():
                sc.setJobDescription(f"selfjoin:{name} rep{r}")
                t0 = time.monotonic()
                mk().write.format("noop").mode("overwrite").save()
                out["times"][name].append(round(time.monotonic() - t0, 2))
        out["medians"] = {k: sorted(v)[len(v) // 2] for k, v in out["times"].items()}
        print(json.dumps(out))


if __name__ == "__main__":
    main()
