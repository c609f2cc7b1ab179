#!/usr/bin/env python
"""Stage-decomposed timing of the r7 DENSE ngram path (guide §1.4):
base gram build, rank+bitset build, banded prefix table, candidate
self-join + filters, sketch filter selectivity, full verify. Mirrors
_ngram_dense_df_order's plan construction phase by phase.
"""
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
    _bitset_udf,
    _prefix_len_expr,
    _sketch_min_sum,
    _spread,
    cache_scope,
    ngram_jaccard_duplicates,
)
from datamatcher_spark.session import get_spark


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", 32))
    os.environ.setdefault("SPARK_DRIVER_MEMORY", f"{min(cpus * 2, 16)}g")
    spark = get_spark("measure_ngram_dense", master=f"local[{cpus}]",
                      shuffle_partitions=max(cpus, 8))
    spark.sparkContext.setLogLevel("ERROR")
    sc = spark.sparkContext

    n, threshold = 5, 0.85
    df = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out: dict = {"sf_dir": sf_dir, "cpus": cpus}

    with cache_scope() as caches:
        norm = F.regexp_replace(F.lower(F.col("text").cast("string")), r"\s+", " ")
        base = _spread(df.select(F.col("doc_id"), F.col("text"))).select(
            F.col("doc_id").alias("id"), norm.alias("__norm")
        ).withColumn(
            "gh",
            F.sort_array(
                F.array_distinct(
                    F.transform(
                        F.expr(
                            f"transform(sequence(0, greatest(length(__norm) - {n}, 0)), "
                            f"i -> substring(__norm, i + 1, {n}))"
                        ),
                        lambda g: F.xxhash64(g),
                    )
                )
            ),
        ).drop("__norm").persist()
        caches.append(base)

        sc.setJobDescription("dense: base gram build (persist+count)")
        t0 = time.monotonic()
        out["n_docs"] = base.count()
        out["t_base"] = round(time.monotonic() - t0, 2)

        sc.setJobDescription("dense: dfreq census")
        t0 = time.monotonic()
        exploded = base.select("id", F.explode("gh").alias("g"))
        dfreq = exploded.groupBy("g").agg(F.count("*").alias("dfreq")).persist()
        caches.append(dfreq)
        out["vocab"] = dfreq.count()
        out["t_census"] = round(time.monotonic() - t0, 2)

        rankmap = dfreq.withColumn(
            "rk", F.row_number().over(Window.orderBy("dfreq", "g")) - 1
        ).select("g", "rk")
        n_words = (out["vocab"] + 63) // 64
        bits = (
            exploded.join(F.broadcast(rankmap), "g")
            .groupBy("id")
            .agg(F.sort_array(F.collect_list("rk")).alias("rg"))
            .select("id", F.size("rg").alias("sz"), "rg",
                    _bitset_udf(n_words)(F.col("rg")).alias("enc"))
            .select("id", "sz", "rg", F.col("enc.bs").alias("bs"),
                    F.col("enc.sk").alias("sk"))
        ).persist()
        caches.append(bits)
        sc.setJobDescription("dense: rank+bitset build (persist+count)")
        t0 = time.monotonic()
        n_docs = bits.count()
        out["t_bits"] = round(time.monotonic() - t0, 2)

        banded = bits.select(
            "id", "sz",
            F.posexplode(
                F.slice(F.col("rg"), F.lit(1),
                        _prefix_len_expr(F.col("sz"), threshold))
            ).alias("pos", "rk"),
        )
        sc.setJobDescription("dense: banded noop")
        t0 = time.monotonic()
        banded.write.format("noop").mode("overwrite").save()
        out["t_banded_noop"] = round(time.monotonic() - t0, 2)

        a, b = banded.alias("a"), banded.alias("b")
        alpha = F.ceil(
            F.lit(threshold / (1.0 + threshold)) * (F.col("a.sz") + F.col("b.sz"))
            - F.lit(1e-9)
        )
        ubound = 1 + F.least(
            F.col("a.sz") - F.col("a.pos") - 1, F.col("b.sz") - F.col("b.pos") - 1
        )
        raw = (
            a.join(b, "rk")
            .filter(F.col("a.id") < F.col("b.id"))
            .filter(
                (F.col("b.sz") >= F.lit(threshold) * F.col("a.sz"))
                & (F.col("a.sz") >= F.lit(threshold) * F.col("b.sz"))
            )
            .filter(ubound >= alpha)
            .select(
                F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"),
                F.col("a.sz").alias("sz_a"), F.col("b.sz").alias("sz_b"),
            )
        )
        sc.setJobDescription("dense: candidate join+filters noop")
        t0 = time.monotonic()
        raw.write.format("noop").mode("overwrite").save()
        out["t_raw_noop"] = round(time.monotonic() - t0, 2)

        sc.setJobDescription("dense: candidate count")
        t0 = time.monotonic()
        out["n_candidates"] = raw.count()
        out["t_raw_count"] = round(time.monotonic() - t0, 2)

        ba = bits.select(F.col("id").alias("id_a"), F.col("bs").alias("bs_a"),
                         F.col("sk").alias("sk_a"))
        bb = bits.select(F.col("id").alias("id_b"), F.col("bs").alias("bs_b"),
                         F.col("sk").alias("sk_b"))
        ba, bb = F.broadcast(ba), F.broadcast(bb)
        pair_alpha = F.ceil(
            F.lit(threshold / (1.0 + threshold))
            * (F.col("sz_a") + F.col("sz_b")) - F.lit(1e-9)
        )
        attached = raw.join(ba, "id_a").join(bb, "id_b")

        sc.setJobDescription("dense: sketch filter only (count survivors)")
        t0 = time.monotonic()
        out["n_sketch_pass"] = attached.filter(
            _sketch_min_sum(F.col("sk_a"), F.col("sk_b")) >= pair_alpha
        ).count()
        out["t_sketch_count"] = round(time.monotonic() - t0, 2)

        inter = F.aggregate(
            F.zip_with(F.col("bs_a"), F.col("bs_b"),
                       lambda x, y: F.bit_count(x.bitwiseAND(y))),
            F.lit(0), lambda acc, v: acc + v,
        ).cast("double")
        union = (F.col("sz_a") + F.col("sz_b")).cast("double") - inter
        jaccard = F.when(union == 0, F.lit(1.0)).otherwise(inter / union)
        res = (
            attached.filter(
                (_sketch_min_sum(F.col("sk_a"), F.col("sk_b")) >= pair_alpha)
                & (jaccard >= threshold)
            )
            .select("id_a", "id_b", F.round(jaccard, 6).alias("jaccard"))
            .dropDuplicates(["id_a", "id_b"])
        )
        sc.setJobDescription("dense: full verify noop")
        t0 = time.monotonic()
        res.write.format("noop").mode("overwrite").save()
        out["t_verify_noop"] = round(time.monotonic() - t0, 2)

    sc.setJobDescription("dense: full operator noop")
    t0 = time.monotonic()
    with cache_scope() as caches2:
        ngram_jaccard_duplicates(
            df, "doc_id", "text", n=n, threshold=threshold, caches=caches2
        ).write.format("noop").mode("overwrite").save()
    out["t_full_operator"] = round(time.monotonic() - t0, 2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
