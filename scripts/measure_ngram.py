#!/usr/bin/env python
"""Stage-decomposed timing of dedup_ngram_jaccard (guide §1: measure
first, isolate with noop). Phases are materialized in the same order the
real lazy plan would compute them (base and banded are persisted inside
the operator, so counting them first only moves the cost into a labeled
job; the final noop then reuses the caches exactly as the one-shot plan
would)."""
from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F

from datamatcher_spark.functions.minhash import jaccard_distinct_sets_expr
from datamatcher_spark.operators.dedup import (
    _prefix_len_expr,
    cache_scope,
)
from datamatcher_spark.session import get_spark


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", 32))
    os.environ.setdefault("SPARK_DRIVER_MEMORY", f"{min(cpus * 2, 16)}g")
    spark = get_spark("measure_ngram", master=f"local[{cpus}]",
                      shuffle_partitions=max(cpus, 8))
    spark.sparkContext.setLogLevel("ERROR")
    sc = spark.sparkContext

    n, threshold = 5, 0.85
    df = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out: dict = {"sf_dir": sf_dir, "cpus": cpus}

    t_all0 = time.monotonic()
    with cache_scope() as caches:
        norm = F.regexp_replace(F.lower(F.col("text").cast("string")), r"\s+", " ")
        base = df.select(F.col("doc_id").alias("id"), norm.alias("__norm")).withColumn(
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

        sc.setJobDescription("ngram: base gram build")
        t0 = time.monotonic()
        out["n_docs"] = base.count()
        out["t_base"] = round(time.monotonic() - t0, 2)

        sc.setJobDescription("ngram: df-order banded build")
        t0 = time.monotonic()
        exploded = base.select("id", F.explode("gh").alias("g"))
        dfreq = exploded.groupBy("g").agg(F.count("*").alias("dfreq"))
        ranked = (
            exploded.join(F.broadcast(dfreq), "g")
            .groupBy("id")
            .agg(F.array_sort(F.collect_list(F.struct("dfreq", "g"))).alias("rg"))
        )
        banded = ranked.select(
            "id",
            F.size("rg").alias("sz"),
            F.posexplode(
                F.slice(F.col("rg"), F.lit(1), _prefix_len_expr(F.size("rg"), threshold))
            ).alias("pos", "s"),
        ).select("id", "sz", "pos", F.col("s.g").alias("bk")).persist()
        caches.append(banded)
        out["n_banded"] = banded.count()
        out["t_banded"] = round(time.monotonic() - t0, 2)

        sc.setJobDescription("ngram: raw candidate join (pre-distinct count)")
        t0 = time.monotonic()
        a, b = banded.alias("a"), banded.alias("b")
        alpha = F.ceil(
            F.lit(threshold / (1.0 + threshold)) * (F.col("a.sz") + F.col("b.sz"))
            - F.lit(1e-9)
        )
        ubound = 1 + F.least(
            F.col("a.sz") - F.col("a.pos") - 1, F.col("b.sz") - F.col("b.pos") - 1
        )
        raw = (
            a.join(b, "bk")
            .filter(F.col("a.id") < F.col("b.id"))
            .filter(
                (F.col("b.sz") >= F.lit(threshold) * F.col("a.sz"))
                & (F.col("a.sz") >= F.lit(threshold) * F.col("b.sz"))
            )
            .filter(ubound >= alpha)
        )
        out["n_raw_cand"] = raw.count()
        out["t_raw_cand_count"] = round(time.monotonic() - t0, 2)

        sc.setJobDescription("ngram: distinct pairs")
        t0 = time.monotonic()
        pairs = raw.select(
            F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b")
        ).distinct().persist()
        caches.append(pairs)
        out["n_pairs"] = pairs.count()
        out["t_distinct"] = round(time.monotonic() - t0, 2)

        sc.setJobDescription("ngram: verify join")
        t0 = time.monotonic()
        ga = base.select(F.col("id").alias("id_a"), F.col("gh").alias("gh_a"))
        gb = base.select(F.col("id").alias("id_b"), F.col("gh").alias("gh_b"))
        res = (
            pairs.join(ga, "id_a")
            .join(gb, "id_b")
            .filter(
                (F.size("gh_b") >= F.lit(threshold) * F.size("gh_a"))
                & (F.size("gh_a") >= F.lit(threshold) * F.size("gh_b"))
            )
            .withColumn(
                "jaccard", jaccard_distinct_sets_expr(F.col("gh_a"), F.col("gh_b"))
            )
            .filter(F.col("jaccard") >= threshold)
            .select("id_a", "id_b", F.round("jaccard", 6).alias("jaccard"))
        )
        res.write.format("noop").mode("overwrite").save()
        out["t_verify"] = round(time.monotonic() - t0, 2)
    out["t_total_decomposed"] = round(time.monotonic() - t_all0, 2)

    # one clean end-to-end run of the real operator for reference
    from datamatcher_spark.operators.dedup import ngram_jaccard_duplicates

    sc.setJobDescription("ngram: full operator noop")
    t0 = time.monotonic()
    with cache_scope() as caches:
        ngram_jaccard_duplicates(
            df, "doc_id", "text", n=n, threshold=threshold, caches=caches
        ).write.format("noop").mode("overwrite").save()
    out["t_full_operator"] = round(time.monotonic() - t0, 2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
