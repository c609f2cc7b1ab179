#!/usr/bin/env python
"""Stage-decomposed timing of dedup_minhash_lsh (guide §1.4): signature
build, band table, pair-gen+dedup, token sets, verify."""
from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F

from datamatcher_spark.functions.minhash import (
    jaccard_distinct_sets_expr,
    lsh_band_keys_expr,
    minhash_signature_udf,
    shingle_hashes_expr,
    tokens_expr,
    word_shingles_expr,
)
from datamatcher_spark.operators.dedup import _spread, cache_scope, minhash_near_duplicates
from datamatcher_spark.session import get_spark


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", 32))
    os.environ.setdefault("SPARK_DRIVER_MEMORY", f"{min(cpus * 2, 16)}g")
    spark = get_spark("measure_minhash", master=f"local[{cpus}]",
                      shuffle_partitions=max(cpus, 8))
    spark.sparkContext.setLogLevel("ERROR")
    sc = spark.sparkContext
    out: dict = {"sf_dir": sf_dir}
    shingle_words, k, bands, rows, t = 3, 64, 16, 4, 0.6
    max_band_size = 500

    df0 = spark.read.parquet(f"{sf_dir}/documents.parquet")
    with cache_scope() as caches:
        df = _spread(df0.select(F.col("doc_id"), F.col("text")))
        base = df.select(
            F.col("doc_id").alias("id"), tokens_expr(F.col("text")).alias("toks"),
        ).withColumn(
            "hs", shingle_hashes_expr(
                word_shingles_expr(None, shingle_words, tokens=F.col("toks")))
        ).withColumn("sig", minhash_signature_udf(k, 1337)(F.col("hs")))
        banded = base.select(
            "id", F.explode(lsh_band_keys_expr(F.col("sig"), bands, rows)).alias("bk")
        ).persist()
        caches.append(banded)
        sc.setJobDescription("mh: banded build")
        t0 = time.monotonic()
        out["n_banded"] = banded.count()
        out["t_banded"] = round(time.monotonic() - t0, 2)

        sizes = banded.groupBy("bk").count().filter(F.col("count") > max_band_size)
        kept = banded.join(F.broadcast(sizes.select("bk")), "bk", "left_anti")
        a, b = kept.alias("a"), kept.alias("b")
        sc.setJobDescription("mh: raw pair emission count")
        t0 = time.monotonic()
        rawp = a.join(b, "bk").filter(F.col("a.id") < F.col("b.id")).select(
            F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        out["n_raw_pairs"] = rawp.count()
        out["t_raw_pairs"] = round(time.monotonic() - t0, 2)

        sc.setJobDescription("mh: dedup pairs")
        t0 = time.monotonic()
        pairs = rawp.dropDuplicates(["id_a", "id_b"]).persist()
        caches.append(pairs)
        out["n_pairs"] = pairs.count()
        out["t_pairs_dedup"] = round(time.monotonic() - t0, 2)

        tokh = df.select(
            F.col("doc_id").alias("id"),
            F.array_sort(F.array_distinct(
                F.transform(tokens_expr(F.col("text")), lambda x: F.xxhash64(x))
            )).alias("th"),
        ).persist()
        caches.append(tokh)
        sc.setJobDescription("mh: token sets build")
        t0 = time.monotonic()
        out["n_docs"] = tokh.count()
        out["t_tokh"] = round(time.monotonic() - t0, 2)

        ta = tokh.select(F.col("id").alias("id_a"), F.col("th").alias("th_a"))
        tb = tokh.select(F.col("id").alias("id_b"), F.col("th").alias("th_b"))
        sc.setJobDescription("mh: verify")
        t0 = time.monotonic()
        res = (
            pairs.join(F.broadcast(ta), "id_a").join(F.broadcast(tb), "id_b")
            .withColumn("jaccard", jaccard_distinct_sets_expr(F.col("th_a"), F.col("th_b")))
            .filter(F.col("jaccard") >= t)
            .select("id_a", "id_b", F.round("jaccard", 6).alias("jaccard"))
        )
        res.write.format("noop").mode("overwrite").save()
        out["t_verify"] = round(time.monotonic() - t0, 2)

    sc.setJobDescription("mh: full operator noop (warm)")
    t0 = time.monotonic()
    with cache_scope() as c2:
        minhash_near_duplicates(
            df0, "doc_id", "text", jaccard_threshold=t, caches=c2
        ).write.format("noop").mode("overwrite").save()
    out["t_full_warm"] = round(time.monotonic() - t0, 2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
