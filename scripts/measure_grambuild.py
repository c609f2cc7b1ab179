#!/usr/bin/env python
"""A/B decomposition of dedup_ngram_jaccard's base gram build (guide
#1.1/#1.4): where do the seconds go, and does byte-indexed slicing beat
char-indexed slicing?

Variants (all noop-sink, labeled, interleaved, N reps):
  scan      scan + _spread repartition + normalize only (control)
  chars     current shape: substring(__norm, i+1, n) per gram (char
            offsets -- UTF8String walks from byte 0 per call, O(len)
            per gram) + xxhash64 + array_distinct + sort_array
  bytes     same but substring over cast(__norm as binary) (byte
            offsets, O(1) slice); hash input is byte-identical for
            pure-ASCII rows, so xxhash64 values are identical there
  guarded   per-row CASE WHEN length=octet_length THEN bytes ELSE chars
            (the shippable form: exact for any input)

Also verifies corpus-wide that guarded == chars on the gh arrays.
"""
from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F

from datamatcher_spark.operators.dedup import _spread
from datamatcher_spark.session import get_spark

N = 5


def gram_chars(col: str) -> F.Column:
    return F.sort_array(
        F.array_distinct(
            F.transform(
                F.expr(
                    f"transform(sequence(0, greatest(length({col}) - {N}, 0)), "
                    f"i -> substring({col}, i + 1, {N}))"
                ),
                lambda g: F.xxhash64(g),
            )
        )
    )


def gram_bytes(col: str) -> F.Column:
    return F.sort_array(
        F.array_distinct(
            F.expr(
                f"transform(sequence(0, greatest(octet_length({col}) - {N}, 0)), "
                f"i -> xxhash64(substring(cast({col} as binary), i + 1, {N})))"
            )
        )
    )


def gram_guarded(col: str) -> F.Column:
    return F.when(
        F.length(col) == F.octet_length(col), gram_bytes(col)
    ).otherwise(gram_chars(col))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", 32))
    reps = int(os.environ.get("REPS", 3))
    os.environ.setdefault("SPARK_DRIVER_MEMORY", f"{min(cpus * 2, 16)}g")
    spark = get_spark("measure_grambuild", master=f"local[{cpus}]",
                      shuffle_partitions=max(cpus, 8))
    spark.sparkContext.setLogLevel("ERROR")
    sc = spark.sparkContext

    norm = F.regexp_replace(F.lower(F.col("text").cast("string")), r"\s+", " ")

    def base_df():
        df = spark.read.parquet(f"{sf_dir}/documents.parquet")
        return _spread(df.select(F.col("doc_id"), F.col("text"))).select(
            F.col("doc_id").alias("id"), norm.alias("__norm")
        )

    variants = {
        "scan": lambda: base_df(),
        "chars": lambda: base_df().withColumn("gh", gram_chars("__norm")).drop("__norm"),
        "bytes": lambda: base_df().withColumn("gh", gram_bytes("__norm")).drop("__norm"),
        "guarded": lambda: base_df().withColumn("gh", gram_guarded("__norm")).drop("__norm"),
    }

    out: dict = {"sf_dir": sf_dir, "cpus": cpus, "reps": reps,
                 "times": {k: [] for k in variants}}
    # warmup: one pass of each
    for name, make in variants.items():
        make().write.format("noop").mode("overwrite").save()
    for r in range(reps):
        for name, make in variants.items():
            sc.setJobDescription(f"grambuild:{name} rep{r}")
            t0 = time.monotonic()
            make().write.format("noop").mode("overwrite").save()
            out["times"][name].append(round(time.monotonic() - t0, 3))
    sc.setJobDescription("grambuild: equivalence guarded vs chars")
    a = base_df().withColumn("gh_a", gram_chars("__norm"))
    b = base_df().withColumn("gh_b", gram_guarded("__norm"))
    mism = (
        a.select("id", "gh_a").join(b.select("id", "gh_b"), "id")
        .filter(F.col("gh_a") != F.col("gh_b")).count()
    )
    out["guarded_vs_chars_mismatches"] = mism
    out["medians"] = {k: sorted(v)[len(v) // 2] for k, v in out["times"].items()}
    print(json.dumps(out))


if __name__ == "__main__":
    main()
