#!/usr/bin/env python
"""Supplementary benchmarks the FROZEN bench.py cannot carry (r6 verdict
items 3 and 5). Prints ONE JSON line. Not part of the driver contract —
bench.py is the measured artifact; this file exists so OPTIMIZATION_r07.md
numbers are reproducible and window-qualified.

Sections:
  * telemetry  — per-run steal%% and busy%% from /proc/stat around every
    timed block (the r6 weather A/B proved this box swings the same
    commit 52↔135 s; numbers without window telemetry are not
    comparable across sessions).
  * enrichment — the reference's actual product path, execute_profile,
    at ~1M base rows × 3 sources with the fuzzy fallback ON, which the
    headline bench never exercises beyond test scale. Per-source walls
    come from running the profile with 1, 2 and 3 sources (deltas), so
    the numbers need no instrumentation inside the operator.

Env: $SPARK_GRAFT_CPUS (default 32), $SPARK_GRAFT_ENRICH_ROWS (default
1_000_000 base rows; each source covers the full base with ~1% typo'd
keys and ~1% misses).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))


def _cpu_sample() -> tuple[int, int, int]:
    f = open("/proc/stat").readline().split()
    vals = list(map(int, f[1:]))
    idle = vals[3] + vals[4]           # idle + iowait
    steal = vals[7] if len(vals) > 7 else 0
    return sum(vals), idle, steal


class _Window:
    """steal%% / busy%% over a timed region."""

    def __enter__(self):
        self.t0 = time.monotonic()
        self.s0 = _cpu_sample()
        return self

    def __exit__(self, *exc):
        t1, s1 = time.monotonic(), _cpu_sample()
        dt_total = s1[0] - self.s0[0]
        self.wall = round(t1 - self.t0, 3)
        self.steal_pct = round(100.0 * (s1[2] - self.s0[2]) / max(dt_total, 1), 3)
        self.busy_pct = round(
            100.0 * (dt_total - (s1[1] - self.s0[1])) / max(dt_total, 1), 2
        )


def main() -> None:
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))
    n_base = int(os.environ.get("SPARK_GRAFT_ENRICH_ROWS", "1000000"))
    os.environ.setdefault("SPARK_DRIVER_MEMORY", f"{min(cpus * 2, 16)}g")

    from pyspark.sql import functions as F

    from datamatcher_spark.operators.merge import ColumnMapping, WriteMode
    from datamatcher_spark.plans.profiles import (
        Profile,
        SourceSpec,
        execute_profile,
    )
    from datamatcher_spark.session import get_spark

    spark = get_spark("bench_extra", master=f"local[{cpus}]",
                      shuffle_partitions=max(cpus, 8))
    spark.sparkContext.setLogLevel("ERROR")

    work = tempfile.mkdtemp(prefix="bench_extra_")
    out: dict = {"metric": "bench_extra", "cpus": cpus, "n_base": n_base}

    # ---- deterministic synthetic catalog: base + 3 full-coverage sources
    # Keys are base-36 strings (diverse first chars, like EAN/indeks-mdm
    # families) so the fuzzy blocking's refined buckets stay under the
    # cap; each source covers the whole base with ~1%% keys typo'd in the
    # LAST char (fuzzy-only hits: same first-2 + same length, lev sim
    # 1−1/len) and ~1%% foreign keys (true misses) — fuzzy probes are
    # therefore ~2%% of base per source, the realistic regime (the
    # all-miss regime just truncates everything, logged).
    with _Window() as w:
        key = F.conv(
            ((F.col("id") * 2654435761) % (36 ** 6)).cast("string"), 10, 36
        )
        base = spark.range(n_base).select(
            key.alias("sku"),
            (F.col("id") % 1000).alias("cat"),
            F.lit(None).cast("string").alias("name"),
            F.lit(None).cast("double").alias("price"),
        )
        base.write.mode("overwrite").parquet(f"{work}/base.parquet")
        for i in range(3):
            typo = F.concat(F.left(key, F.length(key) - 1), F.lit("~"))
            src = spark.range(n_base).select(
                F.when(F.col("id") % 100 == 99 - i, typo)        # fuzzy-only
                .when(F.col("id") % 100 == 50 + i,               # miss
                      F.concat(F.lit("zz@"), F.col("id").cast("string")))
                .otherwise(key)
                .alias("sku"),
                F.concat(F.lit(f"name{i}_"), F.col("id").cast("string")).alias("nm"),
                (F.col("id") * 1.5 + i).alias("pr"),
            )
            src.write.mode("overwrite").parquet(f"{work}/src{i}.parquet")
    out["synth"] = {"wall": w.wall, "steal_pct": w.steal_pct, "busy_pct": w.busy_pct}

    def profile_with(k_sources: int) -> Profile:
        srcs = [
            SourceSpec(
                name=f"s{i}", path=f"{work}/src{i}.parquet", key_column="sku",
                key_options={"fuzzy_threshold": 0.85},
            )
            for i in range(k_sources)
        ]
        maps = []
        for i in range(k_sources):
            maps += [
                ColumnMapping(source_column="nm", target_column="name",
                              write_mode=WriteMode.FILL_EMPTY, source_id=f"s{i}"),
                ColumnMapping(source_column="pr", target_column="price",
                              write_mode=WriteMode.OVERWRITE, source_id=f"s{i}"),
            ]
        return Profile(
            name=f"bench_{k_sources}", mappings=maps, sources=srcs,
            base=SourceSpec(name="base", path=f"{work}/base.parquet",
                            key_column="sku"),
        )

    # untimed warm-up: the session's FIRST profile execution pays JVM
    # JIT/codegen and page-cache population — measured as a ~15-25 s
    # inflation of whichever k runs first (a cold k=1 leg measured
    # slower than a warm k=3 leg), which turns the per-source deltas
    # into noise. One throwaway single-source run makes the three timed
    # legs comparable.
    res, _, _ = execute_profile(
        spark, profile_with(1), work_dir=f"{work}/warmup"
    )
    res.write.format("noop").mode("overwrite").save()

    # Interleaved median-of-3 per source count: single-shot walls on
    # this box carry ±20 s tails at ~80 s (measured: a k=2 leg BELOW a
    # k=1 leg with steal ≈ 0), so one sample per k makes the per-source
    # deltas pure noise. Trials interleave (1,2,3)×3 so each k sees the
    # same window mix.
    samples: dict[int, list[dict]] = {1: [], 2: [], 3: []}
    for trial in range(3):
        for k in (1, 2, 3):
            # work_dir mode: each source fold materializes to parquet,
            # which truncates the chained fuzzy-rescue plan — without it
            # the k-th source's sub-plan embeds every earlier fold and
            # the wall grows superlinearly in k (measured at 100k rows:
            # 17.6 / +23.3 / +47.5 s lazy vs linear with
            # materialization). This is the documented production mode
            # (mid-job resume) — not a bench trick.
            shutil.rmtree(f"{work}/run{k}", ignore_errors=True)
            with _Window() as w:
                res, _, _ = execute_profile(
                    spark, profile_with(k), work_dir=f"{work}/run{k}"
                )
                res.write.format("noop").mode("overwrite").save()
            samples[k].append({"wall": w.wall, "steal_pct": w.steal_pct,
                               "busy_pct": w.busy_pct})
    walls = {
        k: sorted(s, key=lambda d: d["wall"])[1] for k, s in samples.items()
    }
    out["enrichment"] = {
        "fuzzy_threshold": 0.85,
        "walls_by_source_count": walls,
        "samples": samples,
        "per_source_wall_sec": [
            walls[1]["wall"],
            round(walls[2]["wall"] - walls[1]["wall"], 3),
            round(walls[3]["wall"] - walls[2]["wall"], 3),
        ],
        "rows_per_sec_3src": round(n_base / walls[3]["wall"], 1),
    }

    shutil.rmtree(work, ignore_errors=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
