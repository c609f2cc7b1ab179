#!/usr/bin/env python
"""Capture ``explain("formatted")`` for named catalog queries into text
files (the r07 plan-diff artifacts). Usable from any checkout: the repo
whose CATALOG is rendered is the one containing this script, so running
the copy inside a round-start worktree yields the *_before.txt plans.

Usage:
  python scripts/capture_plans.py SF_DIR OUT_DIR SUFFIX query [query ...]

Writes OUT_DIR/<query>_<SUFFIX>.txt for each query name.
"""

from __future__ import annotations

import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def main() -> None:
    sf_dir, out_dir, suffix, *names = sys.argv[1:]
    out = Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)

    from datamatcher_spark.queries_catalog import CATALOG
    from datamatcher_spark.session import get_spark

    spark = get_spark("capture_plans", master="local[4]", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")

    for name in names:
        df = CATALOG[name].spark(spark, sf_dir)
        jdf = df._jdf
        text = spark._jvm.PythonSQLUtils.explainString(
            jdf.queryExecution(), "formatted"
        )
        path = out / f"{name}_{suffix}.txt"
        path.write_text(text)
        print(f"wrote {path}")


if __name__ == "__main__":
    main()
