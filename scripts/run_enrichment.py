#!/usr/bin/env python
"""spark-submit entry point for the enrichment/merge workflow — the
reference's headless "drop a file, get the enriched table + report" run.

  python scripts/run_enrichment.py --profile profiles/supplier.json \
      --output /tmp/enriched --report /tmp/raport.txt

Auto-profile (reference utils/config.py:153-168 match_profile): pass the
incoming file and a patterns JSON ([{"pattern": "...", "profile": "..."}]
in precedence order) instead of a fixed profile:

  python scripts/run_enrichment.py --source new_supplier_feed.csv \
      --auto-profile patterns.json --output /tmp/enriched
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    ap = argparse.ArgumentParser(description="profile-driven enrichment job")
    ap.add_argument("--profile", help="Profile JSON path")
    ap.add_argument("--auto-profile",
                    help="patterns JSON; selects the profile from --source's filename")
    ap.add_argument("--source",
                    help="incoming source file (required with --auto-profile; "
                         "overrides the first source path in the profile)")
    ap.add_argument("--output", required=True, help="enriched parquet output dir")
    ap.add_argument("--report", help="text run-report path")
    ap.add_argument("--unmatched", help="unmatched-keys CSV dir")
    ap.add_argument("--master", default=None)
    args = ap.parse_args()

    from datamatcher_spark.operators.report_render import (
        collect_run_stats,
        export_unmatched,
        save_report,
    )
    from datamatcher_spark.plans.profiles import (
        Profile,
        execute_profile,
        match_profile,
    )
    from datamatcher_spark.session import get_spark

    if args.auto_profile:
        if not args.source:
            ap.error("--auto-profile requires --source")
        patterns = json.loads(Path(args.auto_profile).read_text())
        prof_path = match_profile(Path(args.source).name, patterns)
        if prof_path is None:
            print(f"no profile pattern matches {args.source!r}", file=sys.stderr)
            sys.exit(2)
        print(f"auto-selected profile: {prof_path}")
    elif args.profile:
        prof_path = args.profile
    else:
        ap.error("pass --profile or --auto-profile")

    profile = Profile.from_json(prof_path)
    if args.source and profile.sources:
        profile.sources[0].path = args.source

    spark = get_spark("datamatcher-enrichment", master=args.master)
    result, sources_info, mappings_info = execute_profile(spark, profile)
    result.write.mode("overwrite").parquet(args.output)

    stats = collect_run_stats(
        spark.read.parquet(args.output), profile.base.key_column
    )
    for m in mappings_info:
        m["cells_changed"] = stats["cells_changed_by_target"].get(
            m["target_column"], 0
        )
    base_name = Path(profile.base.path).name
    if args.report:
        save_report(args.report, stats, base_name, profile.base.key_column,
                    sources_info, mappings_info)
        print(f"report: {args.report}")
    if args.unmatched:
        export_unmatched(
            spark.read.parquet(args.output), profile.base.key_column, args.unmatched
        )
    print(json.dumps({k: v for k, v in stats.items() if k != "unmatched_keys"}))


if __name__ == "__main__":
    main()
