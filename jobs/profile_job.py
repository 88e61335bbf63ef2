"""spark-submit entrypoint: table profiling + drift detection.

The statistical reconciliation surface (``operators.profile``): one
scan per side produces per-column row/null/distinct counts and value
ranges; two profiles join into a per-column drift report. At 100 TB
this is the health check an operator runs BEFORE deciding whether a
checksum or row-level reconcile is worth launching.

    # profile one table (versioned target or a plain parquet dir)
    spark-submit --py-files engine.zip jobs/profile_job.py \
        --target /path/tbl [--columns conv_id,turn_idx,text]

    # drift between two snapshots of the SAME table (time-travel)
    ... --target /path/tbl --baseline-version 3

    # drift between two tables (e.g. source extract vs target)
    ... --target /path/tbl --compare-parquet /path/extract

Prints one JSON line: per-column profile rows (single-table mode) or
the drift rows + drifted-column list (compare modes).
"""

from __future__ import annotations

import argparse
import json
import sys


def _load(spark, target: str | None, parquet: str | None, version=None):
    from etl_reconciliate_spark.target.table import TargetTable

    if target is not None:
        return TargetTable(spark, target).read(version=version)
    return spark.read.parquet(parquet)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--target", default=None, help="versioned target table")
    ap.add_argument("--parquet", default=None, help="plain parquet dir")
    ap.add_argument("--baseline-version", type=int, default=None,
                    help="with --target: drift of the CURRENT snapshot vs "
                         "this earlier version (time-travel compare)")
    ap.add_argument("--compare-target", default=None,
                    help="drift vs another versioned table")
    ap.add_argument("--compare-parquet", default=None,
                    help="drift vs another parquet dir")
    ap.add_argument("--columns", default=None,
                    help="comma-separated column subset (default: all "
                         "columns shared by both sides)")
    args = ap.parse_args()

    if (args.target is None) == (args.parquet is None):
        print("exactly one of --target / --parquet is required",
              file=sys.stderr)
        return 2
    n_compare = sum(
        x is not None
        for x in (args.baseline_version, args.compare_target,
                  args.compare_parquet)
    )
    if n_compare > 1:
        print("at most one compare mode", file=sys.stderr)
        return 2
    if args.baseline_version is not None and args.target is None:
        print("--baseline-version requires --target", file=sys.stderr)
        return 2

    from pyspark.sql import SparkSession

    spark = SparkSession.builder.appName("table_profile").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    from etl_reconciliate_spark.operators.profile import (
        column_profile,
        profile_drift,
    )
    from etl_reconciliate_spark.target.table import TargetTable

    # one-JSON-line contract on a not-yet-replayed target (r5 jobs
    # review); checked up front for BOTH versioned tables so main()
    # returns 1 like every sibling job instead of raising out of _load
    for t in (args.target, args.compare_target):
        if t is not None and not TargetTable(spark, t).exists():
            print(json.dumps({"error": f"no table at {t}"}))
            return 1

    cur = _load(spark, args.target, args.parquet)
    cols = args.columns.split(",") if args.columns else None

    if n_compare == 0:
        rows = [r.asDict() for r in column_profile(cur, cols).collect()]
        print(json.dumps({"mode": "profile", "columns": rows}))
        return 0

    if args.baseline_version is not None:
        try:
            base = _load(spark, args.target, None,
                         version=args.baseline_version)
        except (FileNotFoundError, ValueError) as e:
            # an expired (or never-committed) time-travel version —
            # same one-JSON-line degradation as the CDC jobs' expired
            # bases; the operator reruns against a retained version
            print(json.dumps({
                "error": f"baseline version {args.baseline_version} "
                         f"unavailable: {e}",
            }))
            return 1
        label = f"v{args.baseline_version}"
    else:
        base = _load(spark, args.compare_target, args.compare_parquet)
        label = args.compare_target or args.compare_parquet
    if cols is None:
        cols = [c for c in cur.columns if c in set(base.columns)]
    drift = profile_drift(base, cur, cols)
    rows = [r.asDict() for r in drift.collect()]
    drifted = sorted(r["column"] for r in rows if r["drifted"])
    print(json.dumps({
        "mode": "drift",
        "baseline": label,
        "columns": rows,
        "drifted_columns": drifted,
        "n_drifted": len(drifted),
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
