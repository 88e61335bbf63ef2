"""spark-submit entrypoint: incremental-changes export (CDC-out).

Emits the net row-level changes between two committed snapshots of the
target table (``TargetTable.read_changes`` — the Iceberg
``table_changes`` / Delta CDF analog), so downstream consumers can tail
the lake table itself instead of re-reading full snapshots or the
upstream change log. Tracks its own consumer cursor: with
``--cursor-file``, the job reads the last exported version from the
file, exports ``(cursor, current]``, and advances the cursor only after
the export is fully written (at-least-once delivery; the output dir is
per-version-range so re-running an interrupted export overwrites it).
A MISSING cursor file bootstraps the consumer: the full current live
state is exported as ``insert`` rows (the initial snapshot load every
change-feed consumer starts from — old versions may already be expired),
and subsequent runs are incremental.

    spark-submit --py-files engine.zip jobs/changes_job.py \
        --target /path/tbl --cursor-file /path/cursor \
        --out /path/changes
    # or an explicit range, no cursor:
    ... --from-version 3 [--to-version 7] [--out /path/changes]

Prints one JSON line: versions, per-change-type counts, output path.
"""

from __future__ import annotations

import argparse
import json
import os
import sys


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--target", required=True)
    ap.add_argument("--from-version", type=int, default=None)
    ap.add_argument("--to-version", type=int, default=None)
    ap.add_argument("--cursor-file", default=None,
                    help="consumer cursor: read last exported version "
                         "from here (missing file = 0), advance after a "
                         "successful export; mutually exclusive with "
                         "--from-version")
    ap.add_argument("--out", default=None,
                    help="write the change rows as parquet under "
                         "OUT/v{from}-v{to}/ (omit to only count)")
    args = ap.parse_args()

    if (args.cursor_file is None) == (args.from_version is None):
        print("exactly one of --from-version / --cursor-file is required",
              file=sys.stderr)
        return 2

    from pyspark.sql import SparkSession, functions as F

    spark = SparkSession.builder.appName("cdc_changes").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    from etl_reconciliate_spark.target.table import TargetTable

    table = TargetTable(spark, args.target)
    if not table.exists():
        # keep the one-JSON-line stdout contract on a not-yet-replayed
        # target (first cron run) instead of a FileNotFoundError
        # traceback (r5 jobs review; same guard as maintain/rollup)
        print(json.dumps({"error": f"no table at {args.target}"}))
        return 1
    from_v = args.from_version
    bootstrap = False
    if args.cursor_file is not None:
        if os.path.exists(args.cursor_file):
            with open(args.cursor_file) as f:
                from_v = int(f.read().strip())
        else:
            bootstrap = True
    to_v = args.to_version if args.to_version is not None else table.current_version()
    if args.to_version is not None:
        # validate the TO side up front: a to_version that was never
        # committed (operator typo, table rollback) would otherwise
        # surface as SnapshotExpiredError from read_changes and be
        # misread as an expired CURSOR — triggering a bootstrap read at
        # the nonexistent version that dies in a FileNotFoundError
        # traceback (r5 review). Caller error → loud, cursor intact.
        try:
            table.metadata(to_v)
        except FileNotFoundError as e:
            print(json.dumps({
                "error": f"to_version {to_v} is not a committed, "
                         f"retained version: {e}",
            }))
            return 2

    mode = "bootstrap" if bootstrap else "incremental"
    if not bootstrap:
        from etl_reconciliate_spark.target.table import SnapshotExpiredError

        try:
            changes = table.read_changes(from_v, to_v)
        except SnapshotExpiredError as e:
            if args.cursor_file is None:
                # an explicit --from-version the caller asked for is
                # gone — nothing sensible to emit in its place; keep
                # the one-JSON-line contract instead of a traceback
                print(json.dumps({
                    "error": f"from_version {from_v} expired: {e}",
                }))
                return 1
            # the cursor records a version expire_snapshots has since
            # dropped: the deltas are unrecoverable, so re-snapshot —
            # the standard CDC recovery when the log no longer reaches
            # the consumer's position (Debezium's snapshot-on-lost-
            # binlog). mode tells the consumer to treat the export as a
            # fresh initial load, not an increment to apply on top.
            bootstrap = True
            mode = "bootstrap_expired_cursor"
        except ValueError as e:
            # NOT expiry: a range error (cursor/--from-version above
            # --to-version). Catching it as expiry would emit a bogus
            # bootstrap AND — on the cursor path — rewind the cursor
            # below its recorded position, re-delivering the range on
            # the next run (r5 review of the expiry-degradation batch).
            # Fail loudly with the one-JSON-line contract, cursor intact.
            print(json.dumps({
                "error": f"invalid version range "
                         f"v{from_v}..v{to_v}: {e}",
            }))
            return 2
    if bootstrap:
        from etl_reconciliate_spark.target.table import META_LSN

        from_v = -1  # sentinel for the range label / cursor advance
        live = table.read(include_meta=True, version=to_v).filter(
            ~F.coalesce(F.col("_deleted"), F.lit(False))
        )
        changes = live.select(
            *[c for c in live.columns if c not in ("_deleted", META_LSN)],
            F.lit("insert").alias(table.CHANGE_TYPE),
            F.col(META_LSN),
        )
    out_path = None
    if args.out and to_v > from_v:
        label = "bootstrap" if bootstrap else f"v{from_v:06d}"
        out_path = os.path.join(args.out, f"{label}-v{to_v:06d}")
        changes.write.mode("overwrite").option("compression", "zstd").parquet(
            out_path
        )
        changes = spark.read.parquet(out_path)  # count what was written

    counts = {
        r["_change_type"]: r["n"]
        for r in changes.groupBy("_change_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    # the cursor records what the consumer has RECEIVED: advance only
    # after a completed export (r4 review — a count-only run with a
    # cursor file used to skip the range, silently losing those changes
    # for the next exporting run)
    if args.cursor_file is not None and to_v > from_v and out_path is not None:
        tmp = args.cursor_file + ".tmp"
        with open(tmp, "w") as f:
            f.write(str(to_v))
        os.replace(tmp, args.cursor_file)

    print(json.dumps({
        "mode": mode,
        "from_version": from_v,
        "to_version": to_v,
        "counts": counts,
        "total": sum(counts.values()),
        "out": out_path,
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
