"""spark-submit entrypoint: target-table maintenance.

MoR tables trade write amplification for read-side winner resolution;
this job is the scheduled maintenance that keeps that trade healthy
(the moral equivalent of Iceberg's rewrite_data_files +
expire_snapshots procedures):

* ``--compact``: fold all pending deltas into a new base snapshot.
  Tombstone handling follows the table's RECORDED ordering guarantee:
  dropped on LSN-ordered tables (safe, see target/table.py), retained
  automatically on tables fed by the out-of-order Structured Streaming
  runner — no flag needed. ``--retain-tombstones`` forces retention
  everywhere; ``--force-drop-tombstones`` overrides the guard on
  unordered tables (resurrection risk — only after verifying no lower
  LSN can still arrive). A compaction losing the optimistic-concurrency
  race against an in-flight merge retries from fresh metadata
  (``--retries``);
* ``--expire-keep N``: reference-counted snapshot expiry, keeping the
  newest N versions; unreferenced dirs younger than the orphan grace
  period are left alone (they may be a concurrent writer's staged,
  not-yet-committed data);
* always prints one JSON line with before/after version, live rows,
  pending delta count.

    spark-submit --py-files engine.zip jobs/maintain_job.py \
        --target /path/tbl --compact --expire-keep 2
"""

from __future__ import annotations

import argparse
import json
import sys


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--target", required=True)
    ap.add_argument("--compact", action="store_true")
    ap.add_argument("--retain-tombstones", action="store_true",
                    help="keep delete tombstones through compaction "
                         "(the default already retains them on tables "
                         "whose recorded commits are not LSN-ordered; "
                         "this forces retention everywhere)")
    ap.add_argument("--force-drop-tombstones", action="store_true",
                    help="vacuum tombstones EVEN on a table recorded as "
                         "out-of-order (ordered_commits=False) — only "
                         "safe once the out-of-order source is "
                         "decommissioned; also forces a base rewrite on "
                         "a MoR table with zero pending deltas")
    ap.add_argument("--retries", type=int, default=3,
                    help="compaction retries on commit conflict with a "
                         "concurrent writer")
    ap.add_argument("--expire-keep", type=int, default=0,
                    help="keep newest N snapshots (0 = no expiry)")
    ap.add_argument("--buckets", type=int, default=None)
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    spark = SparkSession.builder.appName("cdc_maintain").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    from etl_reconciliate_spark.target.table import (
        CommitConflictError,
        TargetTable,
    )

    table = TargetTable(
        spark, args.target,
        n_buckets=args.buckets or int(
            spark.conf.get("spark.sql.shuffle.partitions", "32")
        ),
    )
    if not table.exists():
        print(json.dumps({"error": f"no table at {args.target}"}))
        return 1

    before = table.metadata()
    out = {
        "version_before": before["version"],
        "deltas_before": len(before.get("deltas", [])),
    }
    if args.compact:
        stats = None
        for attempt in range(args.retries + 1):
            try:
                # None = inherit the table's RECORDED ordering guarantee
                # (r5 review: the old explicit bool silently overrode
                # ordered_commits=False and could resurrect deletes)
                drop = None
                if args.retain_tombstones:
                    drop = False
                elif args.force_drop_tombstones:
                    drop = True
                stats = table.compact(
                    drop_tombstones=drop,
                    allow_unordered_drop=args.force_drop_tombstones,
                )
                break
            except CommitConflictError:
                if attempt == args.retries:
                    print(json.dumps({**out, "error": "commit conflict "
                                      f"after {args.retries} retries"}))
                    return 1
                # a merge committed under us — recompute from fresh state
        out["compacted_to_version"] = stats["version"]
        out["row_count"] = stats["row_count"]
    if args.expire_keep > 0:
        table.expire_snapshots(keep_last=args.expire_keep)
        out["versions_kept"] = table.versions()
    after = table.metadata()
    out["version_after"] = after["version"]
    out["deltas_after"] = len(after.get("deltas", []))
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
