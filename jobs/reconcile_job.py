"""spark-submit entrypoint: reconciliation pass (source vs CDC target).

The second half of the pipeline (BASELINE.json north star): after
``jobs/replay_job.py`` has applied the change log, this job runs the
bounded full-outer reconciliation on (conv_id, turn_idx) — salted for
hot conversations, Arrow-UDF text comparison — and prints one JSON line
with the MATCH / SOURCE_ONLY / TARGET_ONLY / VALUE_DISCREPANCY counts
(the parity metric) plus the per-conversation rollup counts.

The source of truth is either a transcripts table (``--source-kind
table``) or the change log itself (``--source-kind changelog``: the
expected state is its max-LSN fold, computed distributed) —
replaying-then-reconciling against the same log is the engine's
self-check that MERGE applied exactly once.

    spark-submit --master local[32] --py-files engine.zip \
        jobs/reconcile_job.py --source /path/log --source-kind changelog \
        --target /path/tbl
"""

from __future__ import annotations

import argparse
import json
import sys


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--source", required=True)
    ap.add_argument("--source-kind", choices=["table", "changelog"],
                    default="changelog")
    ap.add_argument("--target", required=True)
    ap.add_argument("--salts", type=int, default=8)
    ap.add_argument("--hot-threshold", type=int, default=100_000)
    args = ap.parse_args()

    from pyspark.sql import SparkSession, functions as F

    spark = SparkSession.builder.appName("cdc_reconcile").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    from etl_reconciliate_spark.operators.dedup import dedup_max_lsn
    from etl_reconciliate_spark.operators.reconcile import (
        reconcile,
        rollup_conversations,
        status_counts,
    )
    from etl_reconciliate_spark.sources.changelog import ChangeLogSource
    from etl_reconciliate_spark.target.table import TargetTable

    if args.source_kind == "changelog":
        src_log = ChangeLogSource(spark, args.source)
        full = src_log.read_slice(-1, src_log.max_lsn())
        source = dedup_max_lsn(full).filter(F.col("op") != "D").drop("lsn", "op")
    else:
        source = spark.read.parquet(args.source)

    target = TargetTable(spark, args.target).read()

    recon = reconcile(
        source, target, n_salts=args.salts, hot_threshold=args.hot_threshold
    )
    counts = {r["status"]: r["n"] for r in status_counts(recon).collect()}
    rollup = (
        rollup_conversations(recon)
        .groupBy("conv_status")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    print(json.dumps({
        "status_counts": counts,
        "conversation_counts": {r["conv_status"]: r["n"] for r in rollup},
        "total": sum(counts.values()),
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
