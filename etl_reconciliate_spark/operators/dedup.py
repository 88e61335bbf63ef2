"""Max-LSN deduplication of change events per key.

The north rule requires change events "deduplicated per key via max-LSN
window ranking" before the merge-apply stage. Within a slice several
events may touch the same (conv_id, turn_idx) — multiple updates, a
delete then re-insert, plus duplicate deliveries of the SAME lsn
(at-least-once transport). The winner is the event with the highest LSN;
equal-LSN duplicates are identical payloads, broken deterministically on
op so the result is stable.

Implementation is a plain window ranking — Catalyst plans it as a single
hash-partitioned sort, and because the window keys equal the merge-join
keys, a preceding ``repartition(n, *keys)`` is reused by BOTH the window
and the merge join (one shuffle total for dedup + merge probe side).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from etl_reconciliate_spark.schemas import KEY_COLS


def dedup_max_lsn(df: DataFrame, key_cols: list[str] | None = None) -> DataFrame:
    """One row per key: the max-LSN event (ties broken on op desc, so a
    duplicated delivery pair (same lsn, same op) collapses stably)."""
    keys = key_cols or KEY_COLS
    w = Window.partitionBy(*keys).orderBy(F.col("lsn").desc(), F.col("op").desc())
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def dedup_max_lsn_agg(df: DataFrame, key_cols: list[str] | None = None) -> DataFrame:
    """Same result as :func:`dedup_max_lsn`, as a hash AGGREGATE instead
    of a sort-based window: ``max_by(payload, (lsn, op))`` per key.

    Why it wins at scale: HashAggregate does a map-side partial combine,
    so duplicate deliveries and multi-update keys collapse BEFORE the
    shuffle (the window must shuffle every raw event, then sort each
    partition). The agg's own exchange hash-partitions by exactly the
    merge keys, so no separate ``repartition`` is needed upstream.
    Tie-break matches the window: lexicographic (lsn, op) descending —
    equal-LSN duplicates are identical payloads, op breaks I/U/D ties
    deterministically."""
    keys = key_cols or KEY_COLS
    payload = [c for c in df.columns if c not in keys]
    ordk = F.struct(F.col("lsn"), F.col("op"))
    agg = df.groupBy(*keys).agg(
        F.max_by(F.struct(*[F.col(c) for c in payload]), ordk).alias("_win")
    )
    return agg.select(
        *[F.col(k) for k in keys], *[F.col(f"_win.{c}").alias(c) for c in payload]
    )
