"""Event-time stateful streaming operators.

Three operators, all usable on BOTH batch and streaming DataFrames (the
transformation is identical; watermarks are no-ops in batch mode, which
is what lets the driver oracle-check the logic against DuckDB while the
streaming tests exercise late-data semantics on a real ``readStream``):

* :func:`windowed_event_counts` — tumbling event-time window aggregate
  with a watermark for late data. In streaming append mode a window is
  emitted exactly once, when the watermark passes its end; events later
  than the watermark delay are dropped (tested in
  tests/test_streaming_stateful.py).
* :func:`session_windows` — native ``F.session_window`` gap-based
  sessionization (the declarative scale path: state is managed by
  Spark's streaming state store, partitioned by the grouping key).
* :func:`sessionize_transcripts` — ``applyInPandasWithState`` custom
  per-conversation state machine over the transcript change stream:
  incrementally tracks per-session turn/op counts plus a metric native
  window functions cannot maintain incrementally (the longest
  consecutive run of tool-role turns), and emits one summary row per
  conversation when its event-time timeout (watermark ≥ last event +
  gap) fires. Arrow-batched; state is a fixed-width tuple per key.

Scale notes: all three shuffle once on their grouping key; state-store
size is O(open windows/sessions), not O(events). The watermark bounds
state: windows/sessions older than the watermark are finalized and
evicted. At 10^10 events/day the knobs that matter are the watermark
delay (state retention) and ``spark.sql.shuffle.partitions`` for the
state-store partition count.

reference: the reference app has no streaming surface (cron re-polls,
SchedulerConfig.java:6-8); these operators are the Structured-Streaming
re-expression of its periodic-refresh semantics plus the windowed
monitoring queries its batch listeners log (JobCompletionListener.java).
"""

from __future__ import annotations

from typing import Any, Iterator, Tuple

import pandas as pd

from pyspark.sql import DataFrame, functions as F, types as T


def windowed_event_counts(
    events: DataFrame,
    window_duration: str = "1 hour",
    watermark_delay: str | None = None,
    ts_col: str = "ts",
    key_col: str = "event_type",
    value_col: str = "value",
) -> DataFrame:
    """Tumbling-window counts + sums per ``key_col``.

    Returns (window_start, window_end, <key_col>, n_events, sum_value).
    With ``watermark_delay`` set on a streaming input, append-mode
    output emits each window once, after the watermark passes its end;
    rows arriving later than the delay are dropped by the state store.
    """
    df = events
    if watermark_delay is not None:
        df = df.withWatermark(ts_col, watermark_delay)
    return (
        df.groupBy(F.window(F.col(ts_col), window_duration), F.col(key_col))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(value_col).alias("sum_value"),
        )
        .select(
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end"),
            key_col,
            "n_events",
            "sum_value",
        )
    )


def session_windows(
    events: DataFrame,
    gap: str = "30 minutes",
    watermark_delay: str | None = None,
    ts_col: str = "ts",
    key_col: str = "user_id",
    value_col: str = "value",
) -> DataFrame:
    """Gap-based session windows per ``key_col`` via native
    ``F.session_window`` (merge rule: an event extends the session iff
    its timestamp is strictly before the current session end = last
    event + gap; the window is half-open, so a gap of exactly ``gap``
    starts a NEW session).

    Returns (key, session_start, session_end, n_events, sum_value)
    where session_end = last event ts + gap.
    """
    df = events
    if watermark_delay is not None:
        df = df.withWatermark(ts_col, watermark_delay)
    return (
        df.groupBy(F.session_window(F.col(ts_col), gap), F.col(key_col))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(value_col).alias("sum_value"),
        )
        .select(
            key_col,
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            "n_events",
            "sum_value",
        )
    )


# ------------------------------------------------- custom stateful UDF

SESSION_SUMMARY_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType(), False),
        T.StructField("n_events", T.LongType(), False),
        T.StructField("n_turns", T.LongType(), False),
        T.StructField("max_lsn", T.LongType(), False),
        T.StructField("first_ts", T.TimestampType(), True),
        T.StructField("last_ts", T.TimestampType(), True),
        T.StructField("max_tool_run", T.LongType(), False),
    ]
)

# state: (n_events, max_lsn, first_ts_ms, last_ts_ms, cur_tool_run,
#         max_tool_run, turn_set_csv) — fixed-width scalars; the turn
# set is kept as a bounded CSV of distinct turn_idx (transcript turns
# per conversation are small by construction).
_STATE_SCHEMA = T.StructType(
    [
        T.StructField("n_events", T.LongType()),
        T.StructField("max_lsn", T.LongType()),
        T.StructField("first_ts_ms", T.LongType()),
        T.StructField("last_ts_ms", T.LongType()),
        T.StructField("cur_tool_run", T.LongType()),
        T.StructField("max_tool_run", T.LongType()),
        T.StructField("turns_csv", T.StringType()),
    ]
)


def sessionize_transcripts(
    changes: DataFrame,
    gap_seconds: int = 1800,
    watermark_delay: str = "30 minutes",
    ts_col: str = "ts",
) -> DataFrame:
    """Per-conversation session summaries from the change stream, via
    ``applyInPandasWithState`` (event-time timeout).

    A conversation's session closes when the stream's watermark passes
    ``last event ts + gap_seconds``; at that point ONE summary row is
    emitted and the state evicted. The custom metric ``max_tool_run``
    (longest consecutive run of role='tool' events, in LSN order within
    each delivered batch) is a sequential state machine — exactly the
    kind of per-key incremental logic ``applyInPandasWithState`` exists
    for and declarative ops can't maintain across micro-batches.

    Only usable on a streaming DataFrame (batch DataFrames have no
    state store); for the batch-equivalent summary see the plain
    aggregation in tests/test_streaming_stateful.py.
    """
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    gap_ms = gap_seconds * 1000

    def fn(
        key: Tuple[str],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            (n_events, max_lsn, first_ms, last_ms, _cur, max_run, turns) = (
                state.get
            )
            state.remove()
            yield pd.DataFrame(
                {
                    "conv_id": [key[0]],
                    "n_events": [n_events],
                    "n_turns": [len(turns.split(",")) if turns else 0],
                    "max_lsn": [max_lsn],
                    "first_ts": [pd.Timestamp(first_ms, unit="ms")],
                    "last_ts": [pd.Timestamp(last_ms, unit="ms")],
                    "max_tool_run": [max_run],
                }
            )
            return

        if state.exists:
            n_events, max_lsn, first_ms, last_ms, cur_run, max_run, turns = (
                state.get
            )
            seen = set(turns.split(",")) if turns else set()
        else:
            n_events, max_lsn, cur_run, max_run = 0, -1, 0, 0
            first_ms, last_ms = None, None
            seen = set()

        chunks = [pdf for pdf in pdfs if len(pdf)]
        if chunks:
            # ONE concatenated sort: a conversation larger than the
            # Arrow batch size arrives as several chunks, and sorting
            # each independently would run the tool-run state machine
            # out of LSN order across chunk boundaries (r4 review).
            # Duplicate deliveries (at-least-once redelivery) are
            # dropped here too — they would double-count n_events and
            # inflate a tool run: same-lsn duplicates WITHIN the batch
            # via duplicated(), and CROSS-batch duplicates via the
            # state's max_lsn (r5 review: a redelivery landing in a
            # later micro-batch sailed past the per-batch check). The
            # lsn <= max_lsn drop also discards a genuinely-new but
            # out-of-LSN-order late event — the same newer-LSN-wins
            # contract the merge path applies; the sequential tool-run
            # machine needs LSN-ordered progress to mean anything.
            batch = pd.concat(chunks, ignore_index=True)
            batch = batch.sort_values("lsn", kind="stable")
            batch = batch[~batch["lsn"].duplicated(keep="first")]
            batch = batch[batch["lsn"] > max_lsn]
        else:
            batch = None
        if batch is not None:
            for lsn, role, turn_idx, ts in zip(
                batch["lsn"], batch["role"], batch["turn_idx"], batch[ts_col]
            ):
                n_events += 1
                max_lsn = max(max_lsn, int(lsn))
                ms = int(pd.Timestamp(ts).value // 1_000_000)
                first_ms = ms if first_ms is None else min(first_ms, ms)
                last_ms = ms if last_ms is None else max(last_ms, ms)
                seen.add(str(int(turn_idx)))
                if role == "tool":
                    cur_run += 1
                    max_run = max(max_run, cur_run)
                else:
                    cur_run = 0

        state.update(
            (
                n_events,
                max_lsn,
                first_ms,
                last_ms,
                cur_run,
                max_run,
                ",".join(sorted(seen)),
            )
        )
        # close the session when the watermark passes last event + gap;
        # Spark requires the timeout to sit strictly beyond the current
        # watermark, so clamp for sessions already older than it.
        wm = state.getCurrentWatermarkMs()
        state.setTimeoutTimestamp(max(last_ms + gap_ms, wm + 1))
        yield from ()

    return (
        changes.withWatermark(ts_col, watermark_delay)
        .groupBy("conv_id")
        .applyInPandasWithState(
            fn,
            outputStructType=SESSION_SUMMARY_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )
