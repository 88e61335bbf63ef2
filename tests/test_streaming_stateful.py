"""Event-time stateful streaming operators (streaming/stateful.py):

* batch-mode equivalence of the windowed / session aggregations against
  an independent pandas computation (the driver additionally
  oracle-checks them against DuckDB via __spark_entry__);
* real ``readStream`` semantics: append-mode window emission on
  watermark passage, late-data drop, and the applyInPandasWithState
  sessionizer's event-time timeout emission.
"""

import datetime

import pandas as pd
import pytest

from pyspark.sql import functions as F

from etl_reconciliate_spark.schemas import CHANGELOG_SCHEMA
from etl_reconciliate_spark.streaming.stateful import (
    session_windows,
    sessionize_transcripts,
    windowed_event_counts,
)

SF_DIR = "/root/testdata/sf0.001"
T0 = datetime.datetime(2026, 1, 1, 0, 0, 0)


def _mins(m):
    return T0 + datetime.timedelta(minutes=m)


# ------------------------------------------------------------- batch mode


def test_windowed_counts_batch_matches_pandas(spark):
    events = spark.read.parquet(f"{SF_DIR}/events.parquet")
    got = (
        windowed_event_counts(events, "1 hour")
        .toPandas()
        .sort_values(["window_start", "event_type"])
        .reset_index(drop=True)
    )
    pdf = events.toPandas()
    pdf["window_start"] = pdf["ts"].dt.floor("h")
    want = (
        pdf.groupby(["window_start", "event_type"])
        .agg(n_events=("value", "size"), sum_value=("value", "sum"))
        .reset_index()
        .sort_values(["window_start", "event_type"])
        .reset_index(drop=True)
    )
    assert len(got) == len(want)
    assert (got["n_events"].to_numpy() == want["n_events"].to_numpy()).all()
    assert (
        abs(got["sum_value"].to_numpy() - want["sum_value"].to_numpy()) < 1e-6
    ).all()
    assert (
        got["window_end"] - got["window_start"]
        == pd.Timedelta(hours=1)
    ).all()


def test_session_windows_batch_matches_pandas(spark):
    events = spark.read.parquet(f"{SF_DIR}/events.parquet")
    gap = pd.Timedelta(minutes=30)
    got = (
        session_windows(events, "30 minutes")
        .toPandas()
        .sort_values(["user_id", "session_start"])
        .reset_index(drop=True)
    )
    pdf = events.toPandas().sort_values(["user_id", "ts"])
    # a gap of exactly 30 min starts a NEW session (half-open window)
    brk = (pdf.groupby("user_id")["ts"].diff() >= gap) | (
        pdf.groupby("user_id")["ts"].diff().isna()
    )
    pdf["sess"] = brk.cumsum()
    want = (
        pdf.groupby(["user_id", "sess"])
        .agg(
            session_start=("ts", "min"),
            session_end=("ts", "max"),
            n_events=("value", "size"),
            sum_value=("value", "sum"),
        )
        .reset_index()
        .sort_values(["user_id", "session_start"])
        .reset_index(drop=True)
    )
    want["session_end"] = want["session_end"] + gap
    assert len(got) == len(want)
    assert (got["user_id"].to_numpy() == want["user_id"].to_numpy()).all()
    assert (
        got["session_start"].to_numpy() == want["session_start"].to_numpy()
    ).all()
    assert (
        got["session_end"].to_numpy() == want["session_end"].to_numpy()
    ).all()
    assert (got["n_events"].to_numpy() == want["n_events"].to_numpy()).all()


# --------------------------------------------------------- streaming mode

EVENT_SCHEMA = "event_id long, ts timestamp, user_id long, event_type string, value double"


def _write_events(spark, path, rows):
    spark.createDataFrame(rows, EVENT_SCHEMA).coalesce(1).write.parquet(path)


def _drain(stream_df, name):
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q


def _set_mtime(path, t):
    import os

    for root, _dirs, files in os.walk(path):
        for f in files:
            os.utime(os.path.join(root, f), (t, t))
    os.utime(path, (t, t))


def test_stream_window_emission_and_late_drop(spark, tmp_path):
    """Append-mode windows emit exactly once, when the watermark passes
    their end; a record arriving behind the watermark is dropped, not
    merged or re-emitted. (Micro-batch nuance: Spark's late-record
    filter uses the watermark one batch OLDER than the eviction
    watermark, so the late row must arrive ≥2 batches after the rows
    that advanced the watermark — hence three single-file batches.)"""
    import time

    d = str(tmp_path / "ev")
    # batch 0: two rows in [00:00, 01:00) + a row at 03:00 that drives
    # the watermark to 02:30 at the END of the batch
    _write_events(
        spark, f"{d}/f1",
        [(1, _mins(5), 1, "click", 1.0), (2, _mins(20), 1, "click", 2.0),
         (3, _mins(180), 1, "view", 5.0)],
    )
    # batch 1: eviction watermark is now 02:30 → the [00:00, 01:00)
    # window is finalized and EMITTED at this batch's end
    _write_events(spark, f"{d}/f2", [(4, _mins(240), 1, "view", 7.0)])
    # batch 2: a LATE row for the already-emitted window (00:30 is
    # behind the late-event watermark 02:30) → dropped by the state
    # store, never re-emitted
    _write_events(spark, f"{d}/f3", [(5, _mins(30), 1, "click", 100.0)])
    t = time.time()
    _set_mtime(f"{d}/f1", t - 200)
    _set_mtime(f"{d}/f2", t - 100)  # discovery order f1 → f2 → f3
    stream = (
        spark.readStream.schema(EVENT_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .option("recursiveFileLookup", "true")
        .parquet(d)
    )
    agg = windowed_event_counts(stream, "1 hour", watermark_delay="30 minutes")
    q = _drain(agg, "win_emit")
    got = spark.sql("select * from win_emit").collect()
    assert len(got) == 1  # the late row neither merged nor re-emitted
    row = got[0]
    assert row.window_start == T0 and row.window_end == _mins(60)
    assert row.event_type == "click"
    assert row.n_events == 2 and abs(row.sum_value - 3.0) < 1e-9
    dropped = sum(
        so.get("numRowsDroppedByWatermark", 0)
        for p in q.recentProgress
        for so in (p.get("stateOperators") or [])
        if isinstance(p, dict)
    )
    assert dropped == 1  # the 00:30 row, filtered by the watermark


def test_stream_sessionize_timeout_emission(spark, tmp_path):
    """applyInPandasWithState: conversation A's session (last event +
    30 min gap) times out when conversation B's much-later events push
    the watermark past it; exactly one summary row is emitted, with the
    custom longest-tool-run metric."""
    d = str(tmp_path / "log")
    rows_a = [
        (10, "I", "A", 0, "user", "hi", None, _mins(0)),
        (11, "I", "A", 1, "tool", "x", "search", _mins(1)),
        (12, "I", "A", 2, "tool", "y", "search", _mins(2)),
        (13, "U", "A", 1, "tool", "x2", "search", _mins(3)),
        (14, "I", "A", 3, "assistant", "done", None, _mins(4)),
    ]
    spark.createDataFrame(rows_a, CHANGELOG_SCHEMA).coalesce(1).write.parquet(
        f"{d}/f1"
    )
    # B's events sit 6 h later: end of batch 1 watermark = 06:04 − 30 min
    # = 05:34, far past A's timeout (00:04 + 30 min) → batch 2 emits A.
    rows_b = [(20, "I", "B", 0, "user", "later", None, _mins(364))]
    spark.createDataFrame(rows_b, CHANGELOG_SCHEMA).coalesce(1).write.parquet(
        f"{d}/f2"
    )
    import os, time
    t = time.time()
    os.utime(f"{d}/f1", (t - 100, t - 100))
    stream = (
        spark.readStream.schema(CHANGELOG_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .option("recursiveFileLookup", "true")
        .parquet(d)
    )
    out = sessionize_transcripts(stream, gap_seconds=1800,
                                 watermark_delay="30 minutes")
    _drain(out, "sess_emit")
    got = spark.sql("select * from sess_emit").collect()
    assert [r.conv_id for r in got] == ["A"]  # B's session is still open
    a = got[0]
    assert a.n_events == 5
    assert a.n_turns == 4  # turn 1 seen twice (I then U)
    assert a.max_lsn == 14
    assert a.first_ts == _mins(0) and a.last_ts == _mins(4)
    assert a.max_tool_run == 3  # lsn 11,12,13 in LSN order


def test_stream_sessionize_state_spans_batches(spark, tmp_path):
    """A conversation whose events arrive across micro-batches keeps ONE
    state (counts accumulate) and emits a single merged summary."""
    d = str(tmp_path / "log")
    spark.createDataFrame(
        [(1, "I", "A", 0, "user", "a", None, _mins(0))], CHANGELOG_SCHEMA
    ).coalesce(1).write.parquet(f"{d}/f1")
    spark.createDataFrame(
        [(2, "I", "A", 1, "tool", "b", "grep", _mins(5))], CHANGELOG_SCHEMA
    ).coalesce(1).write.parquet(f"{d}/f2")
    spark.createDataFrame(
        [(3, "I", "B", 0, "user", "c", None, _mins(600))], CHANGELOG_SCHEMA
    ).coalesce(1).write.parquet(f"{d}/f3")
    import os, time
    t = time.time()
    os.utime(f"{d}/f1", (t - 200, t - 200))
    os.utime(f"{d}/f2", (t - 100, t - 100))
    stream = (
        spark.readStream.schema(CHANGELOG_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .option("recursiveFileLookup", "true")
        .parquet(d)
    )
    out = sessionize_transcripts(stream, gap_seconds=1800,
                                 watermark_delay="30 minutes")
    _drain(out, "sess_span")
    got = spark.sql("select * from sess_span").collect()
    assert [r.conv_id for r in got] == ["A"]
    assert got[0].n_events == 2 and got[0].n_turns == 2
    assert got[0].last_ts == _mins(5)


def test_stream_sessionize_batch_equivalence_at_scale(spark, tmp_path):
    """Batch-equivalence at scale (r2 verdict item 8): 60 conversations
    x 15 events delivered across 3 LSN-ordered micro-batches + a
    watermark-pushing sentinel — every emitted session summary must
    equal an independent plain-Python fold of the same events."""
    import os
    import time

    d = str(tmp_path / "log")
    convs = [f"c{c:02d}" for c in range(60)]
    all_rows, lsn = [], 0

    def role_of(c, j):
        if (j % 5) < (c % 4):
            return "tool"
        return "user" if j % 2 == 0 else "assistant"

    for j in range(15):  # round-robin: lsn order == per-conv j order
        for c, conv in enumerate(convs):
            r = role_of(c, j)
            all_rows.append(
                (lsn, "I", conv, j // 2, r, f"t{j}",
                 "x" if r == "tool" else None, _mins(j))
            )
            lsn += 1

    chunks = [
        [r for r in all_rows if r[7] < _mins(5)],
        [r for r in all_rows if _mins(5) <= r[7] < _mins(10)],
        [r for r in all_rows if r[7] >= _mins(10)],
        [(9999, "I", "ZZZ", 0, "user", "flush", None, _mins(24 * 60))],
    ]
    t = time.time()
    for i, chunk in enumerate(chunks):
        f = f"{d}/f{i}"
        spark.createDataFrame(chunk, CHANGELOG_SCHEMA).coalesce(1).write.parquet(f)
        os.utime(f, (t - 400 + i * 100, t - 400 + i * 100))

    stream = (
        spark.readStream.schema(CHANGELOG_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .option("recursiveFileLookup", "true")
        .parquet(d)
    )
    out = sessionize_transcripts(stream, gap_seconds=1800,
                                 watermark_delay="30 minutes")
    _drain(out, "sess_scale")
    got = {
        r.conv_id: r for r in spark.sql("select * from sess_scale").collect()
    }
    assert sorted(got) == convs  # sentinel ZZZ still open, all others closed

    # independent oracle: plain-Python fold in LSN order
    for c, conv in enumerate(convs):
        ev = sorted((r for r in all_rows if r[2] == conv), key=lambda r: r[0])
        run = best = 0
        for r in ev:
            run = run + 1 if r[4] == "tool" else 0
            best = max(best, run)
        s = got[conv]
        assert s.n_events == len(ev)
        assert s.n_turns == len({r[3] for r in ev})
        assert s.max_lsn == max(r[0] for r in ev)
        assert s.first_ts == ev[0][7] and s.last_ts == ev[-1][7]
        assert s.max_tool_run == best, conv


def test_stream_sessionize_multichunk_and_duplicates(spark, tmp_path):
    """Arrow splits a big conversation into several chunks per batch;
    the tool-run state machine must sort the CONCATENATED batch (chunk-
    local sorts would split or wrongly join runs across boundaries) and
    drop duplicate-LSN redeliveries (which would double-count, r4
    review). maxRecordsPerBatch=3 forces multiple chunks."""
    prev = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch")
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "3")
    try:
        d = str(tmp_path / "log")
        # written in an order that interleaves a 4-long tool run across
        # chunk boundaries; lsn 12 is delivered TWICE
        rows = [
            (15, "I", "A", 5, "assistant", "end", None, _mins(5)),
            (11, "I", "A", 1, "tool", "a", "t", _mins(1)),
            (13, "I", "A", 3, "tool", "c", "t", _mins(3)),
            (10, "I", "A", 0, "user", "q", None, _mins(0)),
            (12, "I", "A", 2, "tool", "b", "t", _mins(2)),
            (12, "I", "A", 2, "tool", "b", "t", _mins(2)),  # duplicate
            (14, "I", "A", 4, "tool", "d", "t", _mins(4)),
        ]
        spark.createDataFrame(rows, CHANGELOG_SCHEMA).coalesce(1).write.parquet(
            f"{d}/f1"
        )
        spark.createDataFrame(
            [(99, "I", "B", 0, "user", "later", None, _mins(900))],
            CHANGELOG_SCHEMA,
        ).coalesce(1).write.parquet(f"{d}/f2")
        import os, time
        t = time.time()
        os.utime(f"{d}/f1", (t - 100, t - 100))
        stream = (
            spark.readStream.schema(CHANGELOG_SCHEMA)
            .option("maxFilesPerTrigger", 1)
            .option("recursiveFileLookup", "true")
            .parquet(d)
        )
        out = sessionize_transcripts(stream, gap_seconds=1800,
                                     watermark_delay="30 minutes")
        _drain(out, "sess_chunks")
        got = {r.conv_id: r for r in spark.sql(
            "select * from sess_chunks").collect()}
        a = got["A"]
        assert a.n_events == 6  # duplicate lsn 12 counted once
        assert a.max_tool_run == 4  # lsn 11,12,13,14 across chunks
        assert a.max_lsn == 15
    finally:
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", prev)


def test_stream_sessionize_cross_batch_duplicate_dropped(spark, tmp_path):
    """An at-least-once redelivery landing in a LATER micro-batch must
    not re-count: the state's max_lsn gates every batch (r5 review —
    the per-batch duplicated() check alone missed this, inflating
    n_events and potentially max_tool_run)."""
    d = str(tmp_path / "log")
    spark.createDataFrame(
        [
            (10, "I", "A", 0, "user", "q", None, _mins(0)),
            (11, "I", "A", 1, "tool", "a", "t", _mins(1)),
            (12, "I", "A", 2, "tool", "b", "t", _mins(2)),
        ],
        CHANGELOG_SCHEMA,
    ).coalesce(1).write.parquet(f"{d}/f1")
    # batch 2 REDELIVERS lsn 12 (tool) — without the max_lsn gate the
    # run counter would extend the tool run to 3 and n_events to 4
    spark.createDataFrame(
        [(12, "I", "A", 2, "tool", "b", "t", _mins(2))], CHANGELOG_SCHEMA
    ).coalesce(1).write.parquet(f"{d}/f2")
    spark.createDataFrame(
        [(99, "I", "B", 0, "user", "later", None, _mins(900))],
        CHANGELOG_SCHEMA,
    ).coalesce(1).write.parquet(f"{d}/f3")
    import os, time
    t = time.time()
    os.utime(f"{d}/f1", (t - 300, t - 300))
    os.utime(f"{d}/f2", (t - 200, t - 200))
    os.utime(f"{d}/f3", (t - 100, t - 100))
    stream = (
        spark.readStream.schema(CHANGELOG_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .option("recursiveFileLookup", "true")
        .parquet(d)
    )
    out = sessionize_transcripts(stream, gap_seconds=1800,
                                 watermark_delay="30 minutes")
    _drain(out, "sess_xbatch")
    got = {r.conv_id: r for r in spark.sql(
        "select * from sess_xbatch").collect()}
    a = got["A"]
    assert a.n_events == 3          # redelivered lsn 12 counted once
    assert a.max_tool_run == 2      # run is 11,12 — not extended by the dup
    assert a.max_lsn == 12
