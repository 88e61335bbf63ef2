"""Source adapters: JDBC option surface (no driver ships offline — the
adapter must fail with a clear, actionable error, reference-parity S5)."""

import pytest

from etl_reconciliate_spark.sources.jdbc import read_jdbc_table


def test_jdbc_partitioned_requires_bounds(spark):
    with pytest.raises(ValueError, match="lower_bound and upper_bound"):
        read_jdbc_table(
            spark, "jdbc:postgresql://db/x", "t", partition_column="id"
        )


def test_jdbc_missing_driver_is_actionable(spark):
    with pytest.raises(Exception, match="driver"):
        read_jdbc_table(spark, "jdbc:nosuchdb://nowhere/x", "t")


def test_debezium_envelope_parse_and_merge(spark, tmp_path):
    """Debezium JSON envelopes (wrapped and plain, incl. heartbeat noise)
    parse to canonical changelog rows with native from_json, and the
    parsed feed drives the normal dedup -> merge pipeline."""
    import json

    from etl_reconciliate_spark.operators.dedup import dedup_max_lsn
    from etl_reconciliate_spark.schemas import CHANGELOG_SCHEMA
    from etl_reconciliate_spark.sources.debezium import (
        parse_debezium,
        read_debezium_jsonl,
    )
    from etl_reconciliate_spark.target.table import TargetTable

    def env(op, lsn, before=None, after=None, ts_ms=None, wrap=True):
        p = {"before": before, "after": after,
             "source": {"lsn": lsn, "db": "t"}, "op": op, "ts_ms": ts_ms}
        return json.dumps({"schema": {"type": "struct"}, "payload": p} if wrap else p)

    def row(conv, turn, role, text, tool, ts):
        return {"conv_id": conv, "turn_idx": turn, "role": role,
                "text": text, "tool": tool, "ts": ts}

    lines = [
        env("c", 1, after=row("c1", 0, "user", "hi", None,
                              "2026-01-01T00:00:01"), wrap=True),
        env("u", 2, before=row("c1", 0, "user", "hi", None,
                               "2026-01-01T00:00:01"),
            after=row("c1", 0, "user", "hi v2", "grep",
                      "2026-01-01T00:00:02"), wrap=False),
        env("r", 3, after=row("c2", 0, "assistant", "snap", None,
                              "2026-01-01T00:00:03"), wrap=True),
        env("d", 4, before=row("c2", 0, "assistant", "snap", None,
                               "2026-01-01T00:00:03"),
            ts_ms=1767225604000, wrap=False),
        json.dumps({"heartbeat": True}),  # dropped: no lsn/op
        # dropped: delete with null before image (REPLICA IDENTITY not
        # FULL) — carries no key, must not flow null-key junk into merge
        env("d", 5, before=None, ts_ms=1767225605000, wrap=True),
    ]
    jsonl = tmp_path / "cdc.jsonl"
    jsonl.write_text("\n".join(lines) + "\n")

    parsed = read_debezium_jsonl(spark, str(jsonl))
    assert parsed.schema == CHANGELOG_SCHEMA or [
        (f.name, f.dataType) for f in parsed.schema.fields
    ] == [(f.name, f.dataType) for f in CHANGELOG_SCHEMA.fields]
    got = {r["lsn"]: r for r in parsed.collect()}
    assert set(got) == {1, 2, 3, 4}
    assert (got[1]["op"], got[1]["text"]) == ("I", "hi")
    assert (got[2]["op"], got[2]["text"], got[2]["tool"]) == ("U", "hi v2", "grep")
    assert got[3]["op"] == "I"  # snapshot read -> insert
    d = got[4]
    assert (d["op"], d["conv_id"], d["turn_idx"]) == ("D", "c2", 0)
    assert d["role"] is None and d["text"] is None and d["tool"] is None
    assert d["ts"] is not None  # envelope ts_ms

    # the parsed feed drives the normal pipeline end to end
    tgt = TargetTable(spark, str(tmp_path / "tbl"), n_buckets=4)
    import pyspark.sql.types as T
    tgt.init(T.StructType([f for f in CHANGELOG_SCHEMA.fields
                           if f.name not in ("lsn", "op")]))
    tgt.merge_apply(dedup_max_lsn(parsed.repartition(4, "conv_id", "turn_idx")),
                    {"lsn_hi": 4})
    live = {(r["conv_id"], r["turn_idx"]): r["text"]
            for r in tgt.read().collect()}
    assert live == {("c1", 0): "hi v2"}  # c2/0 deleted, c1/0 at max LSN


def test_changelog_stray_file_rejected(spark, tmp_path):
    """A parquet file outside the epoch= dirs is invisible to the epoch
    DataFrames — its events would be silently lost (or a phantom-epoch
    KeyError thrown later). The source must refuse the layout loudly
    (r4 review)."""
    from etl_reconciliate_spark.datagen import gen_changelog, write_changelog
    from etl_reconciliate_spark.sources.changelog import ChangeLogSource

    df = gen_changelog(500, seed=3)
    p = str(tmp_path / "log")
    write_changelog(spark, df, p, epoch_lsn=250)
    # plant a stray file at the top level, beside epoch=0/ and epoch=1/
    spark.createDataFrame(
        [(99999, "I", "cX", 0, "user", "stray", None, None)],
        "lsn long, op string, conv_id string, turn_idx int, role string, "
        "text string, tool string, ts timestamp",
    ).coalesce(1).write.parquet(f"{p}_stray")
    import glob
    import shutil
    stray = glob.glob(f"{p}_stray/*.parquet")[0]
    shutil.copy(stray, f"{p}/part-stray.parquet")
    with pytest.raises(ValueError, match="layout error"):
        ChangeLogSource(spark, p)


def test_footer_index_backfills_missing_stats(tmp_path):
    """A parquet file written WITHOUT column statistics must still get
    lsn bounds (driver-side column read) — otherwise the slice reader
    silently drops every event in it (r4 review)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from etl_reconciliate_spark.plans.metrics import footer_index

    t = pa.table({"lsn": [7, 3, 11], "op": ["I", "I", "D"]})
    d = tmp_path / "log"
    d.mkdir()
    pq.write_table(t, str(d / "nostats.parquet"), write_statistics=False)
    idx = footer_index(str(d))
    assert len(idx) == 1
    assert idx[0]["lsn_lo"] == 3 and idx[0]["lsn_hi"] == 11


def test_empty_slice_plans_one_epoch_scan(spark, tmp_path):
    """A slice entirely outside the log's LSN range must return an
    empty-but-typed frame planned over ONE epoch only — the earlier
    fallback unioned every epoch, planning a scan of the whole log for
    a provably-empty result (r4 verdict item 6)."""
    from etl_reconciliate_spark.datagen import gen_changelog, write_changelog
    from etl_reconciliate_spark.sources.changelog import ChangeLogSource

    df = gen_changelog(500, seed=3)
    p = str(tmp_path / "log")
    write_changelog(spark, df, p, epoch_lsn=100)
    src = ChangeLogSource(spark, p)
    assert len(src._epochs) >= 2  # multi-epoch, or the test proves nothing
    sl = src.read_slice(10_000_000, 10_050_000)  # beyond max_lsn
    assert sl.count() == 0
    assert "lsn" in sl.columns  # typed, usable downstream
    plan = sl._jdf.queryExecution().executedPlan().toString()
    import re
    n_scans = len(re.findall(r"Scan parquet|FileScan", plan))
    assert n_scans == 1, f"expected 1 epoch scan, plan has {n_scans}"


def test_epoch_dirs_numeric_order(spark, tmp_path):
    """With 10+ epoch dirs, lexicographic sort puts epoch=10 before
    epoch=2 — initial_schema() would then return an EVOLVED epoch's
    schema and the empty-slice fallback would plan the wrong epoch
    (r5 review). Epochs must order numerically."""
    import datetime

    from etl_reconciliate_spark.schemas import CHANGELOG_SCHEMA
    from etl_reconciliate_spark.sources.changelog import ChangeLogSource

    p = str(tmp_path / "log")
    ts = datetime.datetime(2026, 1, 1)
    for i in range(12):
        spark.createDataFrame(
            [(i * 10 + j, "I", f"c{i}", j, "user", "x", None, ts)
             for j in range(10)],
            CHANGELOG_SCHEMA,
        ).coalesce(1).write.parquet(f"{p}/epoch={i}")
    src = ChangeLogSource(spark, p)
    nums = [int(e.split("=", 1)[1]) for e in src._epochs]
    assert len(nums) == 12
    assert nums == sorted(nums)
    assert src._epochs[0] == "epoch=0"
    # the empty-slice fallback must plan the NUMERICALLY earliest epoch
    sl = src.read_slice(10_000_000, 10_000_100)
    assert sl.count() == 0 and "lsn" in sl.columns


def test_epoch_dir_non_integer_suffix_tolerated(spark, tmp_path):
    """A non-integer epoch dir (epoch=__HIVE_DEFAULT_PARTITION__ from a
    NULL partition value, or a date-valued epoch) must not crash the
    source open (r5 final review: the numeric sort key raised
    ValueError at __init__). Non-numeric epochs sort AFTER the numeric
    ones, so initial_schema() still sees the earliest real epoch."""
    import datetime

    from etl_reconciliate_spark.schemas import CHANGELOG_SCHEMA
    from etl_reconciliate_spark.sources.changelog import ChangeLogSource

    p = str(tmp_path / "log")
    ts = datetime.datetime(2026, 1, 1)
    for i in range(3):
        spark.createDataFrame(
            [(i * 10 + j, "I", f"c{i}", j, "user", "x", None, ts)
             for j in range(5)],
            CHANGELOG_SCHEMA,
        ).coalesce(1).write.parquet(f"{p}/epoch={i}")
    # rows whose epoch partition value was NULL
    spark.createDataFrame(
        [(100, "I", "cz", 0, "user", "z", None, ts)], CHANGELOG_SCHEMA
    ).coalesce(1).write.parquet(f"{p}/epoch=__HIVE_DEFAULT_PARTITION__")

    src = ChangeLogSource(spark, p)
    assert src._epochs[0] == "epoch=0"
    assert src._epochs[-1] == "epoch=__HIVE_DEFAULT_PARTITION__"
    # the stray epoch's events are still visible to slice reads
    assert src.read_slice(99, 101).count() == 1
    assert src.max_lsn() == 100
