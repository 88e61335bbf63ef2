"""Column profiling + drift: hand-checked stats, one-pass plan shape,
schema-drift surfacing."""

import datetime

import pytest
from pyspark.sql import functions as F

from etl_reconciliate_spark.operators.profile import column_profile, profile_drift
from etl_reconciliate_spark.schemas import TRANSCRIPTS_SCHEMA

TS = datetime.datetime(2026, 1, 1)


@pytest.fixture(scope="module")
def frame(spark):
    rows = [
        ("a", 0, "user", "x", None, TS),
        ("a", 1, "user", "y", None, TS),
        ("b", 0, None, "x", "t1", None),
    ]
    return spark.createDataFrame(rows, schema=TRANSCRIPTS_SCHEMA)


def test_profile_values(frame):
    p = {r.column: r for r in column_profile(frame).collect()}
    assert set(p) == {"conv_id", "turn_idx", "role", "text", "tool", "ts"}
    assert all(r.n_rows == 3 for r in p.values())
    assert p["conv_id"].n_null == 0 and p["conv_id"].n_distinct == 2
    assert p["role"].n_null == 1 and p["role"].n_distinct == 1
    assert p["text"].n_distinct == 2
    assert p["tool"].n_null == 2 and p["tool"].n_distinct == 1
    assert p["turn_idx"].min_str == "0" and p["turn_idx"].max_str == "1"


def test_profile_single_pass(frame):
    """All columns must profile in ONE aggregation over ONE scan (the
    Expand-based multi-distinct plan), not a scan per column."""
    plan = (
        column_profile(frame)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # the fixture is createDataFrame → exactly one "Scan ExistingRDD";
    # counting BOTH scan kinds (and requiring the total == 1) keeps the
    # assertion non-vacuous if the fixture ever becomes file-backed
    # (the r3 `A <= 1 or B <= 1` form was always true — r3 advice)
    n_scans = plan.count("Scan ExistingRDD") + plan.count("FileScan")
    assert n_scans == 1, plan


def test_drift_detection(spark, frame):
    drifted_tgt = frame.withColumn(
        "text", F.when(F.col("turn_idx") == 1, F.lit("CHANGED")).otherwise(F.col("text"))
    )
    d = {r.column: r for r in profile_drift(frame, drifted_tgt).collect()}
    assert d["text"].drifted is True
    assert d["conv_id"].drifted is False
    assert d["turn_idx"].drifted is False


def test_drift_schema_mismatch(spark, frame):
    tgt = frame.drop("tool")
    d = {r.column: r for r in profile_drift(frame, tgt).collect()}
    assert d["tool"].drifted is True and d["tool"].tgt_n_rows is None


def test_profile_job_cli(spark, frame, tmp_path, capsys, monkeypatch):
    """The profiling job surface: single-table profile, then
    time-travel drift between two snapshots of a versioned target."""
    import json
    import sys

    from pyspark.sql import types as T

    from etl_reconciliate_spark.target.table import TargetTable

    sys.path.insert(0, "/root/repo/jobs")
    try:
        import profile_job
    finally:
        sys.path.pop(0)

    pq = str(tmp_path / "pq")
    frame.write.parquet(pq)
    monkeypatch.setattr(sys, "argv", ["profile_job.py", "--parquet", pq])
    assert profile_job.main() == 0
    prof = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert prof["mode"] == "profile"
    by_col = {c["column"]: c for c in prof["columns"]}
    assert by_col["conv_id"]["n_distinct"] == 2
    assert by_col["tool"]["n_null"] == 2

    tbl = TargetTable(spark, str(tmp_path / "t"), n_buckets=2)
    tbl.init(T.StructType([
        T.StructField("conv_id", T.StringType()),
        T.StructField("turn_idx", T.IntegerType()),
        T.StructField("text", T.StringType()),
    ]))
    batch = "lsn BIGINT, op STRING, conv_id STRING, turn_idx INT, text STRING"
    tbl.merge_apply(
        spark.createDataFrame([(1, "I", "c1", 0, "a"), (2, "I", "c2", 0, "b")], batch),
        {"lsn_hi": 2},
    )
    v1 = tbl.current_version()
    tbl.merge_apply(
        spark.createDataFrame([(3, "U", "c1", 0, "CHANGED")], batch),
        {"lsn_hi": 3},
    )
    monkeypatch.setattr(sys, "argv", [
        "profile_job.py", "--target", tbl.path,
        "--baseline-version", str(v1),
    ])
    assert profile_job.main() == 0
    drift = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert drift["mode"] == "drift"
    assert drift["drifted_columns"] == ["text"]
    assert drift["n_drifted"] == 1


def test_profile_non_identifier_column_names(spark):
    """Legal-but-awkward column names (spaces, quotes) must profile —
    the generated stack() uses positional aliases and escaped literals
    (r4 review)."""
    df = spark.createDataFrame(
        [(1, "x"), (2, None)], ["a b", "o'brien"]
    )
    p = {r.column: r for r in column_profile(df).collect()}
    assert set(p) == {"a b", "o'brien"}
    assert p["o'brien"].n_null == 1 and p["a b"].n_distinct == 2


def test_profile_percentiles_exact_and_approx(spark):
    """Numeric columns get p50/p99 (exact: continuous interpolation);
    string columns get typed nulls; approx mode returns a real value
    from the data domain (sketch-based, not interpolated)."""
    import pytest
    from pyspark.sql import functions as F

    from etl_reconciliate_spark.operators.profile import column_profile

    df = spark.range(0, 101).select(
        F.col("id").alias("v"), F.lit("x").alias("s")
    )
    prof = {r["column"]: r for r in column_profile(df).collect()}
    # 101 values 0..100: p50 rank 50 -> 50.0, p99 rank 99 -> 99.0
    assert prof["v"]["p_lo"] == 50.0 and prof["v"]["p_hi"] == 99.0
    assert prof["s"]["p_lo"] is None and prof["s"]["p_hi"] is None

    approx = {
        r["column"]: r
        for r in column_profile(df, percentile_mode="approx").collect()
    }
    assert abs(approx["v"]["p_lo"] - 50.0) <= 1.0
    with pytest.raises(ValueError, match="percentile_mode"):
        column_profile(df, percentile_mode="bogus")


def test_profile_job_missing_table_and_expired_baseline(spark, tmp_path,
                                                        capsys, monkeypatch):
    """A not-yet-replayed target and an expired time-travel baseline
    must both keep the one-JSON-line contract with main() returning 1
    — the same degradation shape as every sibling job (r5 review: the
    first guard raised SystemExit out of the loader instead)."""
    import json
    import sys

    from pyspark.sql import types as T

    from etl_reconciliate_spark.target.table import TargetTable

    sys.path.insert(0, "/root/repo/jobs")
    try:
        import profile_job
    finally:
        sys.path.pop(0)

    monkeypatch.setattr(sys, "argv", [
        "profile_job.py", "--target", str(tmp_path / "nope"),
    ])
    assert profile_job.main() == 1
    err = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert "no table" in err["error"]

    tbl = TargetTable(spark, str(tmp_path / "t2"), n_buckets=2)
    tbl.init(T.StructType([
        T.StructField("conv_id", T.StringType()),
        T.StructField("turn_idx", T.IntegerType()),
        T.StructField("text", T.StringType()),
    ]))
    batch = "lsn BIGINT, op STRING, conv_id STRING, turn_idx INT, text STRING"
    tbl.merge_apply(
        spark.createDataFrame([(1, "I", "c1", 0, "a")], batch), {"lsn_hi": 1})
    v1 = tbl.current_version()
    tbl.merge_apply(
        spark.createDataFrame([(2, "I", "c2", 0, "b")], batch), {"lsn_hi": 2})
    tbl.merge_apply(
        spark.createDataFrame([(3, "I", "c3", 0, "c")], batch), {"lsn_hi": 3})
    tbl.expire_snapshots(keep_last=1)
    monkeypatch.setattr(sys, "argv", [
        "profile_job.py", "--target", tbl.path,
        "--baseline-version", str(v1),
    ])
    assert profile_job.main() == 1
    err = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert "unavailable" in err["error"]
