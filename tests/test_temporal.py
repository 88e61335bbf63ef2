"""Temporal operators: as-of join, bucketed range join, rollup.

The as-of and range joins are checked against brute-force formulations
(per-row max-preceding scan / filtered cross join) on seeded data — the
scalable plan must produce the identical row set. The rollup's coarser
grains must equal direct aggregation of the raw events at that grain
(re-aggregation-from-partials correctness).
"""

import datetime as dt
import random
from decimal import Decimal

import pytest
from pyspark.sql import functions as F

from etl_reconciliate_spark.operators.temporal import (
    asof_join,
    range_join_pairs,
    rollup_timeseries,
)

T0 = dt.datetime(2024, 1, 1)


def _ts(minutes):
    return T0 + dt.timedelta(minutes=minutes)


@pytest.fixture(scope="module")
def small(spark):
    left = spark.createDataFrame(
        [
            (1, _ts(10), "L10"),
            (1, _ts(20), "L20"),
            (1, _ts(5), "L5"),
            (2, _ts(15), "L15"),
            (3, _ts(30), "L30"),
        ],
        "k int, ts timestamp, lv string",
    )
    right = spark.createDataFrame(
        [
            (1, _ts(8), 100, "R8"),
            (1, _ts(20), 200, "R20"),
            (1, _ts(20), 201, "R20b"),  # tie on (k, ts): max rid wins
            (2, _ts(40), 300, "R40"),
        ],
        "k int, ts timestamp, rid int, rv string",
    )
    return left, right


def test_asof_basic_and_ties(small):
    left, right = small
    out = asof_join(left, right, on="k", right_cols=("rid", "rv"))
    rows = {r["lv"]: (r["rid_r"], r["rv_r"], r["ts_r"]) for r in out.collect()}
    assert len(rows) == 5
    assert rows["L5"] == (None, None, None)  # nothing at or before
    assert rows["L10"] == (100, "R8", _ts(8))
    # exact match allowed + tie resolved to max (rid, rv) struct
    assert rows["L20"] == (201, "R20b", _ts(20))
    assert rows["L15"] == (None, None, None)  # right row is later
    assert rows["L30"] == (None, None, None)  # key 3 has no right rows


def test_asof_strict_excludes_exact(small):
    left, right = small
    out = asof_join(
        left, right, on="k", right_cols=("rid",), allow_exact_matches=False
    )
    rows = {r["lv"]: r["rid_r"] for r in out.collect()}
    assert rows["L20"] == 100  # the ts=20 right rows are no longer visible
    assert rows["L10"] == 100


def test_asof_tolerance(small):
    left, right = small
    out = asof_join(
        left, right, on="k", right_cols=("rid",), tolerance="5 minutes"
    )
    rows = {r["lv"]: r["rid_r"] for r in out.collect()}
    assert rows["L10"] == 100  # 2 min back: inside tolerance
    assert rows["L20"] == 201  # exact: inside
    # L5 has no match at all; unchanged
    assert rows["L5"] is None

    tight = asof_join(
        left, right, on="k", right_cols=("rid",), tolerance="1 minute"
    )
    rows = {r["lv"]: r["rid_r"] for r in tight.collect()}
    assert rows["L10"] is None  # 2 min back: match exists but too old
    assert rows["L20"] == 201  # exact match survives any tolerance


def test_asof_equals_bruteforce_seeded(spark):
    rnd = random.Random(7)
    left = [(rnd.randrange(6), _ts(rnd.randrange(5000)), i) for i in range(300)]
    right = [(rnd.randrange(6), _ts(rnd.randrange(5000)), i) for i in range(300)]
    ldf = spark.createDataFrame(left, "k int, ts timestamp, lid int")
    rdf = spark.createDataFrame(right, "k int, ts timestamp, rid int")
    out = asof_join(ldf, rdf, on="k", right_cols=("rid",))
    got = {r["lid"]: r["rid_r"] for r in out.collect()}
    assert len(got) == 300
    for k, ts, lid in left:
        cands = [(rts, rid) for rk, rts, rid in right if rk == k and rts <= ts]
        want = max(cands)[1] if cands else None
        assert got[lid] == want, f"lid={lid}"


def test_range_pairs_equal_bruteforce_seeded(spark):
    rnd = random.Random(13)
    rows = [(rnd.randrange(5), _ts(rnd.randrange(2000)), i) for i in range(400)]
    df = spark.createDataFrame(rows, "k int, ts timestamp, eid int")
    a = df.select("k", "ts", F.col("eid").alias("aid"))
    b = df.select("k", "ts", F.col("eid").alias("bid"))
    out = range_join_pairs(
        a, b, on="k", max_delta="30 minutes", a_cols=("aid",), b_cols=("bid",)
    )
    got = {(r["aid_a"], r["bid_b"]) for r in out.collect()}
    delta = dt.timedelta(minutes=30)
    want = {
        (ai, bi)
        for ka, ta, ai in rows
        for kb, tb, bi in rows
        if ka == kb and tb > ta and tb <= ta + delta
    }
    assert got == want
    # no duplicate pairs from the 2-bucket replication
    assert out.count() == len(got)


def test_rollup_partials_match_direct(spark):
    rnd = random.Random(23)
    rows = [
        ("t%d" % rnd.randrange(3), _ts(rnd.randrange(3000)),
         Decimal(rnd.randrange(1000)) / 100)
        for _ in range(500)
    ]
    ev = spark.createDataFrame(
        rows, "event_type string, ts timestamp, value decimal(38,6)"
    )
    out = rollup_timeseries(ev, grains=("minute", "hour", "day"))
    for grain in ("hour", "day"):
        got = {
            (r["bucket"], r["event_type"]): (r["n_events"], r["sum_value"],
                                             r["min_value"], r["max_value"])
            for r in out.filter(F.col("grain") == grain).collect()
        }
        direct = {
            (r["bucket"], r["event_type"]): (r["n"], r["s"], r["mn"], r["mx"])
            for r in ev.groupBy(
                F.date_trunc(grain, "ts").alias("bucket"), "event_type"
            )
            .agg(
                F.count(F.lit(1)).alias("n"), F.sum("value").alias("s"),
                F.min("value").alias("mn"), F.max("value").alias("mx"),
            )
            .collect()
        }
        assert got == direct, grain


def test_asof_plan_has_no_join(spark, small):
    """The as-of plan must be window-based: no join node anywhere."""
    left, right = small
    plan = asof_join(left, right, on="k", right_cols=("rid",))._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan
    assert "Window" in plan


def test_range_pairs_rejects_calendar_units(spark):
    """Month/year have no fixed bucket width (leap days / short months
    would silently drop cross-bucket pairs — r3 advice): raise."""
    df = spark.createDataFrame([(1, T0, 1)], "k int, ts timestamp, eid int")
    for bad in ("1 month", "2 months", "1 year", "1 YEAR"):
        with pytest.raises(ValueError, match="calendar-variable"):
            range_join_pairs(df, df, on="k", max_delta=bad)
    # fixed-duration units pass validation (7 days == the '1 week' span)
    range_join_pairs(df, df, on="k", max_delta="7 days").count()


def test_range_pairs_hot_key_correct_and_profiled(spark):
    """A key with n events inside ONE max_delta window is inherently
    O(n²) pairs — the bucketing cannot shrink that output, only keep it
    an equi-join. Verify the full quadratic pair set IS produced for a
    deliberately hot key, and that range_join_skew_profile surfaces the
    cell so a user sees the skew before scaling 100x (r3 verdict
    item 6)."""
    from etl_reconciliate_spark.operators.temporal import (
        range_join_skew_profile,
    )

    n_hot = 60
    rows = [(1, _ts(i), i) for i in range(n_hot)]  # all within 1 hour
    rows += [(2, _ts(i * 400), 1000 + i) for i in range(5)]  # cold key
    df = spark.createDataFrame(rows, "k int, ts timestamp, eid int")
    a = df.select("k", "ts", F.col("eid").alias("aid"))
    b = df.select("k", "ts", F.col("eid").alias("bid"))
    out = range_join_pairs(
        a, b, on="k", max_delta="2 hours", a_cols=("aid",), b_cols=("bid",)
    )
    # every ordered pair of the hot key qualifies: n*(n-1)/2
    assert out.filter(F.col("k") == 1).count() == n_hot * (n_hot - 1) // 2
    prof = range_join_skew_profile(df, on="k", max_delta="2 hours", top_n=3)
    top = prof.collect()[0]
    assert top["k"] == 1 and top["n_rows"] == n_hot


def test_rollup_partials_released(spark):
    """The finest-grain partials cache must not accumulate across calls
    (r3 verdict item 5): a second rollup releases the first call's
    cache, and release_rollup_partials() drops the last one."""
    from etl_reconciliate_spark.operators.temporal import (
        release_rollup_partials,
    )

    ev = spark.createDataFrame(
        [("a", T0, Decimal(1)), ("b", _ts(90), Decimal(2))],
        "event_type string, ts timestamp, value decimal(38,6)",
    )
    jsc = spark.sparkContext._jsc.sc()
    release_rollup_partials()  # drop any partials a PRIOR test left
    base = jsc.getPersistentRDDs().size()  # caches owned by other tests
    rollup_timeseries(ev, grains=("minute", "hour")).count()
    assert jsc.getPersistentRDDs().size() == base + 1
    rollup_timeseries(ev, grains=("minute", "hour")).count()
    assert jsc.getPersistentRDDs().size() == base + 1  # previous released
    release_rollup_partials()
    assert jsc.getPersistentRDDs().size() == base


def _rollup_map(df):
    return {
        (r["grain"], r["bucket"], r["event_type"]): (
            r["n_events"], r["sum_value"], r["min_value"], r["max_value"])
        for r in df.collect()
    }


def test_refresh_rollup_equals_full_recompute(spark):
    """CDC-native continuous-aggregate maintenance: after inserts,
    updates (a moved timestamp: before AND after cells dirty), and a
    delete that empties its cell entirely, refreshing the stale rollup
    with just the touched (ts, key) rows must equal a full recompute —
    including min/max, which are NOT retractable from deltas (the
    operator recomputes dirty cells from raw, so they are exact)."""
    from etl_reconciliate_spark.operators.temporal import refresh_rollup

    rnd = random.Random(31)
    v1 = [
        (i, "t%d" % rnd.randrange(3), _ts(rnd.randrange(3000)),
         Decimal(rnd.randrange(1000)) / 100)
        for i in range(400)
    ]
    schema = "eid int, event_type string, ts timestamp, value decimal(38,6)"
    ev1 = spark.createDataFrame(v1, schema)
    stale = rollup_timeseries(ev1, grains=("minute", "hour", "day"))
    stale.count()  # "materialize" the v1 rollup

    # v2: delete the SOLE event of some minute-cells (eid % 19), move
    # eid % 7 events 1500 minutes (update: old+new cells both dirty),
    # insert 40 new events
    moved = {i: _ts(rnd.randrange(3000)) for i, *_ in
             [(r[0],) for r in v1 if r[0] % 7 == 0]}
    v2 = [
        (i, t, moved.get(i, ts), v)
        for i, t, ts, v in v1 if i % 19 != 0
    ]
    inserts = [
        (1000 + i, "t%d" % rnd.randrange(3), _ts(rnd.randrange(3000)),
         Decimal(rnd.randrange(1000)) / 100)
        for i in range(40)
    ]
    v2 += inserts
    ev2 = spark.createDataFrame(v2, schema)

    # the change set: every (ts, key) cell a touched row EVER occupied
    changes = [(t, ts) for i, t, ts, v in v1 if i % 19 == 0 or i % 7 == 0]
    changes += [(t, moved[i]) for i, t, ts, v in v1 if i % 7 == 0]
    changes += [(t, ts) for i, t, ts, v in inserts]
    ch = spark.createDataFrame(changes, "event_type string, ts timestamp")

    got = refresh_rollup(ev2, stale, ch, grains=("minute", "hour", "day"))
    want = rollup_timeseries(ev2, grains=("minute", "hour", "day"))
    assert _rollup_map(got) == _rollup_map(want)


def test_refresh_rollup_untouched_cells_not_recomputed(spark):
    """The refresh must read only dirty cells from raw: with an empty
    change set the output IS the stale rollup (no raw re-aggregation
    rows), even when raw has drifted — the operator trusts the change
    feed, which is the point of incremental maintenance."""
    from etl_reconciliate_spark.operators.temporal import refresh_rollup

    ev1 = spark.createDataFrame(
        [("a", _ts(0), Decimal(1)), ("b", _ts(70), Decimal(2))],
        "event_type string, ts timestamp, value decimal(38,6)",
    )
    stale = rollup_timeseries(ev1, grains=("minute", "hour"))
    drifted = ev1.withColumn("value", F.col("value") * 10)  # unreported
    empty = spark.createDataFrame([], "event_type string, ts timestamp")
    out = refresh_rollup(drifted, stale, empty, grains=("minute", "hour"))
    assert _rollup_map(out) == _rollup_map(
        rollup_timeseries(ev1, grains=("minute", "hour"))
    )


def test_refresh_rollup_null_key_cell(spark):
    """groupBy treats NULL as a real grouping value, so a (bucket,
    NULL-key) cell exists and must be invalidated/spliced like any
    other — plain == joins would freeze it stale (code-review r4)."""
    from etl_reconciliate_spark.operators.temporal import refresh_rollup

    schema = "event_type string, ts timestamp, value decimal(38,6)"
    v1 = [("a", _ts(0), Decimal(1)), (None, _ts(1), Decimal(2))]
    ev1 = spark.createDataFrame(v1, schema)
    stale = rollup_timeseries(ev1, grains=("minute", "hour"))
    stale.count()
    # a second NULL-key event lands in the same minute cell
    v2 = v1 + [(None, _ts(1), Decimal(5))]
    ev2 = spark.createDataFrame(v2, schema)
    ch = spark.createDataFrame([(None, _ts(1))], "event_type string, ts timestamp")
    got = refresh_rollup(ev2, stale, ch, grains=("minute", "hour"))
    want = rollup_timeseries(ev2, grains=("minute", "hour"))
    assert _rollup_map(got) == _rollup_map(want)
    # the NULL-key cell really was updated, not kept stale
    row = [r for r in got.collect()
           if r["grain"] == "minute" and r["event_type"] is None][0]
    assert row["n_events"] == 2 and row["sum_value"] == Decimal(7)


def test_skew_profile_rejects_calendar_units(spark):
    """The pre-flight must refuse what the join itself refuses."""
    from etl_reconciliate_spark.operators.temporal import (
        range_join_skew_profile,
    )

    df = spark.createDataFrame([(1, T0, 1)], "k int, ts timestamp, eid int")
    with pytest.raises(ValueError, match="calendar-variable"):
        range_join_skew_profile(df, on="k", max_delta="1 month")
