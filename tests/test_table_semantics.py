"""Round-2 table-layer semantics: pinned-version schema on time travel,
optimistic-concurrency commits, tombstone safety under out-of-order
commits, and the results/report sink."""

import json
import os
import time

import pytest
from pyspark.sql import functions as F, types as T

from etl_reconciliate_spark.target.table import (
    CommitConflictError,
    TargetTable,
)

SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType()),
        T.StructField("turn_idx", T.IntegerType()),
        T.StructField("text", T.StringType()),
    ]
)


def _batch(spark, rows, with_tool=False):
    fields = "lsn BIGINT, op STRING, conv_id STRING, turn_idx INT, text STRING"
    if with_tool:
        fields += ", tool STRING"
    return spark.createDataFrame(rows, fields)


def test_time_travel_uses_pinned_schema(spark, tmp_path):
    """A version pinned BEFORE a schema evolution must not show the
    late-added column (round-1 verdict item 7)."""
    t = TargetTable(spark, str(tmp_path / "t"), n_buckets=2, mode="mor")
    t.init(SCHEMA)
    t.merge_apply(_batch(spark, [(1, "I", "c1", 0, "hello")]), {"lsn_hi": 1})
    v_pre = t.current_version()
    t.merge_apply(
        _batch(spark, [(2, "I", "c1", 1, "hi", "calc")], with_tool=True),
        {"lsn_hi": 2},
    )
    assert "tool" in t.read().columns
    pinned = t.read(version=v_pre)
    assert "tool" not in pinned.columns
    assert pinned.count() == 1


def test_commit_conflict_and_stale_takeover(spark, tmp_path):
    t = TargetTable(spark, str(tmp_path / "t"), n_buckets=2, mode="mor")
    t.init(SCHEMA)
    t.merge_apply(_batch(spark, [(1, "I", "c1", 0, "a")]), {"lsn_hi": 1})

    # a FRESH claim on the next version slot = a live concurrent writer
    nxt = t.current_version() + 1
    claim = os.path.join(t.path, f"v{nxt:06d}.json")
    open(claim, "w").close()
    with pytest.raises(CommitConflictError):
        t.merge_apply(_batch(spark, [(2, "U", "c1", 0, "b")]), {"lsn_hi": 2})

    # an already-PUBLISHED version is always a conflict, however old
    with open(claim, "w") as f:
        json.dump({**t.metadata(), "version": nxt}, f)
    with open(t._pointer, "w") as f:
        f.write(str(nxt))
    os.utime(claim, (time.time() - 3600, time.time() - 3600))
    try:
        t2 = TargetTable(spark, t.path, n_buckets=2)
        nxt2 = nxt  # a second writer still targeting the published slot
        with pytest.raises(CommitConflictError):
            t2._commit(nxt2, SCHEMA, t2.metadata()["data_dir"], {},
                       row_count=0, parent=nxt2 - 1, mode="mor", deltas=[])
    finally:
        pass

    # a STALE unpublished claim (crashed writer) is taken over: resume works
    nxt3 = t.current_version() + 1
    stale = os.path.join(t.path, f"v{nxt3:06d}.json")
    open(stale, "w").close()
    os.utime(stale, (time.time() - 3600, time.time() - 3600))
    stats = t.merge_apply(_batch(spark, [(3, "U", "c1", 0, "c")]), {"lsn_hi": 3})
    assert stats["version"] == nxt3
    assert t.current_version() == nxt3


def test_merge_retry_after_conflict(spark, tmp_path):
    """A commit conflict from a racing writer is retried from fresh
    state inside merge_apply (r2 verdict item 8) — the first conflicted
    attempt's work is discarded and the retry lands on the next slot."""
    t = TargetTable(spark, str(tmp_path / "t"), n_buckets=2, mode="mor")
    t.init(SCHEMA)
    t.merge_apply(_batch(spark, [(1, "I", "c1", 0, "a")]), {"lsn_hi": 1})

    real = t._commit
    calls = {"n": 0}

    def flaky(*a, **k):
        calls["n"] += 1
        if calls["n"] == 1:
            raise CommitConflictError("simulated racing writer")
        return real(*a, **k)

    t._commit = flaky
    stats = t.merge_apply(_batch(spark, [(2, "U", "c1", 0, "b")]), {"lsn_hi": 2})
    assert calls["n"] == 2 and stats["version"] == t.current_version()
    assert [r["text"] for r in t.read().collect()] == ["b"]


def test_merge_retry_with_real_interleaved_writer(spark, tmp_path):
    """TRUE two-writer interleave (r3 verdict item 7): writer B commits
    a full merge_apply BETWEEN writer A's state read and A's commit, so
    A's first attempt targets a now-published slot and gets a genuine
    (not simulated) CommitConflictError from the commit protocol. A's
    built-in retry must recompute from the fresh state — B's row
    visible — and land on the next slot with BOTH writers' rows."""
    path = str(tmp_path / "t")
    a = TargetTable(spark, path, n_buckets=2, mode="mor")
    a.init(SCHEMA)
    a.merge_apply(_batch(spark, [(1, "I", "c1", 0, "base")]), {"lsn_hi": 1})
    b = TargetTable(spark, path, n_buckets=2)

    real_commit = a._commit
    state = {"attempts": 0, "b_version": None}

    def racing(*args, **kwargs):
        state["attempts"] += 1
        if state["attempts"] == 1:
            # B lands a complete merge while A is mid-commit; A's
            # then-current attempt targets the slot B takes here
            b_stats = b.merge_apply(
                _batch(spark, [(2, "I", "c2", 0, "from-b")]), {"lsn_hi": 2}
            )
            state["b_version"] = b_stats["version"]
        return real_commit(*args, **kwargs)

    a._commit = racing
    stats = a.merge_apply(
        _batch(spark, [(3, "I", "c3", 0, "from-a")]), {"lsn_hi": 3}
    )
    # attempt 1 hit a REAL published-slot conflict and was retried
    assert state["attempts"] == 2
    assert stats["version"] == state["b_version"] + 1 == 3
    rows = {r["conv_id"]: r["text"] for r in a.read().collect()}
    assert rows == {"c1": "base", "c2": "from-b", "c3": "from-a"}


def test_tombstone_retained_without_ordered_commits(spark, tmp_path):
    """Out-of-order commits (stream runner): a compaction that dropped
    tombstones would let a LATER-committed but LOWER-LSN event resurrect
    a deleted row. ordered_commits=False retains them; the deleted key
    must stay dead."""
    t = TargetTable(
        spark, str(tmp_path / "t"), n_buckets=2, mode="mor",
        ordered_commits=False,
    )
    t.init(SCHEMA)
    t.merge_apply(_batch(spark, [(10, "I", "c1", 0, "v10")]), {"b": 1})
    t.merge_apply(_batch(spark, [(20, "D", "c1", 0, None)]), {"b": 2})
    t.compact()  # retains the lsn-20 tombstone
    # out-of-order delivery: lsn 15 arrives after compaction
    t.merge_apply(_batch(spark, [(15, "U", "c1", 0, "v15")]), {"b": 3})
    assert t.read().count() == 0  # still deleted

    # control: the ordered-commits default DROPS the tombstone, which is
    # exactly why it must not be used with an out-of-order writer
    t2 = TargetTable(spark, str(tmp_path / "t2"), n_buckets=2, mode="mor")
    t2.init(SCHEMA)
    t2.merge_apply(_batch(spark, [(10, "I", "c1", 0, "v10")]), {"b": 1})
    t2.merge_apply(_batch(spark, [(20, "D", "c1", 0, None)]), {"b": 2})
    t2.compact()
    t2.merge_apply(_batch(spark, [(15, "U", "c1", 0, "v15")]), {"b": 3})
    assert t2.read().count() == 1  # resurrected — the unordered hazard


def test_compact_retained_tombstone_row_count_is_live(spark, tmp_path):
    t = TargetTable(
        spark, str(tmp_path / "t"), n_buckets=2, mode="mor",
        ordered_commits=False,
    )
    t.init(SCHEMA)
    t.merge_apply(
        _batch(spark, [(1, "I", "c1", 0, "a"), (2, "I", "c2", 0, "b")]), {"b": 1}
    )
    t.merge_apply(_batch(spark, [(3, "D", "c1", 0, None)]), {"b": 2})
    stats = t.compact()
    assert stats["row_count"] == 1  # live rows only, tombstone excluded
    assert t.count_live() == 1


def test_report_sink_and_two_sheets(spark, tmp_path):
    from etl_reconciliate_spark.sinks.report import (
        write_result_table,
        write_two_sheet_report,
    )

    recon = spark.createDataFrame(
        [
            ("c1", 0, "MATCH", "a", "a"),
            ("c1", 1, "VALUE_DISCREPANCY", "b", "b!"),
            ("c2", 0, "SOURCE_ONLY", "c", None),
        ],
        "conv_id STRING, turn_idx INT, status STRING, src_text STRING, tgt_text STRING",
    )
    out = str(tmp_path / "results")
    n = write_result_table(recon, out)
    assert n == 3
    back = spark.read.parquet(out)
    assert back.count() == 3
    # partitioned by status → the discrepancy scan prunes to one partition
    assert os.path.isdir(os.path.join(out, "status=VALUE_DISCREPANCY"))

    rep = write_two_sheet_report(
        {
            "discrepant_turns": recon.filter(F.col("status") != "MATCH"),
            "all_turns": recon,
        },
        str(tmp_path / "report"),
        order_by={"discrepant_turns": ["conv_id", "turn_idx"],
                  "all_turns": ["conv_id", "turn_idx"]},
    )
    assert rep["sheets"]["discrepant_turns"]["rows"] == 2
    csv = open(rep["sheets"]["discrepant_turns"]["csv"]).read().splitlines()
    assert csv[0].startswith("conv_id,turn_idx,status")
    assert len(csv) == 3
    html_doc = open(rep["html"]).read()
    # conditional fill on non-OK rows, none on the MATCH row
    assert html_doc.count('class="bad"') == 4  # 2 + 2 across both sheets
    assert "VALUE_DISCREPANCY" in html_doc


def _score_batch(spark, rows, score_type="INT"):
    return spark.createDataFrame(
        rows,
        f"lsn BIGINT, op STRING, conv_id STRING, turn_idx INT, score {score_type}",
    )


SCORE_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType()),
        T.StructField("turn_idx", T.IntegerType()),
        T.StructField("score", T.IntegerType()),
    ]
)


@pytest.mark.parametrize("mode", ["cow", "mor"])
def test_schema_widening_int_to_long(spark, tmp_path, mode):
    """A batch carrying a wider type (int -> long) widens the table
    schema; pre-widening data files are cast at read time; a later
    NARROWER batch (old epoch replay) is cast up without changing the
    schema; time travel to a pre-widening version keeps int."""
    from etl_reconciliate_spark.target.table import _wider  # noqa: F401

    t = TargetTable(spark, str(tmp_path / "t"), n_buckets=2, mode=mode)
    t.init(SCORE_SCHEMA)
    t.merge_apply(_score_batch(spark, [(1, "I", "c1", 0, 5)]), {"lsn_hi": 1})
    v_pre = t.current_version()
    assert dict(t.read().dtypes)["score"] == "int"

    big = 3_000_000_000  # does not fit int32
    t.merge_apply(
        _score_batch(spark, [(2, "I", "c2", 0, big)], "BIGINT"), {"lsn_hi": 2}
    )
    assert dict(t.read().dtypes)["score"] == "bigint"
    got = {(r["conv_id"], r["turn_idx"]): r["score"] for r in t.read().collect()}
    assert got == {("c1", 0): 5, ("c2", 0): big}

    # old-epoch replay with the narrow type: cast up, schema unchanged
    t.merge_apply(_score_batch(spark, [(3, "U", "c1", 0, 7)]), {"lsn_hi": 3})
    assert dict(t.read().dtypes)["score"] == "bigint"
    got = {(r["conv_id"], r["turn_idx"]): r["score"] for r in t.read().collect()}
    assert got == {("c1", 0): 7, ("c2", 0): big}

    # time travel: the pinned version still reads as int
    assert dict(t.read(version=v_pre).dtypes)["score"] == "int"


def test_schema_conflict_raises(spark, tmp_path):
    from etl_reconciliate_spark.target.table import SchemaConflictError

    t = TargetTable(spark, str(tmp_path / "t"), n_buckets=2)
    t.init(SCORE_SCHEMA)
    with pytest.raises(SchemaConflictError, match="incompatible"):
        t.merge_apply(
            _score_batch(spark, [(1, "I", "c1", 0, "oops")], "STRING"),
            {"lsn_hi": 1},
        )


def test_key_type_mismatch_raises(spark, tmp_path):
    """Key columns never evolve implicitly (ADVICE r2): a batch whose
    key arrives WIDER than the table's (long turn_idx vs int) must fail
    loudly, not be silently narrow-cast by _conform — a down-cast could
    collapse distinct keys."""
    from etl_reconciliate_spark.target.table import SchemaConflictError

    t = TargetTable(spark, str(tmp_path / "t"), n_buckets=2)
    t.init(SCORE_SCHEMA)
    t.merge_apply(_score_batch(spark, [(1, "I", "c1", 0, 5)]), {"lsn_hi": 1})
    wide_key = spark.createDataFrame(
        [(2, "I", "c1", 2**40, 6)],
        "lsn BIGINT, op STRING, conv_id STRING, turn_idx BIGINT, score INT",
    )
    with pytest.raises(SchemaConflictError, match="key column 'turn_idx'"):
        t.merge_apply(wide_key, {"lsn_hi": 2})
    # payload widening is unaffected by the key guard
    t.merge_apply(
        _score_batch(spark, [(3, "I", "c2", 0, 3_000_000_000)], "BIGINT"),
        {"lsn_hi": 3},
    )
    assert dict(t.read().dtypes)["score"] == "bigint"


def test_read_keys_bucket_pruned_lookup(spark, tmp_path):
    """Point lookup equals read().filter() on values AND provably opens
    fewer files: inputFiles() must show one file per (bucket, dir), not
    n_buckets per dir. Covers winners across deltas, tombstones, missing
    keys, and schema evolution padding."""
    t = TargetTable(spark, str(tmp_path / "t"), n_buckets=8, mode="mor",
                    compact_threshold=99)
    t.init(SCHEMA)
    rows = [(i, "I", f"c{i % 10}", i // 10, f"v{i}") for i in range(40)]
    t.merge_apply(_batch(spark, rows), {"lsn_hi": 39})
    # delta 2: update one key, delete another, evolve schema with `tool`
    t.merge_apply(
        _batch(spark, [(100, "U", "c1", 0, "upd", "calc"),
                       (101, "D", "c2", 0, None, None)], with_tool=True),
        {"lsn_hi": 101},
    )

    got = t.read_keys([("c1", 0), ("c2", 0), ("c3", 0), ("nope", 7)])
    by_key = {(r["conv_id"], r["turn_idx"]): r for r in got.collect()}
    assert set(by_key) == {("c1", 0), ("c3", 0)}  # c2 deleted, nope absent
    assert by_key[("c1", 0)]["text"] == "upd"
    assert by_key[("c1", 0)]["tool"] == "calc"
    assert by_key[("c3", 0)]["text"] == "v3"
    assert by_key[("c3", 0)]["tool"] is None  # evolution padding

    # parity with the full-scan read on the same keys
    full = t.read().filter(
        F.expr("(conv_id = 'c1' AND turn_idx = 0) OR "
               "(conv_id = 'c2' AND turn_idx = 0) OR "
               "(conv_id = 'c3' AND turn_idx = 0)")
    )
    assert sorted(map(tuple, full.collect())) == sorted(
        map(tuple, got.select(*full.columns).collect())
    )

    # the scale claim: pruned scan opens at most |buckets| files per dir
    # while the full read opens every written file
    n_pruned = len(set(got.inputFiles()))
    n_full = len(set(t.read().inputFiles()))
    assert 0 < n_pruned < n_full
    assert n_pruned <= 4 * 2  # 4 keys (<=4 buckets) x (base + 1 delta)

    # tombstone visible with include_meta
    meta_rows = {
        (r["conv_id"], r["turn_idx"]): r
        for r in t.read_keys([("c2", 0)], include_meta=True).collect()
    }
    assert meta_rows[("c2", 0)]["_deleted"] is True


def test_read_keys_version_pinned_and_empty(spark, tmp_path):
    t = TargetTable(spark, str(tmp_path / "t"), n_buckets=4, mode="cow")
    t.init(SCHEMA)
    with pytest.raises(ValueError):
        t.read_keys([])
    # before any data: empty result, correct schema
    assert t.read_keys([("c1", 0)]).count() == 0
    t.merge_apply(_batch(spark, [(1, "I", "c1", 0, "a")]), {"lsn_hi": 1})
    v1 = t.current_version()
    t.merge_apply(_batch(spark, [(2, "U", "c1", 0, "b")]), {"lsn_hi": 2})
    assert t.read_keys([("c1", 0)]).collect()[0]["text"] == "b"
    assert t.read_keys([("c1", 0)], version=v1).collect()[0]["text"] == "a"


@pytest.mark.parametrize("mode", ["cow", "mor"])
def test_merge_slot_pinned_to_read_snapshot(spark, tmp_path, mode):
    """The lost-update TOCTOU (r4 core review): writer B commits BETWEEN
    writer A's metadata read and A's commit. A's commit slot must derive
    from the snapshot A actually read — so A CONFLICTS and retries on
    top of B — not from the live pointer at commit time, which would let
    A silently overwrite B (cow: B's rows dropped from the full
    rewrite; mor: B's delta dropped from the delta list)."""
    path = str(tmp_path / "t")
    a = TargetTable(spark, path, n_buckets=2, mode=mode)
    a.init(SCHEMA)
    a.merge_apply(_batch(spark, [(1, "I", "c1", 0, "base")]), {"lsn_hi": 1})
    b = TargetTable(spark, path, n_buckets=2)

    real_meta = a.metadata
    state = {"fired": False}

    def hooked(version=None):
        m = real_meta(version)
        if not state["fired"] and version is None:
            state["fired"] = True
            b.merge_apply(
                _batch(spark, [(2, "I", "c2", 0, "from-b")]), {"lsn_hi": 2}
            )
        return m

    a.metadata = hooked
    stats = a.merge_apply(
        _batch(spark, [(3, "I", "c3", 0, "from-a")]), {"lsn_hi": 3}
    )
    assert stats["version"] == 3  # landed ON TOP of B, not instead of it
    rows = {r["conv_id"]: r["text"] for r in a.read().collect()}
    assert rows == {"c1": "base", "c2": "from-b", "c3": "from-a"}


def test_claim_placeholder_not_a_published_version(spark, tmp_path):
    """An empty vNNNNNN.json is a concurrent writer's O_EXCL claim, not
    metadata: versions() must skip it, metadata() must surface
    not-found, and expire_snapshots must neither crash on it nor
    remove it (r4 core review)."""
    t = TargetTable(spark, str(tmp_path / "t"), n_buckets=2, mode="mor")
    t.init(SCHEMA)
    for i in range(1, 4):
        t.merge_apply(_batch(spark, [(i, "I", f"c{i}", 0, "x")]), {"lsn_hi": i})
    claim = os.path.join(t.path, f"v{t.current_version() + 1:06d}.json")
    open(claim, "w").close()
    assert t.current_version() + 1 not in t.versions()
    with pytest.raises(FileNotFoundError, match="claimed"):
        t.metadata(t.current_version() + 1)
    t.expire_snapshots(keep_last=2)  # must not JSONDecodeError
    assert os.path.exists(claim)  # the claim file itself is untouched
    assert t.read().count() == 3


def test_n_buckets_is_a_table_property(spark, tmp_path):
    """A handle constructed with a DIFFERENT n_buckets against an
    existing table adopts the table's recorded count — a maintainer
    with another shuffle-partitions default must not break read_keys'
    bucket pruning (r4 core review)."""
    path = str(tmp_path / "t")
    a = TargetTable(spark, path, n_buckets=2, mode="mor")
    a.init(SCHEMA)
    a.merge_apply(_batch(spark, [(1, "I", "c1", 0, "a")]), {"lsn_hi": 1})

    b = TargetTable(spark, path, n_buckets=7)
    assert b.n_buckets == 2  # recorded count wins over the arg
    b.merge_apply(_batch(spark, [(2, "I", "c9", 5, "late")]), {"lsn_hi": 2})
    got = {(r["conv_id"], r["turn_idx"]): r["text"]
           for r in a.read_keys([("c1", 0), ("c9", 5)]).collect()}
    assert got == {("c1", 0): "a", ("c9", 5): "late"}


def test_cow_compact_vacuums_tombstones(spark, tmp_path):
    """A delete-heavy cow table reclaims its tombstones through
    compact() (the cow vacuum) — merges retain them for the row-level
    replay guard, maintenance drops them under the ordered-commits
    argument (r4 core review)."""
    t = TargetTable(spark, str(tmp_path / "t"), n_buckets=2, mode="cow")
    t.init(SCHEMA)
    t.merge_apply(_batch(spark, [(1, "I", "c1", 0, "a"),
                                 (2, "I", "c2", 0, "b")]), {"lsn_hi": 2})
    t.merge_apply(_batch(spark, [(3, "D", "c1", 0, None)]), {"lsn_hi": 3})
    # merge retained the tombstone row
    assert t.read(include_meta=True).count() == 2
    stats = t.compact()
    assert stats["row_count"] == 1
    assert t.read(include_meta=True).count() == 1  # tombstone reclaimed
    assert [r["conv_id"] for r in t.read().collect()] == ["c2"]
    assert t.metadata()["mode"] == "cow"  # mode survives the vacuum

    # out-of-order tables refuse the vacuum (no-op)
    t2 = TargetTable(spark, str(tmp_path / "t2"), n_buckets=2, mode="cow",
                     ordered_commits=False)
    t2.init(SCHEMA)
    t2.merge_apply(_batch(spark, [(1, "I", "c1", 0, "a")]), {"lsn_hi": 1})
    v = t2.current_version()
    t2.compact()
    assert t2.current_version() == v


def test_ordered_commits_is_a_table_property(spark, tmp_path):
    """A stream-fed (out-of-order) table records ordered_commits=False
    at init; a MAINTAINER handle constructed with the default True must
    inherit the recorded value, or its compaction would drop tombstones
    and let a later lower-LSN delivery resurrect the deleted row (r4
    review)."""
    path = str(tmp_path / "t")
    t = TargetTable(spark, path, n_buckets=2, mode="mor",
                    ordered_commits=False)
    t.init(SCHEMA)
    t.merge_apply(_batch(spark, [(10, "I", "c1", 0, "v10")]), {"b": 1})
    t.merge_apply(_batch(spark, [(20, "D", "c1", 0, None)]), {"b": 2})

    maintainer = TargetTable(spark, path, n_buckets=2)  # defaults: True
    assert maintainer.ordered_commits is False  # recorded value wins
    maintainer.compact()  # must RETAIN the tombstone
    # the out-of-order hazard: lsn 15 delivered after compaction
    t.merge_apply(_batch(spark, [(15, "U", "c1", 0, "v15")]), {"b": 3})
    assert t.read().count() == 0  # still deleted


def test_empty_partitioned_result_sink_rereadable(spark, tmp_path):
    """A zero-row result (the checksum strategy's happy path) written
    with partitioning must still leave a schema-bearing parquet dir —
    a partitioned empty write emits only _SUCCESS and the documented
    re-read crashes (r4 review). The count must also survive: an
    Observation is single-use, so emptiness cannot be probed up front."""
    from etl_reconciliate_spark.sinks.report import write_result_table

    df = spark.createDataFrame([("a", "MATCH")], "conv_id string, status string")
    empty = df.filter(F.col("status") == "NOPE")
    out = str(tmp_path / "res")
    assert write_result_table(empty, out, partition_by="status") == 0
    back = spark.read.parquet(out)  # must not raise
    assert back.count() == 0 and "status" in back.columns
    # non-empty control: partitioned layout + correct count
    out2 = str(tmp_path / "res2")
    assert write_result_table(df, out2, partition_by="status") == 1
    assert spark.read.parquet(out2).count() == 1


def test_compact_refuses_explicit_drop_on_unordered_table(spark, tmp_path):
    """An explicit drop_tombstones=True must not silently override a
    recorded ordered_commits=False (r5 review: maintain_job's explicit
    bool bypassed the guarantee and a later lower-LSN delivery would
    resurrect the delete). The escape hatch is allow_unordered_drop,
    which also forces the zero-delta MoR base rewrite so base-resident
    tombstones have an exit."""
    t = TargetTable(
        spark, str(tmp_path / "t"), n_buckets=2, mode="mor",
        ordered_commits=False,
    )
    t.init(SCHEMA)
    t.merge_apply(
        _batch(spark, [(1, "I", "c1", 0, "a"), (2, "I", "c2", 0, "b")]),
        {"b": 1},
    )
    t.merge_apply(_batch(spark, [(3, "D", "c1", 0, None)]), {"b": 2})
    t.compact()  # retains the tombstone (recorded unordered)
    meta = t.metadata()
    assert meta.get("deltas") == []  # tombstone now lives in the BASE
    base_rows = spark.read.parquet(
        os.path.join(t.path, meta["data_dir"])).count()
    assert base_rows == 2  # live row + retained tombstone

    with pytest.raises(ValueError, match="ordered_commits=False"):
        t.compact(drop_tombstones=True)

    # source decommissioned → explicit vacuum, zero pending deltas
    stats = t.compact(drop_tombstones=True, allow_unordered_drop=True)
    assert stats["row_count"] == 1
    vac_rows = spark.read.parquet(
        os.path.join(t.path, t.metadata()["data_dir"])).count()
    assert vac_rows == 1  # tombstone vacuumed from the base
    assert t.read().count() == 1


def test_stale_writer_cannot_rewind_pointer(spark, tmp_path):
    """The O_EXCL slot claim can succeed on a version whose metadata
    expire_snapshots already deleted; the commit must still detect the
    published pointer is ahead and raise instead of REWINDING it
    (r5 review: a rewind silently discards every newer commit)."""
    t = TargetTable(spark, str(tmp_path / "t"), n_buckets=2, mode="mor")
    t.init(SCHEMA)
    for i in range(4):
        t.merge_apply(
            _batch(spark, [(10 + i, "I", f"c{i}", 0, "x")]), {"b": i}
        )
    t.expire_snapshots(keep_last=2)
    cur = t.current_version()
    expired = [v for v in range(1, cur - 1)
               if not os.path.exists(t._meta_path(v))]
    assert expired, "fixture must have an expired version slot"
    v = expired[0]
    with pytest.raises(CommitConflictError, match="stale"):
        t._commit(version=v, schema=SCHEMA, data_dir="snap-bogus",
                  offsets={}, row_count=0, parent=v - 1)
    assert t.current_version() == cur  # pointer untouched
    # the empty claim is deliberately LEFT BEHIND (review round 4:
    # removing it raced a lock-less taker's republish and could destroy
    # published metadata); it is inert — below the pointer, never
    # targeted again, skipped by versions()
    assert os.path.getsize(t._meta_path(v)) == 0
    assert v not in t.versions()
    # and the table keeps working normally after the stale conflict
    t.merge_apply(_batch(spark, [(50, "I", "c9", 0, "y")]), {"b": 9})
    assert t.current_version() == cur + 1
    # expire reaps the inert litter (review round 5): an empty,
    # unlocked claim at or below the pointer can never be republished
    t.expire_snapshots(keep_last=2)
    assert not os.path.exists(t._meta_path(v))


def test_expire_skips_sweep_when_kept_metadata_unreadable(spark, tmp_path, monkeypatch):
    """r5 final review: a KEPT version whose metadata a concurrent
    expirer removed must NOT be treated as 'references nothing' — the
    old `continue` let the orphan sweep delete the still-live shared
    MoR base/delta dirs. When no consistent read of the kept snapshots
    is possible, the sweep is skipped entirely."""
    t = TargetTable(spark, str(tmp_path / "t"), n_buckets=2, mode="mor")
    t.init(SCHEMA)
    for i in range(4):
        t.merge_apply(
            _batch(spark, [(10 + i, "I", f"c{i}", 0, "x")]), {"lsn_hi": 10 + i}
        )
    cur = t.current_version()
    live_dirs = [
        n for n in os.listdir(t.path)
        if n.startswith(("snap-", "delta-"))
    ]
    # backdate every data dir: nothing is orphan-grace-protected
    for n in live_dirs:
        os.utime(os.path.join(t.path, n), (1, 1))

    real = TargetTable.metadata
    kept = {cur, cur - 1}

    def flaky(self, version=None):
        if version in kept:
            raise FileNotFoundError("simulated concurrent expirer")
        return real(self, version)

    monkeypatch.setattr(TargetTable, "metadata", flaky)
    t.expire_snapshots(keep_last=2, orphan_grace_secs=0)
    monkeypatch.undo()

    # the live base + retained deltas survived; the table still reads
    meta = t.metadata()
    assert os.path.isdir(os.path.join(t.path, meta["data_dir"]))
    for d in meta.get("deltas", []):
        assert os.path.isdir(os.path.join(t.path, d))
    assert t.read().count() == 4


def test_stalled_creator_resume_preserves_takeover_publish(
    spark, tmp_path, monkeypatch
):
    """r5 final review round 3: writer A creates its claim, then stalls
    PAST the grace period before flocking it; writer B legitimately
    takes the stale slot over and publishes. When A resumes, its lock
    lands on the ORPHANED claim inode (B's publish replaced the path),
    and without the inode revalidation A's expired-slot cleanup would
    os.remove B's PUBLISHED v{version}.json — the file _current points
    at — destroying an acknowledged commit. A must instead conflict and
    retry onto the next slot with B's metadata intact."""
    import etl_reconciliate_spark.target.table as tbl_mod

    t = TargetTable(spark, str(tmp_path / "t"), n_buckets=2, mode="mor")
    t.init(SCHEMA)
    t.merge_apply(_batch(spark, [(1, "I", "c0", 0, "base")]), {"lsn_hi": 1})
    contested = t.current_version() + 1

    state = {"fired": False}
    real_flock = tbl_mod._try_flock

    def stall_then_flock(fd):
        # fire once, at A's FIRST flock attempt — i.e. in the window
        # between A's O_EXCL create and its lock acquisition
        if not state["fired"]:
            state["fired"] = True
            # A's stall pushes its claim past the grace period...
            mp = t._meta_path(contested)
            os.utime(mp, (time.time() - 3600, time.time() - 3600))
            # ...and writer B takes the stale, UNLOCKED slot over and
            # fully publishes it (B's own flock calls recurse here with
            # fired already set, passing straight through)
            b = TargetTable(spark, t.path, n_buckets=2)
            b.merge_apply(
                _batch(spark, [(99, "I", "cB", 0, "winner")]),
                {"lsn_hi": 99},
            )
            assert b.current_version() == contested
        return real_flock(fd)

    monkeypatch.setattr(tbl_mod, "_try_flock", stall_then_flock)
    stats = t.merge_apply(
        _batch(spark, [(2, "I", "cA", 0, "resumed")]), {"lsn_hi": 2}
    )
    monkeypatch.undo()
    assert state["fired"]

    # A conflicted on the orphaned inode and retried onto the next slot
    assert stats["version"] == contested + 1
    # B's published metadata survived A's resume
    assert int(t.metadata(contested)["offsets"]["lsn_hi"]) == 99
    texts = {r["conv_id"]: r["text"] for r in t.read().collect()}
    assert texts == {"c0": "base", "cB": "winner", "cA": "resumed"}


def test_live_stalled_writer_cannot_be_taken_over(spark, tmp_path, monkeypatch):
    """r5 final reviews, two generations of the same race: writer A
    stalls mid-commit on version v with its claim looking STALE
    (mtime past the grace period). Under the pre-flock protocol B would
    take the slot over and publish, and A's resume could then clobber
    B's metadata in the check-then-replace window. Under the flock
    protocol A — being alive — still HOLDS the slot's lock, so B's
    attempt must conflict outright, however stale the claim looks; A
    then publishes v unopposed and B's retry lands on v+1. Both rows
    present, no clobber window at all."""
    import json as json_mod

    t = TargetTable(spark, str(tmp_path / "t"), n_buckets=2, mode="mor")
    t.init(SCHEMA)
    t.merge_apply(_batch(spark, [(1, "I", "c0", 0, "base")]), {"lsn_hi": 1})
    contested = t.current_version() + 1

    state = {"fired": False}
    real_dump = json_mod.dump

    def hook(obj, fh, **kw):
        # fire once, on A's metadata write for the contested slot —
        # A is past its claim (holding the flock) and mid-stall
        if (
            not state["fired"]
            and isinstance(obj, dict)
            and obj.get("version") == contested
        ):
            state["fired"] = True
            # A "stalls": its claim LOOKS stale to the mtime heuristic...
            mp = t._meta_path(contested)
            os.utime(mp, (time.time() - 3600, time.time() - 3600))
            # ...but A is alive and holds the slot lock, so B's takeover
            # attempt must conflict instead of proceeding
            b = TargetTable(spark, t.path, n_buckets=2)
            with pytest.raises(CommitConflictError, match="live writer"):
                b._commit(contested, SCHEMA, b.metadata()["data_dir"], {},
                          row_count=0, parent=contested - 1, mode="mor",
                          deltas=list(b.metadata().get("deltas") or []))
        return real_dump(obj, fh, **kw)

    monkeypatch.setattr(
        "etl_reconciliate_spark.target.table.json.dump", hook
    )
    stats = t.merge_apply(
        _batch(spark, [(2, "I", "cA", 0, "stalled")]), {"lsn_hi": 2}
    )
    monkeypatch.undo()
    assert state["fired"]

    # A published its own slot unopposed
    assert stats["version"] == contested
    assert int(t.metadata(contested)["offsets"]["lsn_hi"]) == 2
    # B retries AFTER A's commit and lands on the next slot
    b = TargetTable(spark, t.path, n_buckets=2)
    stats_b = b.merge_apply(
        _batch(spark, [(99, "I", "cB", 0, "after")]), {"lsn_hi": 99}
    )
    assert stats_b["version"] == contested + 1
    texts = {r["conv_id"]: r["text"] for r in t.read().collect()}
    assert texts == {"c0": "base", "cA": "stalled", "cB": "after"}


def test_concurrent_writer_hammer_loses_nothing(spark, tmp_path):
    """End-to-end contention evidence for the flock commit protocol:
    four writers (own TargetTable instances, one shared session — flock
    conflicts between fds within one process exactly as across
    processes) race 5 merges each onto one MoR table, crossing a
    compaction threshold mid-hammer. Every CommitConflictError is
    retried from fresh state. NOTHING may be lost: all 20 batches'
    rows present with their final text, versions strictly monotone,
    and the metadata row count consistent with a direct read."""
    import threading

    path = str(tmp_path / "t")
    t0 = TargetTable(spark, path, n_buckets=2, mode="mor",
                     compact_threshold=7)
    t0.init(SCHEMA)

    n_writers, n_batches = 4, 5
    errors: list = []

    def writer(w: int) -> None:
        t = TargetTable(spark, path, n_buckets=2, compact_threshold=7)
        for b in range(n_batches):
            lsn = 1000 + w * 100 + b
            batch = _batch(
                spark,
                [(lsn, "I", f"w{w}", b, f"text-{w}-{b}")],
            )
            for attempt in range(60):
                try:
                    t.merge_apply(batch, {"lsn_hi": lsn})
                    break
                except CommitConflictError:
                    time.sleep(0.05 * (1 + (attempt % 4)))
            else:
                errors.append(f"writer {w} batch {b} never committed")
                return

    threads = [
        threading.Thread(target=writer, args=(w,)) for w in range(n_writers)
    ]
    for th in threads:
        th.start()
    for th in threads:
        th.join()
    assert errors == []

    t = TargetTable(spark, path, n_buckets=2)
    rows = {(r["conv_id"], r["turn_idx"]): r["text"]
            for r in t.read().collect()}
    expect = {(f"w{w}", b): f"text-{w}-{b}"
              for w in range(n_writers) for b in range(n_batches)}
    assert rows == expect  # no lost updates, no phantoms
    # version history is strictly monotone and the pointer is readable
    vs = t.versions()
    assert vs == sorted(set(vs))
    assert t.metadata()["version"] == t.current_version()
    assert t.count_live() == n_writers * n_batches
