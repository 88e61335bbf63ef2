"""Corpus-preparation operators (operators/corpus.py): split stability,
packing boundary semantics, decontamination. (The driver additionally
value-checks all three against DuckDB oracles via __spark_entry__.)"""

import os
import sys

import pytest
from pyspark.sql import functions as F

from etl_reconciliate_spark.operators.corpus import (
    contamination_pairs,
    decontaminate,
    pack_sequences,
    split_assign,
)

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "jobs"))
try:
    import corpus_job
finally:
    sys.path.pop(0)

DOCS = "/root/testdata/sf0.001/documents.parquet"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(DOCS)


def test_split_stable_under_corpus_growth(spark, docs):
    """Hash-split membership depends only on the id: the assignment of
    the first half of the corpus is unchanged when the second half is
    added — the property that makes hash splits safe for growing
    corpora (a row-number split would reshuffle everything)."""
    half = docs.filter(F.col("doc_id") < 250)
    a = {r["doc_id"]: r["split"] for r in split_assign(half).collect()}
    b = {
        r["doc_id"]: r["split"]
        for r in split_assign(docs).filter(F.col("doc_id") < 250).collect()
    }
    assert a == b
    full = {r["doc_id"]: r["split"] for r in split_assign(docs).collect()}
    assert set(full.values()) == {"train", "val", "test"}
    # ~98/1/1 at 500 docs: train dominates
    assert sum(v == "train" for v in full.values()) > 450


def test_split_weights_and_seed(spark, docs):
    even = split_assign(docs, weights={"a": 0.5, "b": 0.5})
    counts = {r["split"]: r["n"] for r in
              even.groupBy("split").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert abs(counts["a"] - counts["b"]) < 100  # ~50/50 of 500
    s1 = {r["doc_id"]: r["split"] for r in split_assign(docs, seed=1).collect()}
    s2 = {r["doc_id"]: r["split"] for r in split_assign(docs, seed=2).collect()}
    assert s1 != s2  # different seeds → different assignment


def test_pack_sequences_boundaries(spark):
    """Within one shard, documents fill a sequence until the budget is
    crossed; the next document starts the next sequence at the offset
    where the previous ended."""
    rows = [(i, " ".join(["w"] * n))
            for i, n in [(0, 300), (1, 300), (2, 300), (3, 1500), (4, 10)]]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        r["doc_id"]: r
        for r in pack_sequences(docs, budget_tokens=512, n_shards=1).collect()
    }
    offs = [out[i]["start_offset"] for i in range(5)]
    assert offs == [0, 300, 600, 900, 2400]  # cumulative token starts
    assert [out[i]["seq_id"] for i in range(5)] == [0, 0, 1, 1, 4]
    assert all(out[i]["shard"] == out[0]["shard"] for i in range(5))


def test_pack_sequences_shards_pack_independently(spark, docs):
    """Each shard's offsets start at 0 and are gap-free (sum of earlier
    docs' tokens) — shards pack independently, no cross-shard window."""
    out = pack_sequences(docs, budget_tokens=256, n_shards=4)
    pdf = out.toPandas().sort_values(["shard", "doc_id"])
    for _, grp in pdf.groupby("shard"):
        expect = 0
        for _, r in grp.iterrows():
            assert r["start_offset"] == expect
            expect += r["n_tokens"]


def test_corpus_job_cli(spark, docs, tmp_path, capsys, monkeypatch):
    """End-to-end corpus-prep job: curate → decontaminate → split →
    pack → (split, shard)-partitioned parquet + one JSON stats line."""
    import json
    import sys

    bench_path = str(tmp_path / "bench")
    docs.filter(F.col("doc_id") % 10 == 0).write.parquet(bench_path)
    out = str(tmp_path / "corpus")
    monkeypatch.setattr(sys, "argv", [
        "corpus_job.py", "--docs", DOCS, "--out", out,
        "--benchmark", bench_path, "--budget-tokens", "256", "--shards", "4",
    ])
    assert corpus_job.main() == 0
    stats = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert stats["docs_in"] == docs.count()
    # every stage monotonically narrows the corpus (the synthetic corpus
    # contains quality/lang rejects, near-dups, AND cross-split dups)
    assert (stats["docs_in"] > stats["docs_curated"]
            > stats["docs_after_decontamination"] > 0)
    written = spark.read.parquet(out)
    n_written = written.count()
    assert n_written == stats["docs_after_decontamination"]
    assert set(written.select("split").distinct().toPandas()["split"]) <= {
        "train", "val", "test"}
    total_tokens = sum(s["tokens"] for s in stats["splits"].values())
    assert total_tokens == written.agg(F.sum("n_tokens")).collect()[0][0]
    # partition layout: a training loader reads split=train/shard=k files
    assert (tmp_path / "corpus" / "split=train" / "shard=0").exists()
    # sequences are CONTIGUOUS per (split, shard): packing runs inside
    # each split, so no sequence spans splits and every group's offsets
    # chain from 0 with no holes (r4 review)
    pdf = written.select("split", "shard", "doc_id", "n_tokens",
                         "start_offset").toPandas()
    for (_, _), g in pdf.groupby(["split", "shard"]):
        g = g.sort_values("doc_id")
        want_off = 0
        for _, row in g.iterrows():
            assert row["start_offset"] == want_off, (row, want_off)
            want_off += row["n_tokens"]


def test_decontaminate_drops_flagged_only(spark, docs):
    bench = docs.filter(F.col("doc_id") % 10 == 0)
    train = docs.filter(F.col("doc_id") % 10 != 0)
    pairs = contamination_pairs(train, bench, k=8, min_overlap_frac=0.3)
    flagged = {r["train_id"] for r in pairs.collect()}
    assert flagged  # the corpus contains cross-split near-dups
    clean = decontaminate(train, bench, k=8, min_overlap_frac=0.3)
    kept = {r["doc_id"] for r in clean.select("doc_id").collect()}
    assert kept == {r["doc_id"] for r in train.select("doc_id").collect()} - flagged
    # an exact copy of a benchmark doc is always flagged
    copy = bench.limit(1).withColumn("doc_id", F.lit(99_999).cast("long"))
    pairs2 = contamination_pairs(
        train.unionByName(copy), bench, k=8, min_overlap_frac=0.3
    )
    assert 99_999 in {r["train_id"] for r in pairs2.collect()}


def test_conversations_to_documents_order_and_nulls(spark):
    """Assembly must order by turn_idx regardless of input row order,
    render null text as empty, and tolerate gaps in turn numbering."""
    from etl_reconciliate_spark.operators.corpus import (
        conversations_to_documents,
    )

    turns = spark.createDataFrame(
        [
            ("c1", 2, "assistant", "fine"),
            ("c1", 0, "user", "hello"),
            ("c1", 5, "user", None),
            ("c1", 1, "assistant", "hi"),
            ("c2", 0, "user", "solo"),
        ],
        "conv_id string, turn_idx int, role string, text string",
    )
    got = {
        r["conv_id"]: r
        for r in conversations_to_documents(turns.repartition(4)).collect()
    }
    assert got["c1"]["doc_text"] == (
        "user: hello\nassistant: hi\nassistant: fine\nuser: "
    )
    assert got["c1"]["n_turns"] == 4
    assert got["c1"]["n_chars"] == len(got["c1"]["doc_text"])
    assert got["c2"]["doc_text"] == "user: solo" and got["c2"]["n_turns"] == 1


def test_corpus_job_cli_no_broadcast_benchmark(
    spark, docs, tmp_path, capsys, monkeypatch
):
    """--no-broadcast-benchmark reaches decontaminate(broadcast=False)
    from the spark-submit surface (r5 batch review ×2: the operator-
    level escape hatch was unreachable from the only runnable
    entrypoint) and the shuffle-join path drops exactly the same docs
    as broadcast. The spy on the operator makes the test fail if the
    job stops forwarding the kwarg — without it, both runs silently
    take the broadcast path and the equivalence check passes trivially."""
    import json
    import sys

    from etl_reconciliate_spark.operators import corpus as corpus_ops

    seen_broadcast = []
    real = corpus_ops.decontaminate

    def spy(*a, **kw):
        seen_broadcast.append(kw.get("broadcast", True))
        return real(*a, **kw)

    # corpus_job does `from ...corpus import decontaminate` INSIDE
    # main(), so patching the module attribute intercepts every run
    monkeypatch.setattr(corpus_ops, "decontaminate", spy)

    bench_path = str(tmp_path / "bench")
    docs.filter(F.col("doc_id") % 10 == 0).write.parquet(bench_path)
    outs = {}
    stats = {}
    for label, extra in (("bcast", []),
                         ("shuffle", ["--no-broadcast-benchmark"])):
        out = str(tmp_path / f"corpus_{label}")
        monkeypatch.setattr(sys, "argv", [
            "corpus_job.py", "--docs", DOCS, "--out", out,
            "--benchmark", bench_path, "--budget-tokens", "256",
            "--shards", "2", *extra,
        ])
        assert corpus_job.main() == 0
        stats = json.loads(
            capsys.readouterr().out.strip().splitlines()[-1])
        outs[label] = (
            stats["docs_after_decontamination"],
            {r.doc_id for r in
             spark.read.parquet(out).select("doc_id").collect()},
        )
    assert seen_broadcast == [True, False]  # the flag actually arrived
    assert outs["bcast"] == outs["shuffle"]
    # decontamination itself removed docs (bounding by docs_curated —
    # not docs.count() — so curation losses can't mask a no-op)
    assert 0 < outs["bcast"][0] < stats["docs_curated"]
