"""Duplicated-span detection: hand-checked spans, cross-doc flagging,
short-doc edge, partition invariance."""

import pytest
from pyspark.sql import functions as F

from etl_reconciliate_spark.operators.spans import duplicated_span_stats

BOILER = "this span is repeated verbatim across documents of the corpus"


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (0, BOILER + " aa bb cc dd"),
        (1, BOILER + " ee ff gg hh ii"),
        (2, "entirely unique text with no overlap at all here today ok"),
        (3, "tiny"),
        (4, None),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_span_counts(docs):
    got = {r.doc_id: r for r in duplicated_span_stats(docs, width=8).collect()}
    # doc 0: 14 tokens -> 7 spans; doc 1: 15 -> 8 spans
    assert got[0].n_spans == 7 and got[1].n_spans == 8
    # the shared prefix is 10 tokens -> 3 shared 8-gram spans
    assert got[0].n_dup_spans == 3 and got[1].n_dup_spans == 3
    assert got[0].dup_span_ratio == pytest.approx(3 / 7)
    assert got[2].n_dup_spans == 0
    assert got[3].n_spans == 0 and got[3].dup_span_ratio == 0.0
    assert got[4].n_spans == 0


def test_within_doc_repeat_not_flagged(spark):
    # a span repeated twice INSIDE one doc is not cross-doc duplication
    t = "a b c d e f g h " * 2
    d = spark.createDataFrame([(0, t)], "doc_id long, text string")
    got = duplicated_span_stats(d, width=8).collect()[0]
    assert got.n_dup_spans == 0 and got.n_spans == 9


def test_single_corpus_explode(docs):
    """The corpus must be exploded ONCE (r3 verdict item 4): the
    positional explode collapses into the persisted distinct-pairs
    table, so the executed plan has exactly one Generate; turning the
    persist off re-derives the explode for each consumer (two)."""
    # width=9: a plan no OTHER test has built — the CacheManager
    # substitutes any existing cache into identical plan fragments, so
    # reusing width=8 here would see the earlier tests' caches. The
    # no-persist variant also runs FIRST, before this test's own
    # persisted build registers its cache.
    two = duplicated_span_stats(docs, width=9, persist_pairs=False)
    plan2 = two._jdf.queryExecution().executedPlan().toString()
    assert plan2.count("Generate") == 2, plan2
    assert plan2.count("InMemoryTableScan") == 0, plan2
    one = duplicated_span_stats(docs, width=9)
    one.count()  # materialize → the persisted pairs cache is live
    plan = one._jdf.queryExecution().executedPlan().toString()
    # BOTH consumers of the pairs table read the cache (the plan text
    # re-prints the cached lineage under each scan, so counting
    # 'Generate' strings would overcount — count the cache scans)
    assert plan.count("InMemoryTableScan") == 2, plan
    assert sorted(map(tuple, one.collect())) == sorted(map(tuple, two.collect()))


def test_partition_invariance(docs):
    a = sorted(map(tuple, duplicated_span_stats(docs, width=8).collect()))
    b = sorted(
        map(tuple, duplicated_span_stats(docs.repartition(5), width=8).collect())
    )
    assert a == b
