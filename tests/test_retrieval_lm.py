"""BM25 retrieval + char-trigram LM scoring: hand-checked values,
determinism across partitionings, and python-reference parity."""

import math

import pytest
from pyspark.sql import functions as F

from etl_reconciliate_spark.operators.lm import (
    charset_size,
    score_docs,
    train_char_lm,
)
from etl_reconciliate_spark.operators.retrieval import bm25_topk, term_frequencies

DOCS = [
    (0, "spark merge table scan"),
    (1, "merge merge table"),
    (2, "hash join probe build hash"),
    (3, "window sort spill"),
    (4, "table scan table scan table"),
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def _pyref_bm25(queries, k1=1.2, b=0.75, use_log=True):
    toks = {d: t.split() for d, t in DOCS}
    n = len(DOCS)
    avgdl = sum(len(t) for t in toks.values()) / n
    df = {}
    for t in toks.values():
        for term in set(t):
            df[term] = df.get(term, 0) + 1
    out = {}
    for qi, q in enumerate(queries):
        for d, t in toks.items():
            score, terms = 0.0, sorted(set(q.split()) & set(t))
            for term in terms:
                tf = t.count(term)
                odds = (n - df[term] + 0.5) / (df[term] + 0.5)
                idf = math.log(1.0 + odds) if use_log else odds
                score += idf * (
                    tf * (k1 + 1) / (tf + k1 * (1 - b + b * len(t) / avgdl))
                )
            if terms:
                out[(qi, d)] = round(score, 6)
    return out


def test_bm25_matches_python_reference(docs):
    queries = ["table scan", "hash merge"]
    got = {
        (r.query_id, r.doc_id): r.score_r
        for r in bm25_topk(docs, queries, k=10).collect()
    }
    assert got == _pyref_bm25(queries)


def test_bm25_rank_and_k(docs):
    rows = bm25_topk(docs, ["table scan"], k=2).collect()
    assert len(rows) == 2
    assert [r.rank for r in sorted(rows, key=lambda r: r.rank)] == [1, 2]
    # doc 4 ("table scan table scan table") must outrank doc 0
    top = min(rows, key=lambda r: r.rank)
    assert top.doc_id == 4


def test_bm25_deterministic_across_partitionings(docs):
    a = sorted(map(tuple, bm25_topk(docs, ["table hash"], k=5).collect()))
    b = sorted(
        map(tuple, bm25_topk(docs.repartition(13), ["table hash"], k=5).collect())
    )
    assert a == b


def test_tf_table(docs):
    tf = {
        (r.doc_id, r.term): r.tf for r in term_frequencies(docs).collect()
    }
    assert tf[(4, "table")] == 3 and tf[(4, "scan")] == 2
    assert tf[(2, "hash")] == 2


def _pyref_lm(train_texts, score_texts, alpha=0.5, n=3):
    from collections import Counter

    grams = Counter()
    for t in train_texts:
        for i in range(len(t) - n + 1):
            grams[t[i : i + n]] += 1
    ctx_tot = Counter()
    for g, c in grams.items():
        ctx_tot[g[: n - 1]] += c
    v = len({ch for t in train_texts for ch in t})
    out = {}
    for d, t in score_texts:
        lps = []
        for i in range(len(t) - n + 1):
            g = t[i : i + n]
            cnt = grams.get(g, 0)
            ct = ctx_tot.get(g[: n - 1], 0)
            lps.append(math.log((cnt + alpha) / (ct + alpha * v)))
        out[d] = (len(lps), round(sum(sorted_contribs(t, grams, ctx_tot, alpha, v, n)) / len(lps), 6) if lps else None)
    return out


def sorted_contribs(t, grams, ctx_tot, alpha, v, n):
    """Mirror the operator's fold order: per-distinct-gram occ*logp,
    summed in lexicographic gram order."""
    from collections import Counter

    occ = Counter(t[i : i + n] for i in range(len(t) - n + 1))
    return [
        occ[g] * math.log((grams.get(g, 0) + alpha) / (ctx_tot.get(g[:2], 0) + alpha * v))
        for g in sorted(occ)
    ]


def test_lm_matches_python_reference(spark, docs):
    model = train_char_lm(docs)
    vocab = charset_size(docs)
    got = {
        r.doc_id: (r.n_grams, r.avg_logprob_r)
        for r in score_docs(docs, model, vocab).collect()
    }
    ref = _pyref_lm([t for _, t in DOCS], DOCS)
    assert got == ref


def test_lm_ranks_fluent_above_garbage(spark, docs):
    model = train_char_lm(docs)
    vocab = charset_size(docs)
    probe = spark.createDataFrame(
        [(100, "table scan merge table"), (101, "zzqx!!@@ zz qqq")],
        "doc_id long, text string",
    )
    s = {r.doc_id: r.avg_logprob_r for r in score_docs(probe, model, vocab).collect()}
    assert s[100] > s[101]


def test_lm_short_doc(spark, docs):
    model = train_char_lm(docs)
    vocab = charset_size(docs)
    probe = spark.createDataFrame([(7, "ab")], "doc_id long, text string")
    r = score_docs(probe, model, vocab).collect()[0]
    assert r.n_grams == 0 and r.avg_logprob_r is None
