"""BM25 keyword retrieval over the document corpus.

The inverted-index shape, expressed relationally (Spark has no Lucene;
it doesn't need one for batch retrieval): tokenize → per-(doc, term)
term frequencies → per-term document frequencies → score the query
terms' postings → per-query top-k. Every stage is a plain aggregation
or join, so Catalyst gets full pushdown/combine freedom.

Scale shape at 100 TB:

* the tf table is the exploded corpus but combines map-side on
  (doc_id, term); the df table is vocabulary-sized;
* queries are tiny — broadcast onto the postings, so the only big
  shuffle is the tf groupBy (one pass over the corpus);
* per-query top-k is a window over each query's candidate set
  (documents sharing ≥1 term), not the corpus.

Determinism contract (oracle-checkability): per-(query, doc) scores are
folded in lexicographic TERM order via sort_array + aggregate — a
groupBy SUM over doubles has partition-dependent order and is not even
run-to-run stable. With ``use_log=False`` the score uses the raw
Robertson odds-ratio idf ((N - df + 0.5) / (df + 0.5)) — only +,*,/ on
doubles, bit-identical across engines. With ``use_log=True`` (standard
BM25, the default) the idf takes ln(1 + odds); JVM and DuckDB ln differ
in the last ulp on ~4% of inputs, so oracle comparisons of that variant
round scores (ROUND(.,6) leaves ~1e-10 boundary odds per row).
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from etl_reconciliate_spark.operators.spans import TOKEN_SPLIT, _tokens


def term_frequencies(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(id, term, tf) — the postings table."""
    return (
        docs.select(F.col(id_col), F.explode(_tokens(F.col(text_col))).alias("term"))
        .groupBy(id_col, "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )


def bm25_topk(
    docs: DataFrame,
    queries: list[str],
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    use_log: bool = True,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Top-k documents per query under BM25.

    Returns (query_id, doc_id, score_r, rank) with ``score_r`` rounded
    to 6 decimals and rank ties broken by ascending doc id. ``queries``
    are indexed by list position. Duplicate terms within one query score
    once per occurrence (standard bag-of-words query semantics).
    """
    spark: SparkSession = docs.sparkSession
    tf = term_frequencies(docs, id_col, text_col)
    # doc length and corpus stats come from the token-array SIZE on the
    # base scan — no explode, no dependence on the tf aggregation (at
    # sf0.001 this cut the plan from 4 materializations of tf to 2; the
    # remaining two, postings + df, are inherent without persisting tf)
    dl = docs.select(
        F.col(id_col), F.size(_tokens(F.col(text_col))).cast("long").alias("dl")
    ).filter(F.col("dl") > 0)
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    stats = dl.agg(
        F.count(F.lit(1)).alias("n_docs"),
        (F.sum("dl") / F.count(F.lit(1))).alias("avgdl"),
    )

    q = spark.createDataFrame(
        [
            (qi, t)
            for qi, text in enumerate(queries)
            # the SAME split the document side (_tokens) uses — the two
            # tokenizers must agree by construction or postings and
            # query terms diverge (r4 review)
            for t in re.split(TOKEN_SPLIT, text.lower())
            if t
        ],
        "query_id int, term string",
    )

    odds = (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5)
    idf = F.log(F.lit(1.0) + odds) if use_log else odds
    component = idf * (
        F.col("tf")
        * (k1 + 1.0)
        / (
            F.col("tf")
            + k1 * (1.0 - b + b * F.col("dl").cast("double") / F.col("avgdl"))
        )
    )

    scored = (
        F.broadcast(q)
        .join(tf, "term")
        .join(dl, id_col)
        .join(F.broadcast(dfreq), "term")
        .crossJoin(F.broadcast(stats))
        .select("query_id", id_col, F.col("term"), component.alias("comp"))
    )
    # deterministic fold order: lexicographic by term (terms are unique
    # per (query, doc) — tf is pre-aggregated)
    folded = (
        scored.groupBy("query_id", id_col)
        .agg(
            F.aggregate(
                F.sort_array(F.collect_list(F.struct("term", "comp"))),
                F.lit(0.0),
                lambda acc, x: acc + x["comp"],
            ).alias("score")
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col(id_col).asc()
    )
    return (
        folded.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            id_col,
            F.round("score", 6).alias("score_r"),
            "rank",
        )
    )
