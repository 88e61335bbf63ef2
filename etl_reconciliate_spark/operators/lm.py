"""Character n-gram language-model quality scoring (CCNet-style).

The classic web-corpus quality gate (CCNet, Wenzek et al. 2020) scores
documents by language-model perplexity against a clean reference corpus
and drops the worst tail. The transformer-free, Spark-native analog: an
add-alpha-smoothed character-trigram model TRAINED with two plain
aggregations (trigram counts, bigram context counts) and APPLIED with a
broadcast join — both stages are pure DataFrame algebra, no UDF.

* **Training** is one scan of the reference slice: the model is two
  count tables bounded by |charset|^3 rows regardless of corpus size
  (a few MB — always broadcastable).
* **Scoring** explodes each document into its trigram positions. At
  100 TB that multiplies rows by text length; the exploded row is
  (id, 3 chars), combines map-side onto (id, trigram) — per-doc
  DISTINCT trigrams survive the shuffle, not positions — and the model
  join is a broadcast. The alternative when even that is too heavy: a
  vectorized pandas UDF folding the broadcast model dict per batch
  (same numbers, zero explode); this module keeps the relational form
  because it is oracle-checkable value-for-value.

Determinism: per-document log-prob sums fold in lexicographic trigram
order (sort_array + aggregate) — see ``retrieval`` for why groupBy SUM
over doubles is not usable under a bit-equality oracle. ln differs from
DuckDB's in the last ulp on ~4% of inputs; outputs are rounded to 6
decimals (boundary odds ~1e-10/row, asserted empirically at the driver
scale in tests).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def _ngram_positions(text_col: Column, n: int) -> Column:
    """Array of the ``n``-char substrings at every position (stride 1)."""
    cnt = F.length(text_col) - (n - 1)
    # sequence(1, cnt<=0) DESCENDS in Spark — guard the short-doc case
    return F.when(
        cnt >= 1,
        F.transform(F.sequence(F.lit(1), cnt), lambda i: F.substring(text_col, i, n)),
    ).otherwise(F.array().cast("array<string>"))


def train_char_lm(
    corpus: DataFrame, text_col: str = "text", n: int = 3
) -> DataFrame:
    """Train the smoothed char n-gram model: (gram, ctx, cnt, ctx_cnt).

    ``ctx`` is the (n-1)-char prefix. Returns one row per distinct
    n-gram in the training slice with its count and its context's total
    count — everything needed to evaluate add-alpha
    P(gram) = (cnt + a) / (ctx_cnt + a*V) at score time.
    """
    grams = corpus.select(
        F.explode(_ngram_positions(F.col(text_col), n)).alias("gram")
    )
    counts = grams.groupBy("gram").agg(F.count(F.lit(1)).alias("cnt"))
    ctx = counts.withColumn("ctx", F.substring(F.col("gram"), 1, n - 1))
    ctx_tot = ctx.groupBy("ctx").agg(F.sum("cnt").alias("ctx_cnt"))
    return ctx.join(ctx_tot, "ctx").select("gram", "ctx", "cnt", "ctx_cnt")


def charset_size(corpus: DataFrame, text_col: str = "text") -> DataFrame:
    """Single-row frame with V = distinct characters in the corpus."""
    return (
        corpus.select(
            F.explode(_ngram_positions(F.col(text_col), 1)).alias("ch")
        )
        .agg(F.countDistinct("ch").alias("v"))
    )


def score_docs(
    docs: DataFrame,
    model: DataFrame,
    vocab: DataFrame,
    alpha: float = 0.5,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
) -> DataFrame:
    """Per-document mean trigram log-probability under the model.

    Returns (id, n_grams, avg_logprob_r). Unseen grams in a SEEN
    context score (0 + a)/(ctx_cnt + aV); grams with an unseen context
    score the uniform a/(aV) = 1/V. Docs shorter than ``n`` chars score
    0 grams / null avg.
    """
    pos = docs.select(
        F.col(id_col), F.explode(_ngram_positions(F.col(text_col), n)).alias("gram")
    )
    # combine positions map-side: per-doc DISTINCT grams cross the
    # shuffle, each with its occurrence count
    occ = pos.groupBy(id_col, "gram").agg(F.count(F.lit(1)).alias("occ"))
    j = (
        occ.withColumn("ctx", F.substring(F.col("gram"), 1, n - 1))
        .join(F.broadcast(model.select("gram", "cnt", "ctx_cnt")), "gram", "left")
        .join(
            F.broadcast(
                model.select("ctx", "ctx_cnt").distinct().withColumnRenamed(
                    "ctx_cnt", "ctx_cnt_only"
                )
            ),
            "ctx",
            "left",
        )
        .crossJoin(F.broadcast(vocab))
    )
    prob = (F.coalesce(F.col("cnt"), F.lit(0)).cast("double") + F.lit(alpha)) / (
        F.coalesce(F.col("ctx_cnt"), F.col("ctx_cnt_only"), F.lit(0)).cast("double")
        + F.lit(alpha) * F.col("v").cast("double")
    )
    contrib = F.col("occ").cast("double") * F.log(prob)
    folded = (
        j.select(F.col(id_col), F.col("gram"), F.col("occ"), contrib.alias("lp"))
        .groupBy(id_col)
        .agg(
            F.sum("occ").alias("n_grams"),
            F.aggregate(
                F.sort_array(F.collect_list(F.struct("gram", "lp"))),
                F.lit(0.0),
                lambda acc, x: acc + x["lp"],
            ).alias("sum_lp"),
        )
    )
    out = docs.select(id_col).join(folded, id_col, "left").select(
        F.col(id_col),
        F.coalesce("n_grams", F.lit(0)).alias("n_grams"),
        F.round(F.col("sum_lp") / F.col("n_grams").cast("double"), 6).alias(
            "avg_logprob_r"
        ),
    )
    return out
