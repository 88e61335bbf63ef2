"""Pipeline-hygiene operators: Gopher repetition metrics, PII scrub,
deterministic mixture sampling. (The driver additionally value-checks
all three against DuckDB oracles via __spark_entry__.)"""

import pytest
from pyspark.sql import functions as F

from etl_reconciliate_spark.operators.mixture import mixture_sample
from etl_reconciliate_spark.operators.privacy import scrub_pii
from etl_reconciliate_spark.operators.repetition import with_repetition


def _one(df):
    rows = df.collect()
    assert len(rows) == 1
    return rows[0]


# ------------------------------------------------------------- repetition

def test_repetition_duplicate_lines(spark):
    text = "hello world\nhello world\nbye now\n\n  \n"
    r = _one(with_repetition(
        spark.createDataFrame([(1, text)], "doc_id long, text string")))
    assert r["n_lines"] == 3  # blank/whitespace lines excluded
    assert r["dup_line_frac"] == pytest.approx(1 / 3)
    # dup chars: one repeat occurrence of 'hello world' (11 chars) over
    # 11+11+7 line chars
    assert r["dup_line_char_frac"] == pytest.approx(11 / 29)
    # dup_line_frac 0.333 exceeds the 0.30 Gopher gate
    assert r["repetitive"]


def test_repetition_flag_thresholds(spark):
    clean = "a b c d e f g h i j"
    spam = "buy now " * 50  # one bigram dominates
    df = spark.createDataFrame(
        [(1, clean), (2, spam)], "doc_id long, text string")
    got = {r["doc_id"]: r for r in with_repetition(df).collect()}
    assert not got[1]["repetitive"]
    assert got[2]["repetitive"]
    assert got[2]["top_bigram_char_frac"] > 0.2
    assert got[2]["dup_token_frac"] == pytest.approx(98 / 100)


def test_repetition_top_bigram_math(spark):
    # 'a b a b c': bigrams [a b, b a, a b, b c]; top = 'a b' ×2 ×3 chars
    r = _one(with_repetition(
        spark.createDataFrame([(1, "a b a b c")], "doc_id long, text string")))
    assert r["n_tokens"] == 5
    assert r["dup_token_frac"] == pytest.approx(2 / 5)
    assert r["top_bigram_char_frac"] == pytest.approx(6 / 9)


def test_repetition_empty_and_null(spark):
    df = spark.createDataFrame(
        [(1, ""), (2, None), (3, "   ")], "doc_id long, text string")
    for r in with_repetition(df).collect():
        assert r["n_tokens"] == 0 and r["n_lines"] == 0
        assert r["dup_line_frac"] == 0.0 and r["top_bigram_char_frac"] == 0.0
        assert not r["repetitive"]


# -------------------------------------------------------------------- pii

def test_pii_scrub_counts_and_redaction(spark):
    text = ("write a@b.com or c.d+x@e.org, ssn 123-45-6789, "
            "ip 10.0.0.1, tel +1 555-0199-042")
    r = _one(scrub_pii(
        spark.createDataFrame([(1, text)], "doc_id long, text string")))
    assert (r["n_email"], r["n_ssn"], r["n_ipv4"], r["n_phone"]) == (2, 1, 1, 1)
    assert r["pii_total"] == 5
    assert r["clean_text"] == ("write <EMAIL> or <EMAIL>, ssn <SSN>, "
                               "ip <IP>, tel <PHONE>")


def test_pii_ordering_no_double_count(spark):
    # an SSN-shaped number also matches the phone pattern; the ssn
    # stage must consume it so the phone count stays 0
    r = _one(scrub_pii(
        spark.createDataFrame([(1, "id 123-45-6789 end")],
                              "doc_id long, text string")))
    assert r["n_ssn"] == 1 and r["n_phone"] == 0
    r2 = _one(scrub_pii(
        spark.createDataFrame([(1, "no pii here")], "doc_id long, text string")))
    assert r2["pii_total"] == 0 and r2["clean_text"] == "no pii here"


# ---------------------------------------------------------------- mixture

@pytest.fixture(scope="module")
def src_docs(spark):
    rows = [(i, f"src{i % 4}") for i in range(400)]
    return spark.createDataFrame(rows, "doc_id long, source string")


def test_mixture_rates(spark, src_docs):
    out = mixture_sample(
        src_docs, {"src0": 0.5, "src1": 2.25, "src2": 0.0}, default_rate=1.0)
    per_src = {r["source"]: r["n"] for r in
               out.groupBy("source").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert "src2" not in per_src          # rate 0 drops the source
    assert per_src["src3"] == 100         # default rate 1.0
    assert 30 < per_src["src0"] < 70      # ~half of 100
    assert 200 < per_src["src1"] < 250    # ~2.25×100
    # upsampled docs carry dense copy indexes 1..n
    copies = (out.filter(F.col("source") == "src1")
              .groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"),
                                     F.max("copy_idx").alias("mx")).collect())
    assert all(r["n"] == r["mx"] and r["n"] in (2, 3) for r in copies)


def test_mixture_deterministic_and_growth_stable(spark, src_docs):
    rates = {"src0": 0.5, "src1": 2.25}
    a = sorted(map(tuple, mixture_sample(src_docs, rates).collect()))
    b = sorted(map(tuple, mixture_sample(src_docs, rates).collect()))
    assert a == b
    # a doc's fate is independent of the rest of the corpus
    half = mixture_sample(src_docs.filter(F.col("doc_id") < 200), rates)
    full = mixture_sample(src_docs, rates).filter(F.col("doc_id") < 200)
    assert sorted(map(tuple, half.collect())) == sorted(map(tuple, full.collect()))


def test_mixture_validation(spark, src_docs):
    with pytest.raises(ValueError, match="negative"):
        mixture_sample(src_docs, {"src0": -1.0})


def test_mixture_oracle_empty_rates_valid_sql():
    """mixture_sample({}) is legal config; its oracle SQL must parse
    too (a CASE with zero WHEN branches is a syntax error — r4
    review), and quoted source names must be escaped."""
    import duckdb

    from etl_reconciliate_spark.operators.mixture import mixture_oracle_sql

    con = duckdb.connect()
    con.execute("CREATE VIEW documents AS SELECT 1 AS doc_id, "
                "'o''brien' AS source")
    assert con.execute(mixture_oracle_sql({})).fetchall() is not None
    assert con.execute(
        mixture_oracle_sql({"o'brien": 2.0})
    ).fetchall() is not None


def test_bpe_token_count_symmetric_boundaries(spark):
    """'abc123' and '123abc' must split the same way (r4 review: only
    digit->non-digit inserted a break)."""
    from etl_reconciliate_spark.operators.textstats import (
        bpe_ish_token_count,
    )

    df = spark.createDataFrame(
        [("abc123",), ("123abc",), ("gpt4 turbo-x",)], ["text"]
    )
    got = [r[0] for r in df.select(bpe_ish_token_count(F.col("text"))).collect()]
    assert got[0] == got[1] == 2
    assert got[2] == 4  # gpt|4|turbo-x -> 'turbo' '-' 'x'? no: '-' marks
