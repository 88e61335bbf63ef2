"""Local mirror of the driver's correctness gate: every queries() entry
with an oracle_sql() runs on Spark AND DuckDB at sf0.001 and must match
on row count, column names/types, and order-insensitive values."""

import datetime
import math
from decimal import Decimal

import duckdb
import pytest

import __spark_entry__ as entry_mod

SF_DIR = __import__("os").environ.get("ORACLE_SF_DIR", "/root/testdata/sf0.001")
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def ddb():
    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    return con


def _canon(v):
    # STRICT representation mirror of the driver's value hash (round-1
    # lesson: Decimal.normalize() here green-washed queries the driver
    # hashed red because Spark emitted Decimal('x.000000') while DuckDB
    # emitted float x). Decimals keep their scale; floats use repr (exact
    # round-trip) — both engines must produce the SAME TYPE and bits.
    if v is None:
        return "\x00"
    if isinstance(v, Decimal):
        return str(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return repr(v)
    if isinstance(v, datetime.datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, datetime.date):
        return v.isoformat()
    return str(v)


def _rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(
        tuple(_canon(r[i]) for i in order) for r in rows
    )


ORACLED = sorted(entry_mod.oracle_sql().keys())


@pytest.mark.parametrize("name", ORACLED)
def test_query_matches_oracle(spark, ddb, name):
    q = entry_mod.queries()[name]
    sdf = q(spark, SF_DIR)
    s_cols = sdf.columns
    s_rows = [tuple(r) for r in sdf.collect()]

    rel = ddb.sql(entry_mod.oracle_sql()[name])
    d_cols = rel.columns
    d_rows = rel.fetchall()

    assert sorted(s_cols) == sorted(d_cols), f"{name}: column names differ"
    assert len(s_rows) == len(d_rows), (
        f"{name}: row count {len(s_rows)} vs {len(d_rows)}"
    )
    # an empty result "matches" trivially and verifies nothing (round-1
    # verdict: p_filters_notin and embedding_near_dups were green on 0
    # rows) — every oracle-checked query must exercise real data.
    assert len(s_rows) > 0, f"{name}: oracle check is vacuous on 0 rows"
    a = _rows(s_cols, s_rows)
    b = _rows(d_cols, d_rows)
    mism = [i for i, (x, y) in enumerate(zip(a, b)) if x != y][:5]
    assert a == b, f"{name}: first mismatches at {mism}: " + "; ".join(
        f"{a[i]} != {b[i]}" for i in mism
    )


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    assert df.count() > 0
    assert df.columns == ["key", "src_amt", "tgt_amt", "status"]


def test_rows_only_queries(spark):
    # only the two approximate-ANN entries remain rows-only (recall is
    # pytest-gated in test_similarity.py); the multimodal family is
    # value-oracled since the md5 stub switch (r2 verdict item 3)
    for name in ("ann_lsh_topk", "ann_ivf_topk"):
        df = entry_mod.queries()[name](spark, SF_DIR)
        assert df.count() > 0, name
