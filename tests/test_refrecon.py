"""Reference-parity: the Spark refrecon pipeline vs the pure-Python
oracle (tests/pyref.py) on SWIFT/JPAT-shaped fixtures — full row
multisets AND status counts (BASELINE.json:2 parity gate)."""

from decimal import Decimal

import pytest

from etl_reconciliate_spark.operators.refrecon import reconcile_swift_jpat
from etl_reconciliate_spark.schemas import (
    BP_BATCH_SCHEMA,
    BP_BATCHTRANSACTION_SCHEMA,
    MENSAJES_SCHEMA,
    PAYMENTS_SCHEMA,
)

from fixtures_swift_jpat import LB, REF_DATE, gen_fixture
from pyref import pyref_reconcile

Q6 = Decimal("0.000001")


def _norm(v):
    if isinstance(v, Decimal):
        return v.quantize(Q6)
    return v


TRX_COLS = [
    "swift_id", "swift_reference", "swift_amount", "swift_source_account",
    "swift_dest_account", "jpat_reference", "jpat_amount",
    "jpat_source_account", "jpat_dest_account", "status",
]
BATCH_COLS = [
    "swift_id", "customer_nit", "file_name", "loading_time",
    "application_date", "amount_swift", "amount_jpat", "status",
]


@pytest.fixture(scope="module")
def results(spark):
    mensajes, payments, batches, trxs = gen_fixture(seed=42, n_random_msgs=40)
    m_df = spark.createDataFrame(mensajes, schema=MENSAJES_SCHEMA)
    p_df = spark.createDataFrame(payments, schema=PAYMENTS_SCHEMA)
    b_df = spark.createDataFrame(batches, schema=BP_BATCH_SCHEMA)
    t_df = spark.createDataFrame(trxs, schema=BP_BATCHTRANSACTION_SCHEMA)

    trx_res, batch_res = reconcile_swift_jpat(m_df, p_df, b_df, t_df, LB, REF_DATE)
    spark_trx = [tuple(_norm(r[c]) for c in TRX_COLS) for r in trx_res.collect()]
    spark_batch = [tuple(_norm(r[c]) for c in BATCH_COLS) for r in batch_res.collect()]

    py_trx_rows, py_batch_rows = pyref_reconcile(
        mensajes, payments, batches, trxs, LB, REF_DATE
    )
    py_trx = [tuple(_norm(r[c]) for c in TRX_COLS) for r in py_trx_rows]
    py_batch = [tuple(_norm(r[c]) for c in BATCH_COLS) for r in py_batch_rows]
    return spark_trx, spark_batch, py_trx, py_batch


def _key(t):
    return tuple("\x00" if v is None else str(v) for v in t)


def test_transaction_rows_parity(results):
    spark_trx, _, py_trx, _ = results
    assert sorted(spark_trx, key=_key) == sorted(py_trx, key=_key)


def test_batch_rows_parity(results):
    _, spark_batch, _, py_batch = results
    assert sorted(spark_batch, key=_key) == sorted(py_batch, key=_key)


def test_status_counts_parity(results):
    from collections import Counter

    spark_trx, spark_batch, py_trx, py_batch = results
    assert Counter(t[-1] for t in spark_trx) == Counter(t[-1] for t in py_trx)
    assert Counter(b[-1] for b in spark_batch) == Counter(b[-1] for b in py_batch)


def test_all_paths_exercised(results):
    """The fixture must actually hit every classification path."""
    _, _, py_trx, py_batch = results
    trx_statuses = {t[-1] for t in py_trx}
    assert {"OK", "NO EN JPAT", "NO EN SWIFT"} <= trx_statuses
    assert any(s.startswith("TRANSACCION DUPLICADA JPAT") for s in trx_statuses)
    batch_statuses = {b[-1] for b in py_batch}
    assert {
        "OK", "ERROR", "LOTE DUPLICADO JPAT",
        "TRANSACCIONES CON ERROR", "DIFERENCIA EN VALOR",
    } <= batch_statuses
