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


def test_results_sink_and_report_parity(spark, tmp_path):
    """K1 parity (round-1 verdict item 4): the two result sets persist to
    result tables and render as the two-sheet report, and what lands on
    disk matches the pyref oracle row-for-row."""
    from collections import Counter

    from etl_reconciliate_spark.sinks.report import (
        write_result_table,
        write_two_sheet_report,
    )

    mensajes, payments, batches, trxs = gen_fixture(seed=7, n_random_msgs=25)
    m_df = spark.createDataFrame(mensajes, schema=MENSAJES_SCHEMA)
    p_df = spark.createDataFrame(payments, schema=PAYMENTS_SCHEMA)
    b_df = spark.createDataFrame(batches, schema=BP_BATCH_SCHEMA)
    t_df = spark.createDataFrame(trxs, schema=BP_BATCHTRANSACTION_SCHEMA)
    trx_res, batch_res = reconcile_swift_jpat(m_df, p_df, b_df, t_df, LB, REF_DATE)

    n_trx = write_result_table(trx_res, str(tmp_path / "trx_results"))
    n_batch = write_result_table(batch_res, str(tmp_path / "batch_results"))

    py_trx, py_batch = pyref_reconcile(mensajes, payments, batches, trxs, LB, REF_DATE)
    assert n_trx == len(py_trx) and n_batch == len(py_batch)

    # the PERSISTED rows (not the in-memory frames) match the oracle
    back = spark.read.parquet(str(tmp_path / "trx_results"))
    got = sorted(
        [tuple(_norm(r[c]) for c in TRX_COLS) for r in back.collect()], key=_key
    )
    want = sorted(
        [tuple(_norm(r[c]) for c in TRX_COLS) for r in py_trx], key=_key
    )
    assert got == want

    # two-sheet report: both result sets, non-OK rows conditionally filled
    rep = write_two_sheet_report(
        {"transactions": trx_res, "batches": batch_res},
        str(tmp_path / "report"),
        title="SWIFT vs JPAT",
        order_by={"transactions": ["swift_id", "status"],
                  "batches": ["swift_id"]},
    )
    assert rep["sheets"]["transactions"]["rows"] == len(py_trx)
    assert rep["sheets"]["batches"]["rows"] == len(py_batch)
    html_doc = open(rep["html"]).read()
    n_bad = sum(1 for t in py_trx if t["status"] != "OK") + sum(
        1 for b in py_batch if b["status"] != "OK"
    )
    assert html_doc.count('class="bad"') == n_bad
    counts = Counter(t["status"] for t in py_trx)
    csv_lines = open(rep["sheets"]["transactions"]["csv"]).read().splitlines()
    assert len(csv_lines) == len(py_trx) + 1
    assert sum(1 for l in csv_lines if l.endswith(",OK")) == counts["OK"]
