"""Reference-parity reconciler over SWIFT/JPAT-shaped tables.

A set-oriented Spark re-expression of the reference's entire four-step
job (extract → keyed lookup → match classification → batch rollup),
preserving its semantics row-for-row (SURVEY §1.4). Citations are to
/root/reference/src/main/java/co/com/itau/.

Semantic decisions (documented deviations where the reference is
nondeterministic):

* "first payment" (LoadJpatBatchesTasklet.java:81) and "first batch"
  (ReconciliationService.java:63) are DB-return-order in the reference;
  we impose stable orders — payments by (reference NULLS LAST, amount,
  source, dest), batches by uuid — counts are unaffected.
* JPAT transactions have object identity, not value identity (no
  equals/hashCode on BpBatchTransactionDTO), so duplicate identical rows
  stay distinct rows; we give each a deterministic per-batch row id.
* Matching is many-to-many (SURVEY §1.4(2)): a transaction matched by
  payment A stays in the pool for payment B; "used" only suppresses the
  trailing NO EN SWIFT row → computed as an anti-join against matched
  transaction ids, not an assignment.
* Match predicate (ReconciliationService.java:147-152): null-safe string
  equality (Objects.equals) on reference/source/dest + numeric decimal
  equality on amount.
* Batch-lookup predicate (BpBatchDAOImpl.java:34-52 +
  LoadJpatBatchesTasklet.java:89-95): plain SQL equality on customer and
  first-payment reference (nulls never match), creation date >=
  (ref_date - 2 months), BATLOADTYPE=3, BATSTATUS NOT IN (4,8,1024,2048);
  the correlated SUM subquery is decorrelated into a groupBy (SURVEY J4)
  and the redundant t_all self-join (J3) is dropped under EXISTS
  semantics.
* Amount policy (SURVEY §1.4(1)): all amounts normalized to
  DecimalType(38,6) so transaction-level compareTo and batch-level
  Objects.equals coincide.
* DELIBERATE deviation — multi-payer sequences: the reference keys its
  candidate-batch map by messageId (LoadJpatBatchesTasklet:
  ``batchMap.put(messageId, batches)``), so when one mmg_sequence
  yields several group rows (one per payer) the LAST payer's batch list
  OVERWRITES the earlier ones and every row reconciles against it —
  a HashMap-collision artifact, not a business rule. This port keys by
  ``msg_uid`` (the per-group surrogate), giving each payer row its own
  candidate batches. For single-payer sequences (the overwhelming case,
  and all driver fixtures) the two are identical; for multi-payer
  sequences this port's per-payer lookup is the semantically-intended
  behavior and statuses may differ from the reference's
  last-payer-wins output.
"""

from __future__ import annotations

import datetime

from pyspark.sql import DataFrame, Window, functions as F

STATUS_NOT_IN_SWIFT = "NO EN SWIFT"
STATUS_NOT_IN_JPAT = "NO EN JPAT"
STATUS_DUPLICATE_TRANSACTION_JPAT = "TRANSACCION DUPLICADA JPAT "
STATUS_SUCCESS = "OK"
STATUS_ERROR = "ERROR"
STATUS_DUPLICATE_BATCH_JPAT = "LOTE DUPLICADO JPAT"
STATUS_VALUE_MISMATCH = "DIFERENCIA EN VALOR"
STATUS_TRANSACTIONS_WITH_ERROR = "TRANSACCIONES CON ERROR"

_NULL = "\x00"  # sentinel for null-safe surrogate keys


def _uid(*cols):
    return F.sha2(
        F.concat_ws("\x01", *[F.coalesce(c.cast("string"), F.lit(_NULL)) for c in cols]),
        256,
    )


def extract_messages(mensajes: DataFrame, payments: DataFrame, lower_bound) -> DataFrame:
    """S1/A1: the SWIFT message extract (AsMonitoringMessagesDAOImpl.java:31-64).

    INNER JOIN to payments (ALL payment statuses — the SQL has no
    MPY_STATUS filter here, unlike the per-message payment list), grouped
    on (sequence, payer, loadingtime, paymentdate) with SUM(amount);
    dates truncated at mapping time (rs.getDate().toLocalDate(),
    AsMonitoringMessagesDAOImpl.java:72-73). ``msg_uid`` is a surrogate
    for the group key (the reference reconciles each group row
    independently — SURVEY §1.4(5))."""
    m = mensajes.filter(
        (F.col("mmg_loadingtime") >= F.lit(lower_bound))
        & (F.col("mmg_msgtype") == "MT101")
        & (F.col("mmg_status") == "LOADED")
    )
    g = (
        m.join(payments, "mmg_sequence", "inner")
        .groupBy("mmg_sequence", "mpy_payerid", "mmg_loadingtime", "mpy_paymentdate")
        .agg(F.sum("mpy_amount").alias("amount"))
    )
    return g.select(
        F.col("mmg_sequence").alias("message_id"),
        F.col("mpy_payerid").alias("customer_id"),
        F.to_date("mmg_loadingtime").alias("fecha_cargue"),
        F.col("mpy_paymentdate").alias("fecha_aplicacion"),
        F.col("amount"),
        _uid(
            F.col("mmg_sequence"),
            F.col("mpy_payerid"),
            F.col("mmg_loadingtime"),
            F.col("mpy_paymentdate"),
        ).alias("msg_uid"),
        F.col("mmg_sequence"),
    )


def message_payments(msgs: DataFrame, payments: DataFrame) -> DataFrame:
    """S2 decorrelated: every message row carries ALL LOADED payments of
    its mmg_sequence regardless of payer group
    (AsMonitoringPaymentsDAOImpl.java:34-51 — the N+1 loop at
    LoadSwiftMessagesTasklet.java:43-53 becomes one join). ``pay_seq``
    is the stable in-message order; seq 1 is "the first payment"."""
    pays = payments.filter(F.col("mpy_status") == "LOADED").select(
        "mmg_sequence",
        F.col("mpy_instrid").alias("reference"),
        F.col("mpy_amount").alias("pay_amount"),
        F.col("mpy_payeraccount").alias("source_account"),
        F.col("mpy_benefaccount").alias("dest_account"),
    )
    mp = msgs.select("msg_uid", "message_id", "customer_id", "mmg_sequence").join(
        pays, "mmg_sequence", "inner"
    )
    w = Window.partitionBy("msg_uid").orderBy(
        F.col("reference").asc_nulls_last(),
        F.col("pay_amount").asc_nulls_last(),
        F.col("source_account").asc_nulls_last(),
        F.col("dest_account").asc_nulls_last(),
    )
    return mp.withColumn("pay_seq", F.row_number().over(w))


def candidate_batches(
    msg_pays: DataFrame,
    bp_batch: DataFrame,
    bp_trx: DataFrame,
    ref_date: datetime.date,
) -> DataFrame:
    """S3/S4 decorrelated: batch candidates per message row
    (BpBatchDAOImpl.java:34-75, loop at LoadJpatBatchesTasklet.java:55-95).

    Keys on (customer_id, first-payment reference); date window is
    ref_date − 2 months at start of day (LoadJpatBatchesTasklet.java:89).
    TOTALAMOUNT is the decorrelated per-batch SUM over ALL its
    transactions (J4). ``batch_seq``/``n_batches`` give the stable
    "first batch" and the duplicate-batch count."""
    search_from = datetime.datetime.combine(
        _minus_months(ref_date, 2), datetime.time.min
    )
    first_pay = msg_pays.filter(
        (F.col("pay_seq") == 1) & F.col("reference").isNotNull()
    ).select("msg_uid", "customer_id", F.col("reference").alias("first_reference"))

    b = bp_batch.filter(
        (F.col("batloadtype") == 3)
        & (~F.col("batstatus").isin(4, 8, 1024, 2048))
        & (F.col("batcreationdate") >= F.lit(search_from))
    ).select("uuid", "batname", "customer")

    refs = bp_trx.select(
        F.col("batch").alias("r_batch"), F.col("btrreference").alias("r_ref")
    ).distinct()
    totals = bp_trx.groupBy(F.col("batch").alias("t_batch")).agg(
        F.sum("btramount").alias("totalamount")
    )

    # EXISTS(trx with reference) — the t_ref join collapsed by GROUP BY
    # in the reference SQL (J2); the t_all self-join (J3) is a no-op row
    # multiplier and is dropped.
    cand = (
        first_pay.join(
            b, first_pay["customer_id"] == b["customer"], "inner"
        )
        .join(
            refs,
            (F.col("uuid") == F.col("r_batch"))
            & (F.col("first_reference") == F.col("r_ref")),
            "left_semi",
        )
        .join(totals, F.col("uuid") == F.col("t_batch"), "left")
        .select("msg_uid", "uuid", "batname", "totalamount")
    )
    w = Window.partitionBy("msg_uid").orderBy(F.col("uuid").asc_nulls_last())
    wc = Window.partitionBy("msg_uid")
    return cand.withColumn("batch_seq", F.row_number().over(w)).withColumn(
        "n_batches", F.count(F.lit(1)).over(wc)
    )


def _minus_months(d: datetime.date, months: int) -> datetime.date:
    # LocalDate.minusMonths semantics: clamp day to month end.
    y, m = d.year, d.month - months
    while m <= 0:
        m += 12
        y -= 1
    import calendar

    day = min(d.day, calendar.monthrange(y, m)[1])
    return datetime.date(y, m, day)


def reconcile_transactions(msg_pays: DataFrame, cand_trx: DataFrame) -> DataFrame:
    """J6/J7/J8 + W1: the core match, classification, and residues.

    ``cand_trx`` = transactions of each message's candidate batches,
    carrying (msg_uid, message_id, trx_rid, btr*). Equi-join on the
    4-column predicate (null-safe strings + numeric decimal); per-payment
    match count/index decide OK vs TRANSACCION DUPLICADA JPAT i
    (ReconciliationService.java:123-152); anti-joins give NO EN JPAT /
    NO EN SWIFT (":130-135", ":154-171"). Unmatched-side fields default
    to '' / 0 like ReconciliationTransactionResult.java:10-21."""
    p = msg_pays.alias("p")
    t = cand_trx.alias("t")
    matched = p.join(
        t,
        (F.col("p.msg_uid") == F.col("t.msg_uid"))
        & F.col("t.btrreference").eqNullSafe(F.col("p.reference"))
        & F.col("t.btrsourceaccount").eqNullSafe(F.col("p.source_account"))
        & F.col("t.btrdestaccount").eqNullSafe(F.col("p.dest_account"))
        & (F.col("t.btramount") == F.col("p.pay_amount")),
        "inner",
    )
    wk = Window.partitionBy("p.msg_uid", "p.pay_seq")
    wo = wk.orderBy(F.col("t.batch_uuid").asc(), F.col("t.trx_rid").asc())
    matched = (
        matched.withColumn("k", F.count(F.lit(1)).over(wk))
        .withColumn("i", F.row_number().over(wo))
        .select(
            F.col("p.msg_uid").alias("msg_uid"),
            F.col("p.message_id").alias("swift_id"),
            F.col("p.reference").alias("swift_reference"),
            F.col("p.pay_amount").alias("swift_amount"),
            F.col("p.source_account").alias("swift_source_account"),
            F.col("p.dest_account").alias("swift_dest_account"),
            F.col("t.btrreference").alias("jpat_reference"),
            F.col("t.btramount").alias("jpat_amount"),
            F.col("t.btrsourceaccount").alias("jpat_source_account"),
            F.col("t.btrdestaccount").alias("jpat_dest_account"),
            F.when(
                F.col("k") > 1,
                F.concat(F.lit(STATUS_DUPLICATE_TRANSACTION_JPAT), F.col("i")),
            )
            .otherwise(F.lit(STATUS_SUCCESS))
            .alias("status"),
            F.col("p.pay_seq").alias("pay_seq"),
            F.col("t.batch_uuid").alias("m_batch"),
            F.col("t.trx_rid").alias("m_rid"),
        )
    )

    zero = F.lit("0").cast("decimal(38,6)")
    not_in_jpat = (
        msg_pays.alias("p")
        .join(
            matched.select("msg_uid", "pay_seq").distinct().alias("m"),
            (F.col("p.msg_uid") == F.col("m.msg_uid"))
            & (F.col("p.pay_seq") == F.col("m.pay_seq")),
            "left_anti",
        )
        .select(
            F.col("msg_uid"),
            F.col("message_id").alias("swift_id"),
            F.col("reference").alias("swift_reference"),
            F.col("pay_amount").alias("swift_amount"),
            F.col("source_account").alias("swift_source_account"),
            F.col("dest_account").alias("swift_dest_account"),
            F.lit("").alias("jpat_reference"),
            zero.alias("jpat_amount"),
            F.lit("").alias("jpat_source_account"),
            F.lit("").alias("jpat_dest_account"),
            F.lit(STATUS_NOT_IN_JPAT).alias("status"),
        )
    )

    not_in_swift = (
        cand_trx.alias("t")
        .join(
            matched.select("msg_uid", "m_batch", "m_rid").distinct().alias("m"),
            (F.col("t.msg_uid") == F.col("m.msg_uid"))
            & (F.col("t.batch_uuid") == F.col("m.m_batch"))
            & (F.col("t.trx_rid") == F.col("m.m_rid")),
            "left_anti",
        )
        .select(
            F.col("msg_uid"),
            F.col("message_id").alias("swift_id"),
            F.lit("").alias("swift_reference"),
            zero.alias("swift_amount"),
            F.lit("").alias("swift_source_account"),
            F.lit("").alias("swift_dest_account"),
            F.col("btrreference").alias("jpat_reference"),
            F.col("btramount").alias("jpat_amount"),
            F.col("btrsourceaccount").alias("jpat_source_account"),
            F.col("btrdestaccount").alias("jpat_dest_account"),
            F.lit(STATUS_NOT_IN_SWIFT).alias("status"),
        )
    )

    out_cols = [
        "msg_uid", "swift_id", "swift_reference", "swift_amount",
        "swift_source_account", "swift_dest_account", "jpat_reference",
        "jpat_amount", "jpat_source_account", "jpat_dest_account", "status",
    ]
    return (
        matched.select(out_cols)
        .unionByName(not_in_jpat.select(out_cols))
        .unionByName(not_in_swift.select(out_cols))
    )


def reconcile_batches(
    msgs: DataFrame, cand: DataFrame, trx_results: DataFrame
) -> DataFrame:
    """A6/A7: batch-level rollup with the precedence chain of
    determineBatchStatus (ReconciliationService.java:194-201):
    no batches → ERROR; >1 → LOTE DUPLICADO JPAT; any non-OK transaction
    row → TRANSACCIONES CON ERROR; amounts unequal (null-safe, exact
    decimal) → DIFERENCIA EN VALOR; else OK. Fields come from the first
    batch only (ReconciliationService.java:63)."""
    firsts = cand.filter(F.col("batch_seq") == 1).select(
        "msg_uid",
        F.col("batname").alias("file_name"),
        F.col("totalamount").alias("amount_jpat"),
        "n_batches",
    )
    errs = trx_results.groupBy("msg_uid").agg(
        F.max(
            F.when(F.col("status") != STATUS_SUCCESS, 1).otherwise(0)
        ).alias("any_err")
    )
    j = (
        msgs.join(firsts, "msg_uid", "left")
        .join(errs, "msg_uid", "left")
        .withColumn("n_batches", F.coalesce(F.col("n_batches"), F.lit(0)))
        .withColumn("any_err", F.coalesce(F.col("any_err"), F.lit(0)))
    )
    status = (
        F.when(F.col("n_batches") == 0, F.lit(STATUS_ERROR))
        .when(F.col("n_batches") > 1, F.lit(STATUS_DUPLICATE_BATCH_JPAT))
        .when(F.col("any_err") == 1, F.lit(STATUS_TRANSACTIONS_WITH_ERROR))
        .when(
            ~F.col("amount").eqNullSafe(F.col("amount_jpat")),
            F.lit(STATUS_VALUE_MISMATCH),
        )
        .otherwise(F.lit(STATUS_SUCCESS))
    )
    return j.select(
        "msg_uid",
        F.col("message_id").alias("swift_id"),
        F.col("customer_id").alias("customer_nit"),
        F.col("file_name"),
        F.col("fecha_cargue").alias("loading_time"),
        F.col("fecha_aplicacion").alias("application_date"),
        F.col("amount").alias("amount_swift"),
        F.col("amount_jpat"),
        status.alias("status"),
    )


def reconcile_swift_jpat(
    mensajes: DataFrame,
    payments: DataFrame,
    bp_batch: DataFrame,
    bp_trx: DataFrame,
    lower_bound,
    ref_date: datetime.date,
) -> tuple[DataFrame, DataFrame]:
    """Full pipeline → (transaction_results, batch_results).

    One Catalyst plan per output: the reference's N+1 JDBC loops and
    O(P×T) nested-loop scans (SURVEY §4.1) become set-oriented joins the
    optimizer can broadcast/shuffle as sizes dictate."""
    msgs = extract_messages(mensajes, payments, lower_bound)
    mpays = message_payments(msgs, payments)
    cand = candidate_batches(mpays, bp_batch, bp_trx, ref_date)

    # Deterministic per-batch row identity for transactions (object
    # identity in the reference — duplicates stay distinct).
    wt = Window.partitionBy("batch").orderBy(
        F.col("uuid").asc_nulls_last(),
        F.col("btrreference").asc_nulls_last(),
        F.col("btramount").asc_nulls_last(),
        F.col("btrsourceaccount").asc_nulls_last(),
        F.col("btrdestaccount").asc_nulls_last(),
    )
    trx = bp_trx.withColumn("trx_rid", F.row_number().over(wt))
    cand_trx = (
        cand.select("msg_uid", F.col("uuid").alias("batch_uuid"))
        .join(trx, F.col("batch_uuid") == trx["batch"], "inner")
        .join(
            msgs.select("msg_uid", "message_id"), "msg_uid", "inner"
        )
        .select(
            "msg_uid", "message_id", "batch_uuid", "trx_rid",
            "btrreference", "btramount", "btrsourceaccount", "btrdestaccount",
        )
    )

    trx_results = reconcile_transactions(mpays, cand_trx)
    batch_results = reconcile_batches(msgs, cand, trx_results)
    return trx_results, batch_results
