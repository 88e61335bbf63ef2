"""Pure-Python oracle: a literal single-threaded reimplementation of the
reference's reconciliation semantics (SURVEY §1.4), used to assert the
Spark engine's parity. Mirrors, step by step:

* the SWIFT extract SQL (AsMonitoringMessagesDAOImpl.java:31-64):
  filter + inner join (ALL payment statuses) + group-by + SUM,
  date-truncating mapper;
* the per-message LOADED payments list (AsMonitoringPaymentsDAOImpl);
* the JPAT batch lookup (BpBatchDAOImpl.java:34-75 +
  LoadJpatBatchesTasklet.java:68-95): customer/reference equality
  (nulls never match), date window, loadtype/status filters,
  decorrelated TOTALAMOUNT;
* the match loops (ReconciliationService.java:107-171) with
  many-to-many matching, per-payment duplicate indexing, object-identity
  "used" tracking;
* the batch status precedence chain (ReconciliationService.java:194-201).

Where the reference is order-nondeterministic (DB return order), this
oracle uses the SAME stable orders as the engine (documented in
operators/refrecon.py): payments by (reference, amount, source, dest)
nulls-last; batches by uuid; transactions by
(uuid, reference, amount, source, dest) nulls-last within batch.

Amounts are decimal.Decimal quantized to 6dp (the engine's
DecimalType(38,6) normalization — SURVEY §1.4(1)).
"""

from __future__ import annotations

import datetime
from decimal import Decimal

Q6 = Decimal("0.000001")


def q(x) -> Decimal | None:
    if x is None:
        return None
    return Decimal(str(x)).quantize(Q6)


def _nl(x):  # nulls-last sort key
    return (x is None, x)


def _minus_months(d: datetime.date, months: int) -> datetime.date:
    import calendar

    y, m = d.year, d.month - months
    while m <= 0:
        m += 12
        y -= 1
    return datetime.date(y, m, min(d.day, calendar.monthrange(y, m)[1]))


def pyref_reconcile(mensajes, payments, bp_batch, bp_trx, lower_bound, ref_date):
    """rows = lists of dicts with the FIXTURES.md §A column names.
    Returns (transaction_results, batch_results) as lists of dicts with
    the engine's output column names (operators/refrecon.py)."""

    # ---- Step 1: SWIFT extract (messages) ----
    msgs_f = [
        m
        for m in mensajes
        if m["mmg_loadingtime"] is not None
        and m["mmg_loadingtime"] >= lower_bound
        and m["mmg_msgtype"] == "MT101"
        and m["mmg_status"] == "LOADED"
    ]
    pay_by_seq: dict = {}
    for p in payments:
        pay_by_seq.setdefault(p["mmg_sequence"], []).append(p)

    groups: dict = {}
    for m in msgs_f:
        for p in pay_by_seq.get(m["mmg_sequence"], []):
            key = (
                m["mmg_sequence"],
                p["mpy_payerid"],
                m["mmg_loadingtime"],
                p["mpy_paymentdate"],
            )
            groups.setdefault(key, []).append(q(p["mpy_amount"]))

    messages = []
    for (seq, payer, lt, pd_), amts in groups.items():
        nn = [a for a in amts if a is not None]
        amount = sum(nn, Decimal(0)) if nn else None  # SQL SUM: null-ignoring
        loaded = [
            {
                "reference": p["mpy_instrid"],
                "amount": q(p["mpy_amount"]),
                "source": p["mpy_payeraccount"],
                "dest": p["mpy_benefaccount"],
            }
            for p in pay_by_seq.get(seq, [])
            if p["mpy_status"] == "LOADED"
        ]
        loaded.sort(
            key=lambda p: (
                _nl(p["reference"]),
                _nl(p["amount"]),
                _nl(p["source"]),
                _nl(p["dest"]),
            )
        )
        messages.append(
            {
                "message_id": seq,
                "customer_id": payer,
                "fecha_cargue": lt.date() if lt else None,
                "fecha_aplicacion": pd_,
                "amount": q(amount) if amount is not None else None,
                "payments": loaded,
            }
        )

    # ---- Step 2: JPAT batch lookup per message ----
    search_from = datetime.datetime.combine(
        _minus_months(ref_date, 2), datetime.time.min
    )
    trx_by_batch: dict = {}
    for t in bp_trx:
        trx_by_batch.setdefault(t["batch"], []).append(t)
    batch_total = {}
    for b, ts in trx_by_batch.items():
        nn = [q(t["btramount"]) for t in ts if t["btramount"] is not None]
        batch_total[b] = sum(nn, Decimal(0)) if nn else None  # SQL SUM

    def find_batches(customer, reference):
        if customer is None or reference is None:
            return []
        out = []
        for b in bp_batch:
            if (
                b["customer"] == customer
                and b["batcreationdate"] is not None
                and b["batcreationdate"] >= search_from
                and b["batloadtype"] == 3
                and b["batstatus"] not in (4, 8, 1024, 2048)
                and any(
                    t["btrreference"] == reference
                    for t in trx_by_batch.get(b["uuid"], [])
                )
            ):
                total = batch_total.get(b["uuid"])
                out.append(
                    {
                        "uuid": b["uuid"],
                        "batname": b["batname"],
                        "totalamount": q(total) if total is not None else None,
                        "transactions": sorted(
                            trx_by_batch.get(b["uuid"], []),
                            key=lambda t: (
                                _nl(t["uuid"]),
                                _nl(t["btrreference"]),
                                _nl(q(t["btramount"])),
                                _nl(t["btrsourceaccount"]),
                                _nl(t["btrdestaccount"]),
                            ),
                        ),
                    }
                )
        out.sort(key=lambda b: _nl(b["uuid"]))
        return out

    # ---- Step 3+4: reconciliation loops ----
    trx_results, batch_results = [], []
    ZERO = Decimal("0").quantize(Q6)

    for msg in messages:
        pays = msg["payments"]
        first_ref = pays[0]["reference"] if pays else None
        batches = find_batches(msg["customer_id"], first_ref) if pays else []

        jpat_trx = []  # (batch_uuid, rid, trx) — object identity via (uuid,rid)
        for b in batches:
            for rid, t in enumerate(b["transactions"], start=1):
                jpat_trx.append((b["uuid"], rid, t))

        used = {(bu, rid): False for bu, rid, _ in jpat_trx}
        msg_trx_results = []

        for p in pays:
            matches = [
                (bu, rid, t)
                for bu, rid, t in jpat_trx
                if t["btrreference"] == p["reference"]
                and t["btrsourceaccount"] == p["source"]
                and t["btrdestaccount"] == p["dest"]
                and q(t["btramount"]) is not None
                and p["amount"] is not None
                and q(t["btramount"]) == p["amount"]
            ]
            if not matches:
                msg_trx_results.append(
                    {
                        "swift_id": msg["message_id"],
                        "swift_reference": p["reference"],
                        "swift_amount": p["amount"],
                        "swift_source_account": p["source"],
                        "swift_dest_account": p["dest"],
                        "jpat_reference": "",
                        "jpat_amount": ZERO,
                        "jpat_source_account": "",
                        "jpat_dest_account": "",
                        "status": "NO EN JPAT",
                    }
                )
                continue
            for i, (bu, rid, t) in enumerate(matches, start=1):
                status = (
                    f"TRANSACCION DUPLICADA JPAT {i}" if len(matches) > 1 else "OK"
                )
                msg_trx_results.append(
                    {
                        "swift_id": msg["message_id"],
                        "swift_reference": p["reference"],
                        "swift_amount": p["amount"],
                        "swift_source_account": p["source"],
                        "swift_dest_account": p["dest"],
                        "jpat_reference": t["btrreference"],
                        "jpat_amount": q(t["btramount"]),
                        "jpat_source_account": t["btrsourceaccount"],
                        "jpat_dest_account": t["btrdestaccount"],
                        "status": status,
                    }
                )
                used[(bu, rid)] = True

        for bu, rid, t in jpat_trx:
            if not used[(bu, rid)]:
                msg_trx_results.append(
                    {
                        "swift_id": msg["message_id"],
                        "swift_reference": "",
                        "swift_amount": ZERO,
                        "swift_source_account": "",
                        "swift_dest_account": "",
                        "jpat_reference": t["btrreference"],
                        "jpat_amount": q(t["btramount"]),
                        "jpat_source_account": t["btrsourceaccount"],
                        "jpat_dest_account": t["btrdestaccount"],
                        "status": "NO EN SWIFT",
                    }
                )

        trx_results.extend(msg_trx_results)

        # batch status precedence (ReconciliationService.java:194-201)
        first = batches[0] if batches else None
        if not batches:
            status = "ERROR"
        elif len(batches) > 1:
            status = "LOTE DUPLICADO JPAT"
        elif any(t["status"] != "OK" for t in msg_trx_results):
            status = "TRANSACCIONES CON ERROR"
        elif msg["amount"] != (first["totalamount"] if first else None):
            status = "DIFERENCIA EN VALOR"
        else:
            status = "OK"
        batch_results.append(
            {
                "swift_id": msg["message_id"],
                "customer_nit": msg["customer_id"],
                "file_name": first["batname"] if first else None,
                "loading_time": msg["fecha_cargue"],
                "application_date": msg["fecha_aplicacion"],
                "amount_swift": msg["amount"],
                "amount_jpat": first["totalamount"] if first else None,
                "status": status,
            }
        )

    return trx_results, batch_results
