"""Deterministic SWIFT/JPAT-shaped fixture generator (FIXTURES.md §A).

Exercises every §A5 invariant: 0/1/>1 batches per message; payments with
0/1/k>1 matching transactions; transactions matching no payment; one
transaction matching two payments (many-to-many); batch totals equal vs
unequal; scale-only amount differences; null strings in match keys;
one mmg_sequence with two payers/payment dates (duplicate messageId
rows); non-MT101 / non-LOADED / stale messages filtered out; batches
excluded by loadtype/status/date.
"""

from __future__ import annotations

import datetime
import random
from decimal import Decimal

LB = datetime.datetime(2026, 1, 23, 0, 0)  # lower bound (reference hard-codes one)
REF_DATE = datetime.date(2026, 8, 16)  # "now" for the 2-month window
IN_WINDOW = datetime.datetime(2026, 7, 1, 10, 0)
OLD = datetime.datetime(2025, 1, 1, 10, 0)


def gen_fixture(seed: int = 42, n_random_msgs: int = 40):
    rng = random.Random(seed)
    mensajes, payments, batches, trxs = [], [], [], []
    uid = [0]

    def nid(p):
        uid[0] += 1
        return f"{p}{uid[0]:05d}"

    def add_msg(seq, lt=None, msgtype="MT101", status="LOADED"):
        mensajes.append(
            {
                "mmg_sequence": seq,
                "mmg_loadingtime": lt or IN_WINDOW,
                "mmg_msgtype": msgtype,
                "mmg_status": status,
            }
        )

    def add_pay(seq, ref, amt, src, dst, payer, pdate=None, status="LOADED"):
        payments.append(
            {
                "mmg_sequence": seq,
                "mpy_instrid": ref,
                "mpy_amount": Decimal(str(amt)) if amt is not None else None,
                "mpy_payeraccount": src,
                "mpy_benefaccount": dst,
                "mpy_payerid": payer,
                "mpy_paymentdate": pdate or datetime.date(2026, 7, 2),
                "mpy_status": status,
            }
        )

    def add_batch(buuid, customer, name=None, cdate=None, loadtype=3, status=1):
        batches.append(
            {
                "uuid": buuid,
                "batname": name or f"file_{buuid}.txt",
                "customer": customer,
                "batcreationdate": cdate or IN_WINDOW,
                "batloadtype": loadtype,
                "batstatus": status,
            }
        )

    def add_trx(buuid, ref, amt, src, dst):
        trxs.append(
            {
                "uuid": nid("T"),
                "batch": buuid,
                "btramount": Decimal(str(amt)),
                "btrbankorigen": "B1",
                "bank": "B2",
                "btrdestaccount": dst,
                "btrsourceaccount": src,
                "btrreference": ref,
            }
        )

    # ---- handcrafted edge cases -------------------------------------
    # 1) clean OK message: 1 batch, all payments match, totals equal
    add_msg("M_OK")
    add_pay("M_OK", "R_OK_1", "100.50", "S1", "D1", "C1")
    add_pay("M_OK", "R_OK_2", "200.25", "S2", "D2", "C1")
    add_batch("B_OK", "C1")
    add_trx("B_OK", "R_OK_1", "100.50", "S1", "D1")
    add_trx("B_OK", "R_OK_2", "200.25", "S2", "D2")

    # 2) no batches → ERROR + NO EN JPAT rows
    add_msg("M_NOB")
    add_pay("M_NOB", "R_NOB", "50", "S1", "D1", "C2")

    # 3) duplicate batches → LOTE DUPLICADO JPAT
    add_msg("M_DUPB")
    add_pay("M_DUPB", "R_DUPB", "10", "S1", "D1", "C3")
    add_batch("B_DUPB1", "C3")
    add_trx("B_DUPB1", "R_DUPB", "10", "S1", "D1")
    add_batch("B_DUPB2", "C3")
    add_trx("B_DUPB2", "R_DUPB", "10", "S1", "D1")

    # 4) payment matching k=2 identical trx → TRANSACCION DUPLICADA 1,2
    add_msg("M_DUPT")
    add_pay("M_DUPT", "R_DUPT", "77", "S1", "D1", "C4")
    add_batch("B_DUPT", "C4")
    add_trx("B_DUPT", "R_DUPT", "77", "S1", "D1")
    add_trx("B_DUPT", "R_DUPT", "77", "S1", "D1")

    # 5) unmatched JPAT trx → NO EN SWIFT (+ batch TRANSACCIONES CON ERROR)
    add_msg("M_EXTRA")
    add_pay("M_EXTRA", "R_EXTRA", "5", "S1", "D1", "C5")
    add_batch("B_EXTRA", "C5")
    add_trx("B_EXTRA", "R_EXTRA", "5", "S1", "D1")
    add_trx("B_EXTRA", "R_ORPHAN", "9", "S9", "D9")

    # 6) two payments matching the SAME trx (many-to-many)
    add_msg("M_M2M")
    add_pay("M_M2M", "R_M2M", "33", "S1", "D1", "C6")
    add_pay("M_M2M", "R_M2M", "33", "S1", "D1", "C6")
    add_batch("B_M2M", "C6")
    add_trx("B_M2M", "R_M2M", "33", "S1", "D1")

    # 7) totals unequal → DIFERENCIA EN VALOR (all trx match, amount sums differ
    #    because one payment is non-LOADED: in SUM but not in the list)
    add_msg("M_VAL")
    add_pay("M_VAL", "R_VAL", "40", "S1", "D1", "C7")
    add_pay("M_VAL", "R_VAL_X", "60", "S2", "D2", "C7", status="REJECTED")
    add_batch("B_VAL", "C7")
    add_trx("B_VAL", "R_VAL", "40", "S1", "D1")

    # 8) scale-only amount difference: 100.0 vs 100.00 → equal under the
    #    engine's decimal(38,6) policy
    add_msg("M_SCALE")
    add_pay("M_SCALE", "R_SCALE", "100.0", "S1", "D1", "C8")
    add_batch("B_SCALE", "C8")
    add_trx("B_SCALE", "R_SCALE", "100.00", "S1", "D1")

    # 9) null strings in match keys (null-safe equality: null == null matches)
    add_msg("M_NULLK")
    add_pay("M_NULLK", "R_NULLK", "15", None, "D1", "C9")
    add_batch("B_NULLK", "C9")
    add_trx("B_NULLK", "R_NULLK", "15", None, "D1")

    # 10) one mmg_sequence, two payers and two dates → multiple message rows
    add_msg("M_MULTI")
    add_pay("M_MULTI", "R_MUL_1", "11", "S1", "D1", "CA", datetime.date(2026, 7, 2))
    add_pay("M_MULTI", "R_MUL_2", "22", "S2", "D2", "CB", datetime.date(2026, 7, 3))
    add_batch("B_MULTI", "CA")
    add_trx("B_MULTI", "R_MUL_1", "11", "S1", "D1")
    add_trx("B_MULTI", "R_MUL_2", "22", "S2", "D2")

    # 11) filtered-out messages: wrong type / status / too old
    add_msg("M_FILT1", msgtype="MT103")
    add_pay("M_FILT1", "R_F1", "1", "S", "D", "CF")
    add_msg("M_FILT2", status="PENDING")
    add_pay("M_FILT2", "R_F2", "1", "S", "D", "CF")
    add_msg("M_FILT3", lt=datetime.datetime(2025, 1, 1))
    add_pay("M_FILT3", "R_F3", "1", "S", "D", "CF")

    # 12) batches excluded by loadtype / status / stale date
    add_msg("M_EXCL")
    add_pay("M_EXCL", "R_EXCL", "8", "S1", "D1", "CE")
    add_batch("B_EXCL1", "CE", loadtype=1)
    add_trx("B_EXCL1", "R_EXCL", "8", "S1", "D1")
    add_batch("B_EXCL2", "CE", status=1024)
    add_trx("B_EXCL2", "R_EXCL", "8", "S1", "D1")
    add_batch("B_EXCL3", "CE", cdate=OLD)
    add_trx("B_EXCL3", "R_EXCL", "8", "S1", "D1")

    # 13) payments all non-LOADED → message row with empty payment list → ERROR
    add_msg("M_NOPAY")
    add_pay("M_NOPAY", "R_NP", "3", "S1", "D1", "CN", status="REJECTED")

    # ---- randomized bulk (seeded) ------------------------------------
    for i in range(n_random_msgs):
        seq = f"M_R{i:04d}"
        payer = f"CR{rng.randrange(8)}"
        add_msg(seq)
        n_pay = rng.randrange(1, 4)
        refs = []
        for j in range(n_pay):
            ref = f"RR{rng.randrange(60):03d}"
            refs.append(ref)
            add_pay(
                seq,
                ref,
                f"{rng.randrange(1, 500)}.{rng.randrange(100):02d}",
                f"S{rng.randrange(5)}" if rng.random() > 0.1 else None,
                f"D{rng.randrange(5)}",
                payer,
                datetime.date(2026, 7, rng.randrange(1, 28)),
                "LOADED" if rng.random() > 0.15 else "REJECTED",
            )
        if rng.random() > 0.3:
            bu = f"B_R{i:04d}"
            add_batch(bu, payer, status=rng.choice([1, 2, 1, 1, 2048]))
            for ref in refs:
                if rng.random() > 0.25:
                    add_trx(
                        bu,
                        ref,
                        f"{rng.randrange(1, 500)}.{rng.randrange(100):02d}",
                        f"S{rng.randrange(5)}" if rng.random() > 0.1 else None,
                        f"D{rng.randrange(5)}",
                    )
            if rng.random() > 0.8:
                add_trx(bu, f"RX{i}", "999", "SX", "DX")

    return mensajes, payments, batches, trxs
