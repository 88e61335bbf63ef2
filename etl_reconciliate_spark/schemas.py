"""Canonical StructTypes for the engine.

Input shape is fixed by the spec (BASELINE.json:15): an Iceberg table of
multi-turn conversation / agent transcripts
``(conv_id string, turn_idx int, role string, text string, tool string,
ts timestamp)`` keyed on (conv_id, turn_idx), plus an LSN-ordered
change log over it.

Decimal policy (SURVEY.md §1.4(1)): the reference mixes scale-sensitive
and scale-insensitive BigDecimal equality
(reference: service/ReconciliationService.java:151 vs :199). We normalize
every monetary amount to one DecimalType(38, 6) so numeric and
scale-sensitive equality coincide.
"""

from __future__ import annotations

from pyspark.sql import types as T

# ---------------------------------------------------------------- keys
KEY_COLS = ["conv_id", "turn_idx"]
LSN_COL = "lsn"
META_LSN = "_lsn"  # per-row last-applied LSN kept in the target for idempotent MERGE

# ---------------------------------------------------- transcripts (target)
TRANSCRIPTS_FIELDS = [
    T.StructField("conv_id", T.StringType(), False),
    T.StructField("turn_idx", T.IntegerType(), False),
    T.StructField("role", T.StringType(), True),
    T.StructField("text", T.StringType(), True),
    T.StructField("tool", T.StringType(), True),
    T.StructField("ts", T.TimestampType(), True),
]
TRANSCRIPTS_SCHEMA = T.StructType(TRANSCRIPTS_FIELDS)

# Schema of the earliest epoch, before the `tool` column exists — the
# schema-evolution case (BASELINE.json:6: "added columns like tool
# propagated to the Iceberg schema").
TRANSCRIPTS_SCHEMA_V0 = T.StructType(
    [f for f in TRANSCRIPTS_FIELDS if f.name != "tool"]
)

# ------------------------------------------------------------ change log
# binlog/WAL-style feed: op in {I, U, D}; payload columns null for D.
CHANGELOG_SCHEMA = T.StructType(
    [
        T.StructField("lsn", T.LongType(), False),
        T.StructField("op", T.StringType(), False),
        T.StructField("conv_id", T.StringType(), False),
        T.StructField("turn_idx", T.IntegerType(), False),
        T.StructField("role", T.StringType(), True),
        T.StructField("text", T.StringType(), True),
        T.StructField("tool", T.StringType(), True),
        T.StructField("ts", T.TimestampType(), True),
    ]
)
CHANGELOG_SCHEMA_V0 = T.StructType(
    [f for f in CHANGELOG_SCHEMA.fields if f.name != "tool"]
)

# ------------------------------------------------------- recon results
# Statuses are the renamed classification of the reference
# (reference: service/ReconciliationService.java:23-29 —
#  OK / NO EN JPAT / NO EN SWIFT / DIFERENCIA EN VALOR).
STATUS_MATCH = "MATCH"
STATUS_SOURCE_ONLY = "SOURCE_ONLY"
STATUS_TARGET_ONLY = "TARGET_ONLY"
STATUS_VALUE_DISCREPANCY = "VALUE_DISCREPANCY"

RECON_RESULT_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType(), True),
        T.StructField("turn_idx", T.IntegerType(), True),
        T.StructField("status", T.StringType(), False),
        T.StructField("src_text", T.StringType(), True),
        T.StructField("tgt_text", T.StringType(), True),
    ]
)

# ------------------------------------------- reference-shaped (parity)
# SWIFT/JPAT fixtures for the reference-parity reconciler
# (operators.refrecon). Shapes from FIXTURES.md §A, reconstructed from
# the reference's SQL and row mappers.
DEC = T.DecimalType(38, 6)

MENSAJES_SCHEMA = T.StructType(
    [
        T.StructField("mmg_sequence", T.StringType(), True),
        T.StructField("mmg_loadingtime", T.TimestampType(), True),
        T.StructField("mmg_msgtype", T.StringType(), True),
        T.StructField("mmg_status", T.StringType(), True),
    ]
)

PAYMENTS_SCHEMA = T.StructType(
    [
        T.StructField("mmg_sequence", T.StringType(), True),
        T.StructField("mpy_instrid", T.StringType(), True),
        T.StructField("mpy_amount", DEC, True),
        T.StructField("mpy_payeraccount", T.StringType(), True),
        T.StructField("mpy_benefaccount", T.StringType(), True),
        T.StructField("mpy_payerid", T.StringType(), True),
        T.StructField("mpy_paymentdate", T.DateType(), True),
        T.StructField("mpy_status", T.StringType(), True),
    ]
)

BP_BATCH_SCHEMA = T.StructType(
    [
        T.StructField("uuid", T.StringType(), True),
        T.StructField("batname", T.StringType(), True),
        T.StructField("customer", T.StringType(), True),
        T.StructField("batcreationdate", T.TimestampType(), True),
        T.StructField("batloadtype", T.IntegerType(), True),
        T.StructField("batstatus", T.IntegerType(), True),
    ]
)

BP_BATCHTRANSACTION_SCHEMA = T.StructType(
    [
        T.StructField("uuid", T.StringType(), True),
        T.StructField("batch", T.StringType(), True),
        T.StructField("btramount", DEC, True),
        T.StructField("btrbankorigen", T.StringType(), True),
        T.StructField("bank", T.StringType(), True),
        T.StructField("btrdestaccount", T.StringType(), True),
        T.StructField("btrsourceaccount", T.StringType(), True),
        T.StructField("btrreference", T.StringType(), True),
    ]
)
