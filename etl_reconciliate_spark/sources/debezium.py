"""Debezium-envelope source adapter: JSON change events → canonical log.

A real deployment's binlog/WAL tail usually arrives as Debezium-style
JSON envelopes (Kafka topic or archived JSONL):

    {"payload": {"before": {...}, "after": {...},
                 "source": {"lsn": 123, ...}, "op": "c|u|d|r",
                 "ts_ms": 1767225600000}}

(with ``schemas.enable`` the envelope is wrapped under ``payload``;
without it the same fields sit at the root — both shapes are accepted).

``parse_debezium`` maps envelopes to the engine's canonical
CHANGELOG_SCHEMA entirely with native ``from_json`` / conditional
column algebra (JVM-side, no UDF):

* op: c (create) / r (snapshot read) → I,  u → U,  d → D;
* row image: ``after`` for I/U, ``before`` for D (keys only — payload
  columns are nulled, matching the canonical delete shape);
* lsn: ``source.lsn``;  ts: the row's own ``ts`` for I/U, the
  envelope's ``ts_ms`` for D.

The transformation is batch/stream polymorphic: feed it
``spark.read.text`` (archived JSONL) or ``spark.readStream`` (live
topic) and pipe the result into the same dedup → merge pipeline.

reference: the reference app polls its source DBs via JDBC
(config/datasource/SwiftDatasourceConfig.java:16-25); this adapter is
the engine's log-based CDC counterpart of that ingest seam.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F, types as T

from etl_reconciliate_spark.schemas import CHANGELOG_SCHEMA

_ROW = T.StructType(
    [f for f in CHANGELOG_SCHEMA.fields if f.name not in ("lsn", "op")]
)
_ENVELOPE = T.StructType(
    [
        T.StructField("before", _ROW, True),
        T.StructField("after", _ROW, True),
        T.StructField(
            "source", T.StructType([T.StructField("lsn", T.LongType(), True)]), True
        ),
        T.StructField("op", T.StringType(), True),
        T.StructField("ts_ms", T.LongType(), True),
    ]
)
_WRAPPED = T.StructType([T.StructField("payload", _ENVELOPE, True)])


def _envelope(value: Column) -> Column:
    """Parse either the schemas.enable-wrapped or the plain envelope:
    the wrapped parse yields a null ``payload`` for plain input, so
    coalesce picks whichever shape the line actually has."""
    return F.coalesce(
        F.from_json(value, _WRAPPED)["payload"], F.from_json(value, _ENVELOPE)
    )


def parse_debezium(df: DataFrame, value_col: str = "value") -> DataFrame:
    """JSON envelope strings in ``value_col`` → canonical changelog rows
    (CHANGELOG_SCHEMA order). Envelopes with an unknown ``op`` or no
    LSN are dropped (tombstone/heartbeat records), as are rows whose
    key columns come out null — notably delete envelopes with a null
    ``before`` image, which is Debezium's default when the source table
    lacks REPLICA IDENTITY FULL: such deletes carry no key, cannot be
    applied, and would otherwise flow null-key junk into dedup/merge
    (CHANGELOG_SCHEMA declares the keys non-null)."""
    p = _envelope(F.col(value_col))
    op = (
        F.when(p["op"].isin("c", "r"), F.lit("I"))
        .when(p["op"] == "u", F.lit("U"))
        .when(p["op"] == "d", F.lit("D"))
    )
    row = F.when(p["op"] == "d", p["before"]).otherwise(p["after"])
    is_del = op == "D"
    nul = lambda c: F.when(is_del, F.lit(None)).otherwise(c)  # noqa: E731
    out = df.select(
        p["source"]["lsn"].alias("lsn"),
        op.alias("op"),
        row["conv_id"].alias("conv_id"),
        row["turn_idx"].alias("turn_idx"),
        nul(row["role"]).cast("string").alias("role"),
        nul(row["text"]).cast("string").alias("text"),
        nul(row["tool"]).cast("string").alias("tool"),
        F.when(is_del, F.timestamp_millis(p["ts_ms"]))
        .otherwise(row["ts"])
        .alias("ts"),
    )
    return out.filter(
        F.col("lsn").isNotNull()
        & F.col("op").isNotNull()
        & F.col("conv_id").isNotNull()
        & F.col("turn_idx").isNotNull()
    )


def read_debezium_jsonl(spark, path: str) -> DataFrame:
    """Archived Debezium JSONL → canonical changelog rows (batch)."""
    return parse_debezium(spark.read.text(path), "value")
