"""Reconciliation results sink + two-sheet report.

The reference's entire deliverable is a two-sheet Excel report of the
transaction-level and batch-level reconciliation results
(reference: service/ExcelReportService.java:53-82 — one sheet per result
set; :106,122-155 — header row, conditional fill for non-OK rows,
autofilter, autosize) mailed by ReportAndEmailTasklet.java:40-53. The
engine splits that contract scale-appropriately:

* :func:`write_result_table` — the DISTRIBUTED sink: every result row
  persisted as parquet, partitioned by ``status`` so the interesting
  (rare) discrepancy partitions prune to tiny scans at 100 TB. This is
  what downstream consumers read; row counts ride the write via
  ``Observation`` (no extra job).
* :func:`write_two_sheet_report` — the HUMAN artifact: a bounded,
  driver-side render of the result sets as (a) one CSV per sheet and
  (b) a single self-contained HTML file with header styling and
  conditional row fill — the xlsx feature set the reference uses,
  without an xlsx dependency (none ships in this environment). Row
  caps keep the driver safe; the full data lives in the parquet sink.
"""

from __future__ import annotations

import html
import os

from pyspark.sql import DataFrame, functions as F

OK_STATUSES = {"OK", "MATCH"}


def write_result_table(
    df: DataFrame,
    out_dir: str,
    partition_by: str | None = "status",
    codec: str = "zstd",
) -> int:
    """Persist a result set as parquet; returns the row count (measured
    by ``Observation`` on the write itself — no second pass)."""
    from pyspark.sql import Observation

    obs = Observation()
    observed = df.observe(obs, F.count(F.lit(1)).alias("n"))
    w = observed.write.option("compression", codec).mode("overwrite")
    partitioned = bool(partition_by and partition_by in df.columns)
    if partitioned:
        w = w.partitionBy(partition_by)
    w.parquet(out_dir)
    try:
        n = int(obs.get["n"] or 0)
    except Exception:
        # Observation failing usually means AQE eliminated the metric
        # node on an empty plan — but not always. Before declaring 0 (and,
        # below, OVERWRITING a partitioned result with an empty frame),
        # count what the write actually produced; a dir holding only
        # _SUCCESS has no schema-bearing file and the read itself raises,
        # which IS the genuinely-empty case (r4 advice: a non-empty write
        # whose Observation failed must not be erased and reported as 0).
        try:
            n = int(df.sparkSession.read.parquet(out_dir).count())
        except Exception:
            n = 0
    if n == 0 and partitioned:
        # a partitioned write of an EMPTY frame emits only _SUCCESS — no
        # schema-bearing file — and the next spark.read.parquet of the
        # dir fails to infer a schema; this is the HAPPY path of the
        # checksum recon strategy (zero discrepancies) with
        # --results-dir (r4 review). Rewrite the empty result
        # UNPARTITIONED (limit(0) short-circuits: no recompute of the
        # lineage): the partition column stays a normal empty data
        # column, so readers see the same schema either way. Checking
        # emptiness UP FRONT instead would either consume the
        # Observation or re-execute the full recon lineage for one row.
        df.limit(0).write.option("compression", codec).mode(
            "overwrite"
        ).parquet(out_dir)
    return n


def _sheet_rows(
    df: DataFrame, order_by: list[str] | None, max_rows: int
) -> tuple[list[str], list[tuple], bool]:
    """Driver-side bounded materialization of one sheet (sorting happens
    HERE, at the emission boundary, never inside the recon operators)."""
    if order_by:
        df = df.orderBy(*order_by)
    # fetch ONE extra row so "exactly max_rows results" is
    # distinguishable from a genuinely capped sheet (r4 review)
    rows = df.limit(max_rows + 1).collect()
    truncated = len(rows) > max_rows
    return df.columns, [tuple(r) for r in rows[:max_rows]], truncated


def _csv_cell(v) -> str:
    s = "" if v is None else str(v)
    if any(c in s for c in ',"\n\r'):
        s = '"' + s.replace('"', '""') + '"'
    return s


_HTML_HEAD = """<!doctype html><html><head><meta charset="utf-8">
<title>{title}</title><style>
body {{ font-family: sans-serif; margin: 1.5em; }}
table {{ border-collapse: collapse; margin: 1em 0 2em; }}
th {{ background: #1f3864; color: #fff; padding: 4px 10px;
     text-align: left; position: sticky; top: 0; }}
td {{ border: 1px solid #ccc; padding: 3px 10px; }}
tr.bad td {{ background: #ffd7d7; }}
caption {{ font-weight: bold; font-size: 1.1em; text-align: left;
           padding: 6px 0; }}
.note {{ color: #666; font-size: 0.85em; }}
</style></head><body><h1>{title}</h1>
"""


def write_two_sheet_report(
    sheets: dict[str, DataFrame],
    out_dir: str,
    title: str = "Reconciliation report",
    status_cols: tuple[str, ...] = ("status", "conv_status"),
    order_by: dict[str, list[str]] | None = None,
    max_rows_per_sheet: int = 50_000,
) -> dict:
    """Render ``sheets`` (name → small/filtered DataFrame) as one CSV per
    sheet plus ``report.html`` with conditional fill on rows whose first
    present ``status_cols`` column is non-OK (reference:
    ExcelReportService.java:122-155). Returns {sheet: rows_rendered}
    plus the artifact paths."""
    os.makedirs(out_dir, exist_ok=True)
    parts = [_HTML_HEAD.format(title=html.escape(title))]
    rendered: dict = {"html": os.path.join(out_dir, "report.html"), "sheets": {}}
    for name, df in sheets.items():
        ob = (order_by or {}).get(name)
        cols, rows, truncated = _sheet_rows(df, ob, max_rows_per_sheet)
        csv_path = os.path.join(out_dir, f"{name}.csv")
        with open(csv_path, "w") as f:
            f.write(",".join(_csv_cell(c) for c in cols) + "\n")
            for r in rows:
                f.write(",".join(_csv_cell(v) for v in r) + "\n")
        status_idx = next(
            (cols.index(c) for c in status_cols if c in cols), None
        )
        parts.append(f"<table><caption>{html.escape(name)}</caption>\n<tr>")
        parts.append("".join(f"<th>{html.escape(str(c))}</th>" for c in cols))
        parts.append("</tr>\n")
        for r in rows:
            bad = (
                status_idx is not None
                and r[status_idx] is not None
                and str(r[status_idx]) not in OK_STATUSES
            )
            cls = ' class="bad"' if bad else ""
            cells = "".join(
                f"<td>{html.escape('' if v is None else str(v))}</td>" for v in r
            )
            parts.append(f"<tr{cls}>{cells}</tr>\n")
        parts.append("</table>\n")
        if truncated:
            parts.append(
                f'<p class="note">{name}: capped at {max_rows_per_sheet} rows — '
                f"full result set lives in the parquet sink.</p>\n"
            )
        rendered["sheets"][name] = {"rows": len(rows), "csv": csv_path}
    parts.append("</body></html>\n")
    with open(rendered["html"], "w") as f:
        f.write("".join(parts))
    return rendered
