"""Single-pass column profiling + snapshot drift comparison.

The statistical layer of reconciliation: before (or instead of) any
row-level pass, compare the SHAPES of source and target — row counts,
null rates, distinct cardinalities, value ranges per column. At 100 TB
this is the first thing an operator actually runs: it is one scan per
side with a constant-size result, and a drifting column shows up here
long before a key-by-key audit can finish. (The reference has no
analog; its only health signal is the final match-count email —
service/ReconciliationService.java:194-201.)

Plan shape: ALL columns profile in ONE aggregation — Spark plans the
multi-column distinct counts with a single Expand-based pass (rows
multiply by the distinct-column count map-side; no per-column rescans),
and min/max/null counts ride the same aggregate. The wide 1-row result
is unpivoted to long format driver-side-free via ``stack``.

Values are profiled as strings for min/max (binary collation, portable
across engines); numeric drift detail belongs to the checksum/row
levels. Exact distincts (not approx_count_distinct) keep the operator
DuckDB-verifiable; at 100 TB swap in approx for the hot loop if the
expand pass dominates — same operator shape.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def column_profile(
    df: DataFrame,
    cols: list[str] | None = None,
    percentiles: tuple[float, float] | None = (0.5, 0.99),
    percentile_mode: str = "exact",
) -> DataFrame:
    """Long-format profile: (column, n_rows, n_null, n_distinct,
    min_str, max_str, p_lo, p_hi) — one row per profiled column, ONE
    pass.

    ``p_lo``/``p_hi`` (defaults: p50/p99) are distribution percentiles
    for NUMERIC columns (null otherwise) — min/max ranges miss
    interior distribution drift that a median/tail quantile catches
    (r4 verdict item 8). ``percentiles=None`` skips them entirely
    (typed-null output columns, zero aggregate cost).
    ``percentile_mode="exact"`` uses the exact ``percentile`` aggregate
    (continuous interpolation — DuckDB ``quantile_cont``-verifiable);
    ``"approx"`` swaps in ``percentile_approx`` (constant-memory
    sketch) — the right mode at 100 TB where an exact percentile would
    sort each column."""
    from pyspark.sql import types as T

    if percentile_mode not in ("exact", "approx"):
        raise ValueError(f"unknown percentile_mode: {percentile_mode!r}")
    pct = F.percentile if percentile_mode == "exact" else F.percentile_approx
    lo, hi = percentiles if percentiles is not None else (None, None)
    use = cols or df.columns
    aggs = [F.count(F.lit(1)).alias("_n")]
    # POSITIONAL intermediate aliases (_null_0, ...) — embedding the raw
    # column name both as an identifier and inside the stack() literal
    # broke on any legal-but-non-identifier name ("a b", quotes — r4
    # review); the index is always a clean identifier, and the display
    # name only ever appears as an escaped string literal.
    for i, c in enumerate(use):
        s = F.col(c).cast("string")
        numeric = (
            percentiles is not None
            and isinstance(df.schema[c].dataType, T.NumericType)
        )
        aggs += [
            # coalesce: SUM over zero rows is NULL, and a NULL n_null
            # poisons profile_drift's != comparison into a NULL drifted
            # flag on empty-vs-empty profiles (r5 operator review); an
            # empty table has zero nulls, not unknown nulls
            F.coalesce(
                F.sum(F.col(c).isNull().cast("long")), F.lit(0)
            ).alias(f"_null_{i}"),
            F.countDistinct(F.col(c)).alias(f"_dist_{i}"),
            F.min(s).alias(f"_min_{i}"),
            F.max(s).alias(f"_max_{i}"),
            (
                pct(F.col(c), F.lit(lo)).cast("double")
                if numeric else F.lit(None).cast("double")
            ).alias(f"_plo_{i}"),
            (
                pct(F.col(c), F.lit(hi)).cast("double")
                if numeric else F.lit(None).cast("double")
            ).alias(f"_phi_{i}"),
        ]
    wide = df.agg(*aggs)
    stack = ", ".join(
        "'{}', _null_{i}, _dist_{i}, _min_{i}, _max_{i}, _plo_{i}, _phi_{i}".format(
            c.replace("'", "''"), i=i
        )
        for i, c in enumerate(use)
    )
    return wide.select(
        F.expr(
            f"stack({len(use)}, {stack}) AS "
            "(column, n_null, n_distinct, min_str, max_str, p_lo, p_hi)"
        ),
        F.col("_n").alias("n_rows"),
    ).select(
        "column", "n_rows", "n_null", "n_distinct", "min_str", "max_str",
        "p_lo", "p_hi",
    )


def profile_drift(
    src: DataFrame,
    tgt: DataFrame,
    cols: list[str] | None = None,
    percentiles: tuple[float, float] | None = (0.5, 0.99),
) -> DataFrame:
    """Join the two profiles: per-column stat deltas + a drifted flag.

    A full-outer join on column name (constant-size inputs), so columns
    present on one side only (schema drift) surface as rows too.
    Percentile drift (p_lo/p_hi null-safe inequality) participates in
    the flag, catching interior-distribution shifts that leave
    count/null/distinct/min/max untouched (r4 verdict item 8); pass
    ``percentiles=None`` to skip the (sort-heavy exact) percentile
    aggregates when only the cheap stats matter. Exact mode only: an
    approx sketch's value can depend on partition order, which would
    make the drifted flag flap on byte-identical data.
    """
    p_s = column_profile(src, cols, percentiles=percentiles)
    p_t = column_profile(tgt, cols, percentiles=percentiles)
    s = p_s.select([F.col(c).alias(f"src_{c}" if c != "column" else c) for c in p_s.columns])
    t = p_t.select([F.col(c).alias(f"tgt_{c}" if c != "column" else c) for c in p_t.columns])
    j = s.join(t, "column", "full_outer")
    drifted = (
        F.col("src_n_rows").isNull()
        | F.col("tgt_n_rows").isNull()
        | (F.col("src_n_rows") != F.col("tgt_n_rows"))
        | (F.col("src_n_null") != F.col("tgt_n_null"))
        | (F.col("src_n_distinct") != F.col("tgt_n_distinct"))
        | ~F.col("src_min_str").eqNullSafe(F.col("tgt_min_str"))
        | ~F.col("src_max_str").eqNullSafe(F.col("tgt_max_str"))
        | ~F.col("src_p_lo").eqNullSafe(F.col("tgt_p_lo"))
        | ~F.col("src_p_hi").eqNullSafe(F.col("tgt_p_hi"))
    )
    return j.select(
        "column",
        "src_n_rows", "tgt_n_rows",
        "src_n_null", "tgt_n_null",
        "src_n_distinct", "tgt_n_distinct",
        drifted.alias("drifted"),
    )
