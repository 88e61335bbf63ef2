"""Deterministic mixture sampling (per-source up/down-sampling).

Training corpora are mixed from heterogeneous sources at explicit
weights (The Pile's per-set epochs, Dolma/OLMo source mixing, Llama's
sampling proportions). This operator realizes a rate per group
deterministically: ``rate=0.25`` keeps a fixed hash-chosen quarter of a
source, ``rate=2.5`` emits every doc twice plus a hash-chosen half a
third time. Hash-based (id, seed) selection — not ``df.sample`` — so
the mix is reproducible across runs/engines, stable under corpus
growth (a doc's fate never depends on other docs), and
oracle-checkable.

Scale shape: a literal CASE over the group column, one integer hash
compare, and ``explode(sequence(...))`` for the copy index — no
shuffle, no UDF, output size = Σ rate_g × |group g|. Fractional
thresholds are computed in PYTHON as integer micro-buckets, so no
float rounding can diverge between engines.

reference: no analog in the reference app (SURVEY §2 "beyond the
reference").
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from etl_reconciliate_spark.functions.hashing import hash32, hash32_sql

BUCKETS = 1_000_000


def _split_rate(rate: float) -> tuple[int, int]:
    """(whole copies, extra-copy micro-bucket threshold)."""
    if rate < 0:
        raise ValueError(f"negative sampling rate {rate}")
    whole = int(rate)
    frac_buckets = int(round((rate - whole) * BUCKETS))
    return whole, frac_buckets


def mixture_sample(
    docs: DataFrame,
    rates: dict[str, float],
    default_rate: float = 1.0,
    group_col: str = "source",
    id_col: str = "doc_id",
    seed: int = 11,
) -> DataFrame:
    """Sample each group at its rate; returns the input columns plus
    ``copy_idx`` (1..n for upsampled repeats — downstream shuffles
    spread copies; a training loader can also epoch-offset on it)."""
    whole_expr, frac_expr = None, None
    for src, rate in rates.items():
        whole, fb = _split_rate(rate)
        m = F.col(group_col) == src
        whole_expr = (
            F.when(m, whole) if whole_expr is None else whole_expr.when(m, whole)
        )
        frac_expr = (
            F.when(m, fb) if frac_expr is None else frac_expr.when(m, fb)
        )
    dwhole, dfrac = _split_rate(default_rate)
    whole_expr = (
        whole_expr.otherwise(dwhole) if whole_expr is not None else F.lit(dwhole)
    )
    frac_expr = (
        frac_expr.otherwise(dfrac) if frac_expr is not None else F.lit(dfrac)
    )
    bucket = hash32(F.col(id_col), seed=seed) % BUCKETS
    n_copies = whole_expr + F.when(bucket < frac_expr, 1).otherwise(0)
    return (
        docs.withColumn("_n_copies", n_copies)
        .filter(F.col("_n_copies") >= 1)
        .withColumn(
            "copy_idx", F.explode(F.sequence(F.lit(1), F.col("_n_copies")))
        )
        .drop("_n_copies")
    )


def mixture_oracle_sql(
    rates: dict[str, float],
    default_rate: float = 1.0,
    group_col: str = "source",
    id_col: str = "doc_id",
    seed: int = 11,
    source_sql: str = "SELECT * FROM documents",
    select_cols: str = "doc_id, source",
) -> str:
    """DuckDB mirror of :func:`mixture_sample` (same rates/seed)."""
    whole_cases, frac_cases = [], []
    for src, rate in rates.items():
        whole, fb = _split_rate(rate)
        lit = src.replace("'", "''")  # escape: source names are data
        whole_cases.append(f"WHEN {group_col} = '{lit}' THEN {whole}")
        frac_cases.append(f"WHEN {group_col} = '{lit}' THEN {fb}")
    dwhole, dfrac = _split_rate(default_rate)
    # CASE with zero WHEN branches is a syntax error — empty rates (a
    # config mixture_sample() accepts) degrade to the bare defaults
    if whole_cases:
        whole_sql = f"CASE {' '.join(whole_cases)} ELSE {dwhole} END"
        frac_sql = f"CASE {' '.join(frac_cases)} ELSE {dfrac} END"
    else:
        whole_sql, frac_sql = str(dwhole), str(dfrac)
    bucket = f"({hash32_sql(id_col, seed)} % {BUCKETS})"
    return f"""
WITH src AS ({source_sql}),
n AS (
  SELECT *, {whole_sql} + CASE WHEN {bucket} < {frac_sql} THEN 1 ELSE 0 END
    AS _n_copies
  FROM src
)
SELECT {select_cols}, CAST(gs.i AS INT) AS copy_idx
FROM n, LATERAL (SELECT unnest(generate_series(1, _n_copies)) AS i) gs
WHERE _n_copies >= 1
"""
