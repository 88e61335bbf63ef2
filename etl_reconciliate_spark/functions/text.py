"""Vectorized (Arrow) text-comparison UDFs.

The spec mandates "vectorized Arrow UDFs for text comparison" in the
reconciliation pass (BASELINE.json:6,15 — no per-row Python). Batches
move JVM→Python as Arrow columns and are compared with pandas vectorized
string ops. Plain equality stays native (``eqNullSafe``) where possible;
these UDFs carry the comparisons Spark's builtins don't express —
normalized equality and a bounded similarity score.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F, types as T


@F.pandas_udf(T.BooleanType())
def texts_equal_normalized(a: pd.Series, b: pd.Series) -> pd.Series:
    """Equality after whitespace collapse + strip — tolerant comparison
    for transcript text that crossed two serialization paths.

    Pandas ``\\s`` here is Python-Unicode whitespace (NBSP, U+2028, …),
    deliberately BROADER than the ASCII class ``textstats.WS_CHARS``
    pins for oracle-paired operators: this comparator is a tolerance
    knob with no DuckDB mirror (the recon oracle pairs only with the
    ``exact`` comparator), and serialization paths differ exactly in
    exotic whitespace — collapsing more of it is the point."""
    na = a.str.replace(r"\s+", " ", regex=True).str.strip()
    nb = b.str.replace(r"\s+", " ", regex=True).str.strip()
    both_null = a.isna() & b.isna()
    return (na == nb).fillna(False) | both_null


@F.pandas_udf(T.DoubleType())
def text_similarity(a: pd.Series, b: pd.Series) -> pd.Series:
    """Cheap bounded similarity in [0,1]: common-prefix length over max
    length — enough to rank discrepancies by severity without quadratic
    edit-distance cost. Fully vectorized: the prefix length is found by
    binary search with whole-column slice comparisons (O(log maxlen)
    vectorized passes, zero per-row Python)."""
    import numpy as np

    aa = a.fillna("")
    bb = b.fillna("")
    la = aa.str.len().to_numpy()
    lb = bb.str.len().to_numpy()
    cap = np.minimum(la, lb)
    hi_all = int(cap.max()) if len(cap) else 0

    # prefix equality is monotone in length → per-row binary search,
    # executed as column-wise masked slice comparisons.
    lo = np.zeros(len(aa), dtype=np.int64)
    step = 1
    while step <= hi_all:
        step <<= 1
    step >>= 1
    while step > 0:
        cand = lo + step
        feasible = cand <= cap
        k = int(cand.max()) if len(cand) else 0
        if k > 0:
            eq = np.zeros(len(aa), dtype=bool)
            for n in np.unique(cand[feasible]):
                sel = feasible & (cand == n)
                eq[sel] = (
                    aa[sel].str.slice(0, int(n)) == bb[sel].str.slice(0, int(n))
                ).to_numpy()
            lo = np.where(feasible & eq, cand, lo)
        step >>= 1

    denom = np.maximum(np.maximum(la, lb), 1)
    sim = lo / denom
    sim = np.where((la == 0) & (lb == 0), 1.0, sim)
    return pd.Series(sim, index=a.index)
