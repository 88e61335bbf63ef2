"""Explicit salted-key skew handling for large joins.

The north rule requires skew "handled explicitly" (BASELINE.json:14), on
top of AQE's runtime skew-join split. Transcript conversations are
Zipf-ish — one hot key can dominate a shuffle partition (SURVEY §7.3).

``salted_full_outer`` decomposes FULL OUTER ``L ⟗ R ON keys`` exactly:

* **cold keys** → plain full outer join (Catalyst picks the strategy);
* **hot keys** (per-key row count above ``hot_threshold`` on either
  side) → three legs that together equal the full outer join:
    1. matched:   L_hot(+salt) ⋈ R_hot(×S replicas) on (keys, salt) —
       every L row meets every R row of its key exactly once, but the
       key's rows now spread across S reducers;
    2. L-only:    L_hot rows whose key has no R rows (key-level
       left_anti — correct because an equi-join on the full key matches
       a row iff the other side has ANY row for that key);
    3. R-only:    symmetric right_anti.

The matched leg uses DETERMINISTIC count-expand salting (r5; replaces
the r4 per-row ``monotonically_increasing_id`` ordinal, which made the
map stage indeterminate — after a fetch failure Spark had to retry the
whole stage, and a partial retry could have re-salted rows differently
than the map output already consumed, duplicating/dropping matched
rows — r4 advice):

1. each hot side collapses to DISTINCT rows + a count (byte-identical
   duplicate deliveries — the very pathology that makes transcript keys
   hot — collapse map-side via partial agg, and the exchange hashes the
   FULL row, uniform even for the hottest key);
2. a distinct L row's ``c`` copies spread across ``min(c, S)`` salt
   slots with per-slot shares ``c div S`` (+1 for the first
   ``c mod S`` slots), anchored at the row's content hash so
   singletons scatter uniformly instead of piling on slot 0;
3. distinct R rows replicate across all S salts (probe side);
4. after the (keys, salt) join each (l, r) pair re-expands
   ``share × r_count`` times via a chunked explode (bounded arrays).

Every expression is deterministic (hash + integer arithmetic), so stage
retries replay byte-identical salts, and the shuffle now carries
distinct rows + counts instead of every duplicate. Output column
convention matches ``join(..., "full_outer")`` with both sides aliased.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def salted_full_outer(
    left: DataFrame,
    right: DataFrame,
    keys: list[str],
    n_salts: int = 8,
    hot_threshold: int = 100_000,
    left_prefix: str = "l",
    right_prefix: str = "r",
    hot_keys: DataFrame | None = None,
    sample_fraction: float | None = None,
) -> DataFrame:
    """Exact FULL OUTER equi-join with explicit hot-key salting.

    Returns all columns of both sides, prefixed ``{left_prefix}_`` /
    ``{right_prefix}_`` (unmatched side → nulls).

    Hot-key detection, cheapest first:

    * ``hot_keys`` — a caller-supplied (small) DataFrame of the key
      columns. At 100 TB the hot set is usually KNOWN ahead of time
      (previous run's census, table statistics, the run manifest) —
      passing it skips the census scans entirely.
    * ``sample_fraction`` — census on a Bernoulli sample with the
      threshold scaled down proportionally (seeded: deterministic
      across retries). A 100k-row hot key is found by a 1% sample with
      ~±10% count error — set the threshold with that slack in mind.
      Aggregation state shrinks by 1/fraction; exactness of the JOIN is
      unaffected (only the hot/cold routing is approximate, and both
      routes are exact).
    * default — exact per-key counts on both sides (map-side combined).
    """
    def tag(df: DataFrame, prefix: str) -> DataFrame:
        return df.select([F.col(c).alias(f"{prefix}_{c}") for c in df.columns])

    lt = tag(left, left_prefix)
    rt = tag(right, right_prefix)
    lk = [f"{left_prefix}_{k}" for k in keys]
    rk = [f"{right_prefix}_{k}" for k in keys]

    if hot_keys is not None:
        hot = F.broadcast(hot_keys.select(keys).distinct())
    else:
        lc, rc, thr = lt, rt, hot_threshold
        if sample_fraction is not None:
            lc = lt.sample(fraction=sample_fraction, seed=7)
            rc = rt.sample(fraction=sample_fraction, seed=7)
            thr = max(1, int(hot_threshold * sample_fraction))
        # A key is hot if either side exceeds the threshold. One
        # pre-aggregation per side (map-side combine); the hot set is
        # tiny by construction → broadcast it.
        lhot = lc.groupBy(lk).agg(F.count(F.lit(1)).alias("_ln")).filter(
            F.col("_ln") > thr
        ).select([F.col(c).alias(k) for c, k in zip(lk, keys)])
        rhot = rc.groupBy(rk).agg(F.count(F.lit(1)).alias("_rn")).filter(
            F.col("_rn") > thr
        ).select([F.col(c).alias(k) for c, k in zip(rk, keys)])
        hot = F.broadcast(lhot.unionByName(rhot).distinct())

    def split(df: DataFrame, kcols: list[str]):
        h = hot.select([F.col(k).alias(f"_h_{k}") for k in keys])
        cond = None
        for k, kc in zip(keys, kcols):
            c = F.col(kc).eqNullSafe(F.col(f"_h_{k}"))
            cond = c if cond is None else (cond & c)
        hot_rows = df.join(h, cond, "left_semi")
        cold_rows = df.join(h, cond, "left_anti")
        return hot_rows, cold_rows

    l_hot, l_cold = split(lt, lk)
    r_hot, r_cold = split(rt, rk)

    join_cond = None
    for a, b in zip(lk, rk):
        c = F.col(a).eqNullSafe(F.col(b))
        join_cond = c if join_cond is None else (join_cond & c)

    cold = l_cold.join(r_cold, join_cond, "full_outer")

    # Hot matched leg: deterministic count-expand salting (see module
    # docstring). _chunk_size bounds the re-expansion arrays so a
    # million-fold duplicate never materializes one giant sequence().
    _chunk = 4096
    l_dist = l_hot.groupBy(*l_hot.columns).agg(F.count(F.lit(1)).alias("_lc"))
    r_dist = r_hot.groupBy(*r_hot.columns).agg(F.count(F.lit(1)).alias("_rc"))

    salt_l = (
        l_dist.withColumn(
            "_slot", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
        )
        .withColumn(
            "_share",
            F.expr(f"_lc DIV {n_salts}")
            + F.when(
                F.col("_slot") < F.pmod(F.col("_lc"), F.lit(n_salts)), F.lit(1)
            ).otherwise(F.lit(0)),
        )
        # singleton rows (_lc < n_salts) occupy only their first slots —
        # the filter keeps the shuffle at Σ min(_lc, S) rows per distinct
        # row, not a blanket ×S amplification
        .filter(F.col("_share") > 0)
        .withColumn(
            "_salt",
            F.pmod(
                F.xxhash64(*[F.col(c) for c in l_dist.columns if c != "_lc"])
                + F.col("_slot"),
                F.lit(n_salts),
            ).cast("long"),
        )
        .drop("_slot", "_lc")
    )
    salt_r = (
        r_dist.withColumn(
            "_salt_i", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
        )
        .withColumn("_salt", F.col("_salt_i").cast("long"))
        .drop("_salt_i")
    )
    matched = (
        salt_l.join(
            salt_r, join_cond & (salt_l["_salt"] == salt_r["_salt"]), "inner"
        )
        .withColumn("_rep", F.col("_share") * F.col("_rc"))
        .withColumn(
            "_c",
            F.explode(
                F.sequence(
                    F.lit(0).cast("long"), F.expr(f"(_rep - 1) DIV {_chunk}")
                )
            ),
        )
        .withColumn(
            "_i",
            F.explode(
                F.sequence(
                    F.lit(1).cast("long"),
                    F.least(
                        F.col("_rep") - F.col("_c") * F.lit(_chunk),
                        F.lit(_chunk).cast("long"),
                    ),
                )
            ),
        )
        .drop("_salt", "_share", "_rc", "_rep", "_c", "_i")
    )

    # key-LEVEL anti: a full-row anti-join would hash-partition both
    # hot sides by the raw key — every row of the hottest key on one
    # reducer, the exact hotspot the salting removed (r4 review). The
    # distinct key set of a hot side is bounded by the hot-key census,
    # so broadcast it and no skewed shuffle happens at all.
    r_hot_keys = F.broadcast(
        r_hot.select([F.col(c).alias(f"_h_{k}") for c, k in zip(rk, keys)])
        .distinct()
    )
    l_hot_keys = F.broadcast(
        l_hot.select([F.col(c).alias(f"_h_{k}") for c, k in zip(lk, keys)])
        .distinct()
    )

    def anti_cond(kcols):
        cond = None
        for k, kc in zip(keys, kcols):
            c = F.col(kc).eqNullSafe(F.col(f"_h_{k}"))
            cond = c if cond is None else (cond & c)
        return cond

    l_only = l_hot.join(r_hot_keys, anti_cond(lk), "left_anti")
    r_only = r_hot.join(l_hot_keys, anti_cond(rk), "left_anti")

    null_r = [F.lit(None).cast(rt.schema[c].dataType).alias(c) for c in rt.columns]
    null_l = [F.lit(None).cast(lt.schema[c].dataType).alias(c) for c in lt.columns]
    l_only_full = l_only.select([F.col(c) for c in lt.columns] + null_r)
    r_only_full = r_only.select(null_l + [F.col(c) for c in rt.columns])

    out_cols = lt.columns + rt.columns
    return (
        cold.select(out_cols)
        .unionByName(matched.select(out_cols))
        .unionByName(l_only_full.select(out_cols))
        .unionByName(r_only_full.select(out_cols))
    )
