"""Deterministic synthetic data generator for the CDC engine.

Produces the binlog/WAL-style change log of conversation-transcript
events mandated by BASELINE.json:15 — keyed on (conv_id, turn_idx) —
with every invariant the tests need (FIXTURES.md §B2):

* fixed seed → byte-identical reruns;
* Zipf-skewed conversation sizes (hot conv_ids, for skew handling);
* inserts / updates / deletes, updates to missing keys (upsert case);
* out-of-order LSN arrival within a slice (row order != LSN order);
* duplicate event deliveries (same LSN emitted twice);
* an epoch boundary before which the ``tool`` column does not exist
  (schema-evolution case).

Generation is vectorized numpy/pandas — no per-row Python — so bench
scales to tens of millions of events in seconds. The pure-pandas
``fold_changelog`` at the bottom is the semantic oracle the Spark engine
is tested against: final table state = per-key last-writer-wins by LSN,
with op 'D' removing the key.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

TOOL_NAMES = np.array(["", "search", "python", "browser", "calculator"])
ROLES = np.array(["user", "assistant", "tool", "system"])
BASE_TS = np.datetime64("2026-01-01T00:00:00")


def gen_changelog(
    n_events: int,
    n_convs: int | None = None,
    seed: int = 42,
    p_update: float = 0.20,
    p_delete: float = 0.05,
    dup_frac: float = 0.02,
    ooo_block: int = 1024,
    tool_epoch_frac: float = 0.35,
    zipf_a: float = 1.3,
    text_pad: int = 0,
) -> pd.DataFrame:
    """Generate a deterministic change log as a pandas DataFrame.

    Row order simulates arrival order and is shuffled within blocks of
    ``ooo_block`` so LSNs arrive out of order inside a slice. ``lsn`` is
    the logical order and is unique except for the appended duplicate
    deliveries. Events with ``lsn < tool_epoch_lsn(...)`` carry a null
    ``tool`` (and early slices may be persisted without the column at
    all — see ``write_changelog``).
    """
    rng = np.random.default_rng(seed)
    n_convs = n_convs or max(16, n_events // 64)

    # Zipf-skewed conversation assignment: rank r gets weight r^-a.
    ranks = np.arange(1, n_convs + 1, dtype=np.float64)
    weights = ranks**-zipf_a
    weights /= weights.sum()
    conv_num = rng.choice(n_convs, size=n_events, p=weights)

    # Occurrence index of each event within its conversation (vectorized
    # cumcount) — used both as the insert turn_idx and as the bound for
    # update/delete targets.
    s = pd.Series(conv_num)
    occ = s.groupby(s).cumcount().to_numpy()

    r = rng.random(n_events)
    is_update = (r < p_update) & (occ > 0)
    is_delete = (r >= p_update) & (r < p_update + p_delete) & (occ > 0)
    op = np.where(is_update, "U", np.where(is_delete, "D", "I"))

    # Inserts use their occurrence index (unique per conv); updates and
    # deletes target a uniform-random earlier occurrence (which may never
    # have been inserted — U then acts as an upsert, D as a no-op).
    target = rng.integers(0, np.maximum(occ, 1))
    turn_idx = np.where(op == "I", occ, target).astype(np.int32)

    lsn = np.arange(n_events, dtype=np.int64)
    ts = BASE_TS + lsn.astype("timedelta64[s]")

    conv_id = np.char.add("conv", np.char.zfill(conv_num.astype("U10"), 8))
    role = ROLES[(lsn + conv_num) % len(ROLES)]
    pad = "x" * text_pad
    text = pd.Series(
        np.where(
            op == "D",
            None,
            "t-" + pd.Series(conv_id).str.slice(4) + "-"
            + pd.Series(turn_idx).astype(str) + "-v"
            + pd.Series(lsn).astype(str) + pad,
        )
    )

    epoch = tool_epoch_lsn(n_events, tool_epoch_frac)
    tool_pick = TOOL_NAMES[rng.integers(0, len(TOOL_NAMES), n_events)]
    tool = pd.Series(np.where((lsn < epoch) | (op == "D") | (tool_pick == ""), None, tool_pick))

    df = pd.DataFrame(
        {
            "lsn": lsn,
            "op": op,
            "conv_id": conv_id,
            "turn_idx": turn_idx,
            "role": np.where(op == "D", None, role),
            "text": text,
            "tool": tool,
            "ts": pd.Series(ts).astype("datetime64[us]"),
        }
    )

    # Duplicate deliveries: re-emit a sample of rows with identical LSN
    # and payload (at-least-once transport).
    if dup_frac > 0 and n_events > 0:
        n_dup = max(1, int(n_events * dup_frac))
        dup_idx = rng.choice(n_events, size=n_dup, replace=False)
        df = pd.concat([df, df.iloc[dup_idx]], ignore_index=True)

    # Out-of-order arrival: permute row order within fixed blocks.
    if ooo_block > 1:
        n = len(df)
        block = np.arange(n) // ooo_block
        jitter = rng.random(n)
        order = np.lexsort((jitter, block))
        df = df.iloc[order].reset_index(drop=True)

    return df


def tool_epoch_lsn(n_events: int, tool_epoch_frac: float = 0.35) -> int:
    """LSN before which the ``tool`` column does not exist."""
    return int(n_events * tool_epoch_frac)


# ---------------------------------------------------------------------
# Distributed generation — the 10^10-event path. The driver-pandas
# generator above tops out around 10^6 events/min; at bench and cluster
# scale the log is generated BY Spark: one task per contiguous LSN
# block, each block produced vectorized (numpy inside mapInPandas) from
# a block-derived seed, so output is deterministic in (seed, n_events,
# params) and independent of partitioning/executor count.
# ---------------------------------------------------------------------
def gen_changelog_spark(
    spark,
    n_events: int,
    n_convs: int | None = None,
    seed: int = 42,
    p_update: float = 0.20,
    p_delete: float = 0.05,
    dup_frac: float = 0.02,
    tool_epoch_frac: float = 0.35,
    zipf_a: float = 1.3,
    text_len: int = 256,
    max_turns: int = 64,
    block: int = 250_000,
    block_range: tuple[int, int] | None = None,
):
    """Generate the change log as a Spark DataFrame (CHANGELOG_SCHEMA).

    Differences from the driver-pandas generator (documented, by
    design): conversation ranks come from inverse-CDF Zipf sampling (no
    global weight table — works at 10^8+ conversations) and ``turn_idx``
    is drawn uniform per conversation rather than via global cumcount
    (a per-block task cannot see other blocks' counters). All CDC
    invariants are preserved: Zipf-hot keys, upserting updates, deletes,
    duplicate deliveries, in-block out-of-order arrival, and the
    pre-``tool`` epoch. Text is pseudo-random (low-compressibility) so
    parquet/shuffle codecs do real work, sized by ``text_len``.
    """
    from pyspark.sql import functions as F  # noqa: F401

    from etl_reconciliate_spark.schemas import CHANGELOG_SCHEMA

    n_convs = n_convs or max(16, n_events // 64)
    epoch = tool_epoch_lsn(n_events, tool_epoch_frac)
    n_blocks = max(1, (n_events + block - 1) // block)
    # block_range narrows generation to blocks [lo, hi) — a caller that
    # only needs an LSN sub-range (the per-epoch writes below) must not
    # pay for generating the whole log; per-block seeding keeps every
    # block's content identical regardless of the range requested
    blk_lo, blk_hi = block_range or (0, n_blocks)

    def gen_block(iterator):
        for pdf in iterator:
            for b in pdf["id"].to_numpy():
                lo = int(b) * block
                hi = min(lo + block, n_events)
                n = hi - lo
                if n <= 0:
                    continue
                rng = np.random.default_rng([seed, int(b)])
                lsn = np.arange(lo, hi, dtype=np.int64)
                # Inverse-CDF Zipf(a): rank = floor(u^(-1/(a-1))), capped.
                u = np.maximum(rng.random(n), 1e-12)
                # Clip in float space first: u^-1/(a-1) can exceed int64.
                rank = np.minimum(
                    u ** (-1.0 / (zipf_a - 1.0)), float(n_convs)
                ).astype(np.int64)
                rank = np.maximum(rank, 1) - 1
                conv_num = rank
                r = rng.random(n)
                op = np.where(
                    r < p_update, "U",
                    np.where(r < p_update + p_delete, "D", "I"),
                )
                turn_idx = rng.integers(0, max_turns, n).astype(np.int32)
                conv_id = np.char.add(
                    "conv", np.char.zfill(conv_num.astype("U10"), 8)
                )
                role = ROLES[(lsn + conv_num) % len(ROLES)]
                # Low-compressibility payload: block-seeded random word
                # codes, deterministic given (seed, block).
                # Vectorized string build: (n, k) U8 words are contiguous
                # UTF-32, so a view as U(8k) concatenates row-wise with no
                # per-row Python.
                n_words = max(1, text_len // 8)
                codes = rng.integers(
                    10**7, 10**8, size=(n, n_words), dtype=np.int64
                )
                text_body = np.ascontiguousarray(codes.astype("U8")).view(
                    f"U{8 * n_words}"
                ).ravel()
                text = pd.Series(
                    np.where(
                        op == "D",
                        None,
                        "t-" + pd.Series(conv_id).str.slice(4) + "-"
                        + pd.Series(turn_idx).astype(str) + "-v"
                        + pd.Series(lsn).astype(str) + "-" + text_body,
                    )
                )
                tool_pick = TOOL_NAMES[rng.integers(0, len(TOOL_NAMES), n)]
                tool = pd.Series(
                    np.where(
                        (lsn < epoch) | (op == "D") | (tool_pick == ""),
                        None,
                        tool_pick,
                    )
                )
                out = pd.DataFrame(
                    {
                        "lsn": lsn,
                        "op": op,
                        "conv_id": conv_id,
                        "turn_idx": turn_idx,
                        "role": np.where(op == "D", None, role),
                        "text": text,
                        "tool": tool,
                        "ts": pd.Series(
                            BASE_TS + lsn.astype("timedelta64[s]")
                        ).astype("datetime64[us]"),
                    }
                )
                # Duplicate deliveries + in-block out-of-order arrival.
                if dup_frac > 0:
                    n_dup = max(1, int(n * dup_frac))
                    dup_idx = rng.choice(n, size=n_dup, replace=False)
                    out = pd.concat([out, out.iloc[dup_idx]], ignore_index=True)
                out = out.iloc[rng.permutation(len(out))].reset_index(drop=True)
                yield out

    ids = spark.range(blk_lo, blk_hi, 1, numPartitions=max(1, blk_hi - blk_lo))
    return ids.mapInPandas(gen_block, schema=CHANGELOG_SCHEMA)


def write_changelog_spark(
    spark,
    path: str,
    n_events: int,
    seed: int = 42,
    tool_epoch_frac: float = 0.35,
    **gen_kwargs,
) -> int:
    """Distributed generate + persist, split at the schema-evolution
    epoch like :func:`write_changelog` (early rows lack the ``tool``
    column entirely). Each mapInPandas block is one contiguous LSN range
    and one output file, so the slice reader's lsn predicate prunes
    whole files via parquet min/max stats. Returns the epoch LSN."""
    epoch = tool_epoch_lsn(n_events, tool_epoch_frac)
    block = gen_kwargs.get("block", 250_000)
    n_blocks = max(1, (n_events + block - 1) // block)
    # the lsn filters sit ABOVE mapInPandas, where Spark cannot push
    # them into the generator — without block-range pruning BOTH writes
    # re-ran every generator block (2x the full generation cost, r4
    # review). Blocks are contiguous LSN ranges, so each epoch write
    # generates only the blocks intersecting its range; only the one
    # epoch-straddling block is generated twice.
    def _gen(rng_blocks):
        return gen_changelog_spark(
            spark, n_events, seed=seed, tool_epoch_frac=tool_epoch_frac,
            block_range=rng_blocks, **gen_kwargs
        )

    pre_blocks = min(n_blocks, (epoch + block - 1) // block)
    df0 = _gen((0, max(pre_blocks, 1)))
    # zstd, like the target table (Iceberg's default parquet codec).
    df0.filter(df0.lsn < epoch).drop("tool").write.option(
        "compression", "zstd"
    ).mode("overwrite").parquet(f"{path}/epoch=0")
    df1 = _gen((min(epoch // block, n_blocks - 1), n_blocks))
    df1.filter(df1.lsn >= epoch).write.option("compression", "zstd").mode(
        "overwrite"
    ).parquet(f"{path}/epoch=1")
    return epoch


def write_changelog(
    spark,
    df: pd.DataFrame,
    path: str,
    epoch_lsn: int | None = None,
    n_files: int = 32,
) -> None:
    """Persist the change log as parquet, split at the schema-evolution
    epoch: rows below ``epoch_lsn`` are written WITHOUT the ``tool``
    column (subdir ``epoch=0``), the rest with it (``epoch=1``), so the
    reader sees a genuine schema change mid-stream. Files are
    LSN-range-clustered so the slice reader's lsn predicate prunes
    row groups (parquet min/max stats).
    """
    from etl_reconciliate_spark.schemas import CHANGELOG_SCHEMA, CHANGELOG_SCHEMA_V0

    df = df.sort_values("lsn", kind="stable").reset_index(drop=True)
    if epoch_lsn is None:
        epoch_lsn = 0
    early = df[df["lsn"] < epoch_lsn].drop(columns=["tool"])
    late = df[df["lsn"] >= epoch_lsn]
    if len(early):
        sdf = spark.createDataFrame(early, schema=CHANGELOG_SCHEMA_V0)
        sdf.repartitionByRange(max(1, n_files // 4), "lsn").write.mode(
            "overwrite"
        ).parquet(f"{path}/epoch=0")
    if len(late):
        sdf = spark.createDataFrame(late, schema=CHANGELOG_SCHEMA)
        sdf.repartitionByRange(n_files, "lsn").write.mode("overwrite").parquet(
            f"{path}/epoch=1"
        )


def fold_changelog(df: pd.DataFrame) -> pd.DataFrame:
    """Pure-pandas oracle: fold the change log into final table state.

    Per (conv_id, turn_idx): the event with the highest LSN wins; if it
    is a delete the key is absent. Duplicate deliveries of the same LSN
    are identical rows, so any one of them is representative.
    Returns columns (conv_id, turn_idx, role, text, tool, ts) sorted by
    key — the expected target-table content.
    """
    d = df.sort_values("lsn", kind="stable").drop_duplicates(
        subset=["conv_id", "turn_idx"], keep="last"
    )
    d = d[d["op"] != "D"]
    return (
        d[["conv_id", "turn_idx", "role", "text", "tool", "ts"]]
        .sort_values(["conv_id", "turn_idx"], kind="stable")
        .reset_index(drop=True)
    )
