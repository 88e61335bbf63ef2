"""Datagen invariants (FIXTURES.md §B2)."""

import pandas as pd

from etl_reconciliate_spark.datagen import fold_changelog, gen_changelog, tool_epoch_lsn


def test_deterministic():
    a = gen_changelog(5000, seed=7)
    b = gen_changelog(5000, seed=7)
    pd.testing.assert_frame_equal(a, b)


def test_invariants():
    df = gen_changelog(20_000, seed=42)
    # duplicate deliveries exist and are byte-identical per lsn
    dup = df[df.duplicated(subset=["lsn"], keep=False)]
    assert len(dup) > 0
    per_lsn = dup.groupby("lsn").nunique(dropna=False)
    assert (per_lsn <= 1).all().all()
    # all three ops present
    assert set(df["op"].unique()) == {"I", "U", "D"}
    # out-of-order arrival: row order is not LSN order
    assert not df["lsn"].is_monotonic_increasing
    # tool column null before the epoch
    epoch = tool_epoch_lsn(20_000)
    assert df.loc[df["lsn"] < epoch, "tool"].isna().all()
    assert df.loc[df["lsn"] >= epoch, "tool"].notna().any()
    # zipf skew: the hottest conversation dominates
    counts = df["conv_id"].value_counts()
    assert counts.iloc[0] > 10 * counts.median()


def test_fold_semantics():
    df = pd.DataFrame(
        {
            "lsn": [1, 2, 3, 4, 5, 5],
            "op": ["I", "U", "D", "I", "U", "U"],
            "conv_id": ["a", "a", "a", "a", "b", "b"],
            "turn_idx": [0, 0, 0, 0, 1, 1],
            "role": ["user"] * 6,
            "text": ["v1", "v2", None, "v4", "v5", "v5"],
            "tool": [None] * 6,
            "ts": pd.to_datetime(["2026-01-01"] * 6),
        }
    )
    out = fold_changelog(df)
    # key (a,0): I,U,D,I → final insert v4 wins; (b,1): upsert v5
    assert len(out) == 2
    assert out.loc[out["conv_id"] == "a", "text"].iloc[0] == "v4"
    assert out.loc[out["conv_id"] == "b", "text"].iloc[0] == "v5"
