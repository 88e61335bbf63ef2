"""Corpus-preparation operators: splits, packing, decontamination.

The last mile of a training-data pipeline after curation
(``operators.curate``): deterministic train/val/test assignment,
GPT-style sequence packing, and benchmark decontamination. All three
are pure column algebra / one-shuffle window shapes, and every hash is
the portable ``functions.hashing.hash32`` — each operator is exactly
value-checkable against a DuckDB oracle (``__spark_entry__``).

reference: no equivalent exists in the reference app — this is the
§"beyond the reference" training-data surface; semantics follow public
pipeline practice (hash-based splits; GPT/Pile-style concat-and-chunk
packing; n-gram-overlap decontamination a la GPT-3 appendix C /
FLAN/OLMo decontamination).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from etl_reconciliate_spark.functions.hashing import hash32
from etl_reconciliate_spark.operators.dedupe_docs import char_shingles
from etl_reconciliate_spark.operators.textstats import token_count

SPLIT_BUCKETS = 10_000


def split_assign(
    docs: DataFrame,
    weights: dict[str, float] | None = None,
    seed: int = 7,
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic train/val/test assignment by id hash.

    Membership depends ONLY on the document id (bucket =
    ``hash32(id, seed) % 10000`` against cumulative weight thresholds),
    never on corpus size or ordering — documents keep their split when
    the corpus grows, shards can be assigned independently with no
    shuffle, and the same id lands in the same split on every engine
    (the portable hash makes the assignment oracle-checkable).
    Appends a ``split`` column.
    """
    weights = weights or {"train": 0.98, "val": 0.01, "test": 0.01}
    total = sum(weights.values())
    bucket = hash32(F.col(id_col), seed=seed) % SPLIT_BUCKETS
    expr, cum = None, 0.0
    names = list(weights)
    for name in names[:-1]:
        cum += weights[name] / total
        bound = int(round(cum * SPLIT_BUCKETS))
        branch = (
            F.when(bucket < bound, F.lit(name)) if expr is None
            else expr.when(bucket < bound, F.lit(name))
        )
        expr = branch
    expr = expr.otherwise(F.lit(names[-1])) if expr is not None else F.lit(names[-1])
    return docs.withColumn("split", expr)


def pack_sequences(
    docs: DataFrame,
    budget_tokens: int = 2048,
    n_shards: int = 64,
    id_col: str = "doc_id",
    text_col: str = "text",
    extra_partition_cols: tuple[str, ...] = (),
) -> DataFrame:
    """GPT-style sequence packing: concatenate documents in order and
    cut at fixed token budgets; each document is assigned to the
    sequence its FIRST token lands in.

    Packing is per-SHARD (``shard = hash32(id) % n_shards``), which is
    the at-scale semantics: a global concatenation order would force a
    single-partition window (one task sorts the whole corpus), while
    per-shard packing is one shuffle on the shard key and every shard
    packs independently — exactly how distributed training-data prep
    shards its tokenizer output. Within a shard the order is ``id_col``
    (deterministic). Returns (id, n_tokens, shard, start_offset,
    seq_id): ``start_offset`` is the token offset of the document in
    its shard's virtual concatenation, ``seq_id = start_offset //
    budget_tokens``.

    ``extra_partition_cols`` join the shard in the packing window —
    REQUIRED when the output is consumed per-group (e.g. per train/
    val/test split): packing the whole corpus and then filtering a
    group would leave holes in its sequences (a sequence spanning two
    splits is readable from neither — r4 review). With
    ``extra_partition_cols=("split",)`` every (split, shard) packs its
    own contiguous sequences.
    """
    shard = (hash32(F.col(id_col)) % n_shards).cast("int")
    d = docs.select(
        F.col(id_col),
        *extra_partition_cols,
        token_count(F.col(text_col)).alias("n_tokens"),
        shard.alias("shard"),
    )
    w = (
        Window.partitionBy(*extra_partition_cols, "shard")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    start = F.sum("n_tokens").over(w) - F.col("n_tokens")
    return d.select(
        id_col, *extra_partition_cols, "n_tokens", "shard",
        start.alias("start_offset"),
        F.floor(start / budget_tokens).cast("long").alias("seq_id"),
    )


def contamination_pairs(
    train: DataFrame,
    benchmark: DataFrame,
    k: int = 8,
    min_overlap_frac: float = 0.3,
    broadcast: bool = True,
) -> DataFrame:
    """Benchmark-contamination detection: (train_id, bench_id,
    n_common_shingles, overlap_frac) for every (train, benchmark) pair
    whose shared char-``k``-gram shingles cover at least
    ``min_overlap_frac`` of the BENCHMARK document's shingles
    (GPT-3-appendix-C-style n-gram decontamination).

    Normalizing by the benchmark side is load-bearing (r5 operator
    review): the question is "how much of this eval item appears in
    training data", and a 100k-char train document that verbatim-embeds
    a whole 500-char benchmark question has a train-side fraction of
    ~0.005 — normalizing by the train side made the filter WEAKER the
    longer (and likelier-contaminated) the train doc, missing the
    canonical contamination mode entirely. GPT-3 appendix C and the
    FLAN/OLMo decontamination recipes all measure against the benchmark
    example.

    The join is on the shingle value — candidate pairs ∝ shared
    shingles, never |train| × |bench| — and the benchmark side of a real
    run is small (eval suites), so both its shingle frame and its
    per-doc sizes broadcast; the train side streams through one shuffle.
    ``broadcast=False`` is the escape hatch for a benchmark SHINGLE
    frame too large for executor memory (same pattern as
    ``reconcile.recon_incremental``): the shingle join then plans as a
    regular shuffle join. The per-doc sizes frame stays hinted either
    way — it is one row per benchmark doc, so it only outgrows the
    broadcast limit for a benchmark of hundreds of millions of items,
    at which point the eval suite itself needs sharding, not a flag.
    """
    t_sh = char_shingles(train, k).withColumnRenamed("doc_id", "train_id")
    b_sh = char_shingles(benchmark, k).withColumnRenamed("doc_id", "bench_id")
    b_sizes = b_sh.groupBy("bench_id").agg(F.count(F.lit(1)).alias("n_bench_sh"))
    # the benchmark shingle frame is hinted too (not just b_sizes): the
    # shingle join is the expensive one, and broadcasting the eval-suite
    # side means the 100 TB train shingle frame never shuffles on the
    # shingle value at all — its only wide exchange is the pair groupBy,
    # which is bounded by matched pairs (r5 batch review: the docstring
    # claimed this shape but only b_sizes carried the hint). Gating
    # b_sh on the flag matters because hinting it flipped the default
    # plan in r5: a benchmark shingle frame past Spark's 8 GB broadcast
    # hard limit now needs broadcast=False (corpus_job:
    # --no-broadcast-benchmark) where it previously shuffle-joined
    # silently. b_sizes stays hinted even then — one row per benchmark
    # doc, always bounded, and un-hinting it would re-shuffle the full
    # matched-pair frame on bench_id in exactly the constrained-memory
    # path the flag exists for.
    if broadcast:
        b_sh = F.broadcast(b_sh)
    b_sizes = F.broadcast(b_sizes)
    common = (
        t_sh.join(b_sh, "shingle")
        .groupBy("train_id", "bench_id")
        .agg(F.count(F.lit(1)).alias("n_common_shingles"))
    )
    return (
        common.join(b_sizes, "bench_id")
        .withColumn(
            "overlap_frac", F.col("n_common_shingles") / F.col("n_bench_sh")
        )
        .filter(F.col("overlap_frac") >= min_overlap_frac)
        .select("train_id", "bench_id", "n_common_shingles", "overlap_frac")
    )


def decontaminate(
    train: DataFrame,
    benchmark: DataFrame,
    k: int = 8,
    min_overlap_frac: float = 0.3,
    broadcast: bool = True,
) -> DataFrame:
    """Drop every train document flagged by :func:`contamination_pairs`.
    Returns the surviving train rows unchanged. ``broadcast`` passes
    through to :func:`contamination_pairs` — the escape hatch must be
    reachable from this public wrapper too, or a benchmark shingle
    frame too large to broadcast would force the OOM with no opt-out
    (the bounded per-doc sizes frame stays hinted either way; see
    :func:`contamination_pairs`)."""
    flagged = contamination_pairs(
        train, benchmark, k=k, min_overlap_frac=min_overlap_frac,
        broadcast=broadcast,
    ).select(F.col("train_id").alias("doc_id")).distinct()
    return train.join(flagged, "doc_id", "left_anti")


def conversations_to_documents(
    turns: DataFrame,
    conv_col: str = "conv_id",
    idx_col: str = "turn_idx",
    role_col: str = "role",
    text_col: str = "text",
    sep: str = "\n",
) -> DataFrame:
    """Assemble per-turn transcript rows into one training document per
    conversation — the bridge from the CDC target table (one row per
    (conv_id, turn_idx)) to the ``documents``-shaped corpus the
    curation/dedup/packing operators consume.

    Each turn renders as ``role: text`` (null text → empty string) and
    turns concatenate in ``turn_idx`` order regardless of input row
    order. Returns (conv_id, n_turns, n_chars, doc_text).

    Scale shape: ONE shuffle on ``conv_col`` (the groupBy), order
    restored per group with ``sort_array`` over collected structs —
    no global sort, no window; per-group memory is bounded by
    conversation length, which is bounded by construction in a turn
    table. Entirely native column algebra (codegen'd), so a SQL oracle
    (``string_agg ... ORDER BY``) verifies the assembly byte-for-byte.
    """
    turn_struct = F.struct(
        F.col(idx_col).alias("i"),
        F.concat_ws(
            ": ", F.col(role_col), F.coalesce(F.col(text_col), F.lit(""))
        ).alias("line"),
    )
    assembled = (
        turns.groupBy(F.col(conv_col).alias("conv_id"))
        .agg(
            F.count(F.lit(1)).alias("n_turns"),
            F.concat_ws(
                sep,
                F.transform(
                    F.sort_array(F.collect_list(turn_struct)),
                    lambda s: s["line"],
                ),
            ).alias("doc_text"),
        )
    )
    return assembled.select(
        "conv_id",
        "n_turns",
        F.length("doc_text").cast("long").alias("n_chars"),
        "doc_text",
    )
