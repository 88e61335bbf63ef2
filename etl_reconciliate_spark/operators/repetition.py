"""Repetition / boilerplate detection (Gopher-style quality signals).

Rae et al. (Gopher, 2021) appendix A1 filters documents by repetition:
duplicate-line fraction, duplicate-line character fraction, and the
character fraction covered by the most frequent word n-gram. These are
the standard "repetitive junk" gates every public corpus pipeline
(Gopher/RefinedWeb/Dolma) applies after exact/near dedup.

Scale shape: every metric is computed with higher-order array functions
(``transform``/``filter``/``aggregate``) over the per-document token /
line arrays — pure column algebra inside whole-stage codegen, ONE scan,
no explode, no shuffle, no UDF. The per-document work is O(tokens ×
distinct bigrams), bounded by document length, and parallelizes
embarrassingly; at 100 TB this is the same plan, just more partitions.

All metrics mirror exactly in DuckDB (list lambdas), so the operator is
value-checked end-to-end (``text_repetition`` driver entry).

reference: no analog in the reference app (its scope ends at
reconciliation; see SURVEY §2 "beyond the reference").
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

# Gopher A1 thresholds (duplicate line fraction 0.30, duplicate line
# character fraction 0.20, top word-2-gram character fraction 0.20).
DUP_LINE_FRAC_MAX = 0.30
DUP_LINE_CHAR_FRAC_MAX = 0.20
TOP_BIGRAM_CHAR_FRAC_MAX = 0.20


def with_repetition(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-document repetition metrics + the Gopher pass/fail flag.

    Output columns (``doc_id`` + all double unless noted):

    * ``n_tokens`` / ``n_lines`` (int) — whitespace tokens; non-blank
      newline-separated lines;
    * ``dup_token_frac`` — ``1 - distinct_tokens / tokens``;
    * ``dup_line_frac`` — ``1 - distinct_lines / lines``;
    * ``dup_line_char_frac`` — characters in repeat occurrences of a
      line (occurrences beyond the first of each distinct value) over
      all line characters;
    * ``top_bigram_char_frac`` — ``max over distinct word-2-grams of
      (count × len(bigram))`` over total characters (the join space
      counts with the bigram, as in the Gopher definition);
    * ``repetitive`` (bool) — any Gopher threshold exceeded.
    """
    from etl_reconciliate_spark.operators.textstats import NWS_RE, token_array

    t = F.coalesce(F.col(text_col), F.lit(""))
    # token_array is the SHARED tokenization (textstats) — the previous
    # local trim-based split leaked empty-string tokens on tab/newline
    # edges ('\n\n' counted 3 phantom tokens with dup_token_frac 2/3)
    # and could silently diverge from token_count (r5 operator review).
    # The blank-line test is any-non-whitespace (NWS_RE — the explicit
    # class, not \S, which Java and RE2 define differently around \x0B),
    # not length(trim(x)) — trim strips only spaces, so a tab-only line
    # used to count as content.
    d = docs.select(
        "doc_id",
        F.length(t).alias("nc"),
        token_array(t).alias("toks"),
        F.filter(
            F.split(t, "\n"), lambda x: x.rlike(NWS_RE)
        ).alias("lines"),
    )
    d = d.withColumn(
        "bg",
        F.expr(
            "CASE WHEN size(toks) >= 2 THEN "
            "transform(slice(toks, 1, size(toks)-1), (x, i) -> "
            "concat(x, ' ', toks[i+1])) ELSE array() END"
        ),
    )
    n_tokens = F.expr("size(toks)")
    n_lines = F.expr("size(lines)")
    line_chars = F.expr(
        "aggregate(lines, 0L, (acc, x) -> acc + length(x))"
    )
    dist_line_chars = F.expr(
        "aggregate(array_distinct(lines), 0L, (acc, x) -> acc + length(x))"
    )
    top_bg_chars = F.expr(
        "coalesce(array_max(transform(array_distinct(bg), d -> "
        "size(filter(bg, x -> x = d)) * length(d))), 0)"
    )
    frac = lambda num, den: (  # noqa: E731 — local ratio-with-guard
        F.when(den > 0, num.cast("double") / den).otherwise(F.lit(0.0))
    )
    out = d.select(
        "doc_id",
        n_tokens.alias("n_tokens"),
        n_lines.alias("n_lines"),
        frac(n_tokens - F.expr("size(array_distinct(toks))"), n_tokens)
        .alias("dup_token_frac"),
        frac(n_lines - F.expr("size(array_distinct(lines))"), n_lines)
        .alias("dup_line_frac"),
        frac(line_chars - dist_line_chars, line_chars)
        .alias("dup_line_char_frac"),
        frac(top_bg_chars, F.greatest(F.col("nc"), F.lit(1)))
        .alias("top_bigram_char_frac"),
    )
    return out.withColumn(
        "repetitive",
        (F.col("dup_line_frac") > DUP_LINE_FRAC_MAX)
        | (F.col("dup_line_char_frac") > DUP_LINE_CHAR_FRAC_MAX)
        | (F.col("top_bigram_char_frac") > TOP_BIGRAM_CHAR_FRAC_MAX),
    )


def repetition_oracle_sql(source_sql: str = "SELECT doc_id, text FROM documents") -> str:
    """DuckDB mirror of :func:`with_repetition` over ``source_sql``
    (which must yield ``doc_id, text``). The token array is the shared
    ``textstats.sql_token_array`` mirror."""
    from etl_reconciliate_spark.operators.textstats import NWS_RE, sql_token_array

    return rf"""
WITH src AS ({source_sql}),
base AS (
  SELECT doc_id,
    length(coalesce(text, '')) AS nc,
    {sql_token_array("coalesce(text, '')")} AS toks,
    list_filter(string_split(coalesce(text, ''), chr(10)),
                x -> regexp_matches(x, '{NWS_RE}')) AS lines
  FROM src
), b AS (
  SELECT *, CASE WHEN len(toks) >= 2 THEN
      list_transform(toks[1:len(toks)-1], (x, i) -> x || ' ' || toks[i+1])
    ELSE [] END AS bg
  FROM base
), m AS (
  SELECT doc_id, nc,
    len(toks) AS n_tokens,
    len(lines) AS n_lines,
    len(toks) - len(list_distinct(toks)) AS dup_toks,
    len(lines) - len(list_distinct(lines)) AS dup_lines,
    CAST(coalesce(list_aggregate(list_transform(lines, x -> length(x)), 'sum'), 0)
      AS BIGINT) AS line_chars,
    CAST(coalesce(list_aggregate(list_transform(list_distinct(lines),
      x -> length(x)), 'sum'), 0) AS BIGINT) AS dist_line_chars,
    coalesce(list_max(list_transform(list_distinct(bg),
      d -> len(list_filter(bg, x -> x = d)) * length(d))), 0) AS top_bg_chars
  FROM b
)
SELECT doc_id, n_tokens, n_lines,
  CASE WHEN n_tokens > 0
       THEN CAST(dup_toks AS DOUBLE) / n_tokens ELSE 0.0 END AS dup_token_frac,
  CASE WHEN n_lines > 0
       THEN CAST(dup_lines AS DOUBLE) / n_lines ELSE 0.0 END AS dup_line_frac,
  CASE WHEN line_chars > 0
       THEN CAST(line_chars - dist_line_chars AS DOUBLE) / line_chars
       ELSE 0.0 END AS dup_line_char_frac,
  CAST(top_bg_chars AS DOUBLE) / greatest(nc, 1) AS top_bigram_char_frac,
  (CASE WHEN n_lines > 0
        THEN CAST(dup_lines AS DOUBLE) / n_lines ELSE 0.0 END
     > {DUP_LINE_FRAC_MAX})
  OR (CASE WHEN line_chars > 0
           THEN CAST(line_chars - dist_line_chars AS DOUBLE) / line_chars
           ELSE 0.0 END > {DUP_LINE_CHAR_FRAC_MAX})
  OR (CAST(top_bg_chars AS DOUBLE) / greatest(nc, 1)
     > {TOP_BIGRAM_CHAR_FRAC_MAX}) AS repetitive
FROM m
"""
