"""PII detection + redaction (Dolma/RefinedWeb-style scrubbing).

Public training-data pipelines scrub personally identifiable
information with regex taggers before release (Dolma's pii tagger,
RefinedWeb §2.5, BigScience ROOTS): emails, phone numbers, IP
addresses, national-id-shaped numbers, replaced by typed placeholder
tokens, with per-document counts kept for audit.

Scale shape: pure ``regexp_count`` / ``regexp_replace`` column algebra
— JVM-side, whole-stage codegen, one scan, no UDF. Patterns are
restricted to the syntax subset Java regex and RE2 share, so the whole
operator (counts AND redacted text) is value-checked against DuckDB
(``pii_scrub`` driver entry).

Replacement is SEQUENTIAL in ``PII_PATTERNS`` order and each pattern's
count is taken on the text state it actually sees (an email's digits
must not also count as a phone), mirroring how Dolma chains its
taggers.

reference: no analog in the reference app (SURVEY §2 "beyond the
reference").
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

# (name, pattern, replacement) — applied in order; patterns use only
# Java-regex ∩ RE2 syntax (no backrefs, no lookaround).
PII_PATTERNS: list[tuple[str, str, str]] = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ssn", r"[0-9]{3}-[0-9]{2}-[0-9]{4}", "<SSN>"),
    ("ipv4", r"([0-9]{1,3}\.){3}[0-9]{1,3}", "<IP>"),
    # digit, then >=7 of [digit - SPACE ( )], then digit — matches
    # +1 555..., (555) 01..., 555-0199-042; runs LAST so ids consumed
    # by the ssn/ipv4 patterns never double-count as phones. The class
    # uses a literal space, NOT \s: \s matches newlines, which glued
    # unrelated digit runs on adjacent lines into one "phone" and
    # shredded any newline-separated table of numbers (r5 operator
    # review) — a real phone number never spans a line break.
    ("phone", r"\+?[0-9][0-9\- ()]{7,}[0-9]", "<PHONE>"),
]


def scrub_pii(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Redact PII and count findings per document.

    Returns ``doc_id``, ``n_<type>`` per pattern, ``pii_total``, and
    ``clean_text`` (all placeholders applied, in pattern order).
    """
    t = F.coalesce(F.col(text_col), F.lit(""))
    counts = []
    for name, pat, repl in PII_PATTERNS:
        counts.append(F.regexp_count(t, F.lit(pat)).alias(f"n_{name}"))
        t = F.regexp_replace(t, pat, repl)
    total = None
    for name, _, _ in PII_PATTERNS:
        c = F.col(f"n_{name}")
        total = c if total is None else total + c
    return docs.select("doc_id", *counts, t.alias("clean_text")).withColumn(
        "pii_total", total
    )


def pii_oracle_sql(source_sql: str = "SELECT doc_id, text FROM documents") -> str:
    """DuckDB mirror of :func:`scrub_pii` over ``source_sql`` (must
    yield ``doc_id, text``). Chained CTEs reproduce the sequential
    count-then-replace semantics exactly."""
    stages = ["SELECT doc_id, coalesce(text, '') AS t0 FROM src"]
    names = []
    for i, (name, pat, repl) in enumerate(PII_PATTERNS):
        esc = pat.replace("'", "''")
        names.append(name)
        stages.append(
            f"SELECT *, len(regexp_extract_all(t{i}, '{esc}')) AS n_{name}, "
            f"regexp_replace(t{i}, '{esc}', '{repl}', 'g') AS t{i + 1} "
            f"FROM s{i}"
        )
    ctes = ",\n".join(
        f"s{i} AS ({sql})" for i, sql in enumerate(stages)
    )
    n_cols = ", ".join(f"n_{n}" for n in names)
    total = " + ".join(f"n_{n}" for n in names)
    last = len(PII_PATTERNS)
    return (
        f"WITH src AS ({source_sql}),\n{ctes}\n"
        f"SELECT doc_id, {n_cols}, t{last} AS clean_text, "
        f"{total} AS pii_total FROM s{last}"
    )
