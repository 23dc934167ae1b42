"""PII / pattern scrubbing for training-data pipelines.

Before text reaches a training corpus, pipelines redact personally
identifying patterns — emails, URLs, phone-shaped digit runs, bare
numbers.  This module implements that as a **pure Catalyst
``regexp_replace`` chain**: no Python in the row loop, whole-stage
codegen, zero shuffle — a 100 TB scrub costs exactly one scan.

Rules are (name, pattern, replacement) triples applied in declaration
order (order matters: EMAIL must run before NUMBER or the digits inside
an address get rewritten first).  Patterns stick to plain character
classes + bounded quantifiers so Java regex (Spark) and RE2-flavoured
DuckDB agree character-for-character; each rule also reports a match
count (taken BEFORE any replacement) so the scrub is auditable.

Reference analog: none — beyond-reference training-data surface, same
registry as pipeline.text / pipeline.curation.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# (name, pattern, replacement) — applied in this order.  Patterns are
# dual-engine safe: no backrefs, no lookaround, no \d-style classes
# (DuckDB's RE2 and Java agree on explicit [0-9] etc.).
DEFAULT_RULES: list[tuple[str, str, str]] = [
    ("email", "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+[.][A-Za-z][A-Za-z]+", "<EMAIL>"),
    ("url", "https?://[^ \\t\\n]+", "<URL>"),
    ("phone", "[+]?[0-9][0-9 ()-]{6,}[0-9]", "<PHONE>"),
    ("number", "[0-9]+", "<NUM>"),
]


def scrub_text(text: Column, rules: list[tuple[str, str, str]] | None = None) -> Column:
    """Apply the redaction chain to one column (all occurrences)."""
    out = text
    for _name, pattern, repl in rules or DEFAULT_RULES:
        out = F.regexp_replace(out, pattern, repl)
    return out


def scrub(df: DataFrame, text_col: str = "text",
          rules: list[tuple[str, str, str]] | None = None) -> DataFrame:
    """Scrubbed frame: every column of ``df``, plus ``<text_col>_scrubbed``
    and one ``n_<rule>`` match count per rule (counted on the original
    text — the audit trail for "how much PII did this corpus contain")."""
    rules = rules or DEFAULT_RULES
    cols = list(df.columns)
    counts = [
        F.size(F.regexp_extract_all(F.col(text_col), F.lit(pattern), F.lit(0)))
        .alias(f"n_{name}")
        for name, pattern, _repl in rules
    ]
    return df.select(
        *cols,
        scrub_text(F.col(text_col), rules).alias(f"{text_col}_scrubbed"),
        *counts,
    )


def scrub_sql(table: str, text_col: str = "text",
              rules: list[tuple[str, str, str]] | None = None,
              extra_cols: list[str] | None = None) -> str:
    """DuckDB mirror.  DuckDB's regexp_replace is first-match unless the
    'g' flag is passed; Spark's is always global — hence the explicit 'g'."""
    rules = rules or DEFAULT_RULES
    scrubbed = text_col
    for _name, pattern, repl in rules:
        scrubbed = f"regexp_replace({scrubbed}, '{pattern}', '{repl}', 'g')"
    counts = ", ".join(
        f"CAST(len(regexp_extract_all({text_col}, '{pattern}')) AS INTEGER) AS n_{name}"
        for name, pattern, _repl in rules
    )
    cols = ", ".join((extra_cols or []) + [text_col])
    return (f"SELECT {cols}, {scrubbed} AS {text_col}_scrubbed, {counts} "
            f"FROM {table}")
