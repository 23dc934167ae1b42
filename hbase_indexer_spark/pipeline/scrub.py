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


# Placeholder blocklist for the synthetic corpus (three mid-frequency
# vocabulary words, so at ppm thresholds around 10% some docs fail and
# most pass — both verdict branches get exercised).  Deployments
# substitute their own list; it remains a plan literal at any size a
# human-curated blocklist reaches.
DEFAULT_BLOCKLIST: list[str] = ["slow", "big", "batch"]


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


def blocklist_filter(docs: DataFrame,
                     words: list[str] | None = None,
                     max_ppm: int = 100_000) -> DataFrame:
    """Term-blocklist document filter — the classic web-corpus gate
    ("bad-word list") generalized to any pinned vocabulary: count how
    many whitespace tokens of each doc (case-folded) sit on the
    blocklist and keep the doc iff the blocked fraction stays under
    ``max_ppm`` parts-per-million.  The default list is a neutral
    placeholder wired to the synthetic corpus so both branches of the
    verdict are exercised — production swaps in its own list (it stays
    a broadcast-sized literal either way).

    Returns ``(doc_id, n_tokens, n_blocked, blocked_ppm, keep)``;
    ``blocked_ppm`` is integer micro-fraction (NULL for empty docs,
    which are kept — an empty doc contains nothing blockable).

    Scale: pure map — the list compiles into the plan as a literal
    array, one scan, zero shuffle, whole-stage codegen.
    """
    from hbase_indexer_spark.pipeline.text import stopword_hits, token_count

    words = [w.lower() for w in (words or DEFAULT_BLOCKLIST)]
    counted = docs.select(
        "doc_id",
        token_count(F.col("text")).alias("n_tokens"),
        stopword_hits(F.col("text"), words).alias("n_blocked"),
    )
    ppm = F.expr("(1000000 * cast(n_blocked as bigint))"
                 " div nullif(n_tokens, 0)")
    return counted.select(
        "doc_id", "n_tokens", "n_blocked",
        ppm.alias("blocked_ppm"),
        F.coalesce(ppm <= max_ppm, F.lit(True)).alias("keep"),
    )


def blocklist_filter_sql(words: list[str] | None = None,
                         max_ppm: int = 100_000) -> str:
    from hbase_indexer_spark.pipeline.dedup import TOKS_SQL

    words = [w.lower() for w in (words or DEFAULT_BLOCKLIST)]
    # '' doubling: a blocklist term containing an apostrophe must not
    # truncate the IN-list literal
    lst = ", ".join("'{}'".format(w.replace("'", "''")) for w in words)
    return f"""
        WITH c AS (
            SELECT doc_id,
                   len({TOKS_SQL}) AS n_tokens,
                   len(list_filter({TOKS_SQL},
                       t -> list_contains([{lst}], lower(t)))) AS n_blocked
            FROM documents
        )
        SELECT doc_id,
               CAST(n_tokens AS INTEGER) AS n_tokens,
               CAST(n_blocked AS INTEGER) AS n_blocked,
               CAST((1000000 * n_blocked) // NULLIF(n_tokens, 0)
                    AS BIGINT) AS blocked_ppm,
               coalesce((1000000 * n_blocked) // NULLIF(n_tokens, 0)
                        <= {max_ppm}, TRUE) AS keep
        FROM c
    """


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
