"""Text-analysis operators for large-scale training-data pipelines.

All operators are pure Catalyst expressions over a ``text`` column — no
Python in the row loop — and each has a deterministic DuckDB-SQL mirror
(exported next to it) so results are oracle-checkable bit-for-bit.

Cross-engine hashing primitive: the first 60 bits of md5, read as a signed
64-bit integer — identical in Spark (``conv(substr(md5(x),1,15),16,10)``)
and DuckDB (``CAST('0x'||substr(md5(x),1,15) AS BIGINT)``).

Scale notes: everything here is scan -> narrow ops (no shuffle except the
per-source aggregation); fingerprint/langid run inside whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

MOD = 1_000_000_007

# deterministic stopword sets for the lang-id heuristic (checked in a fixed
# order so ties break identically in Spark and SQL)
STOPWORDS = {
    "en": ["the", "a", "of", "and", "to", "is"],
    "es": ["el", "la", "de", "y", "que", "en"],
    "de": ["der", "die", "das", "und", "ist", "ein"],
}
LANG_ORDER = ["en", "es", "de"]


def tokens(text: Column) -> Column:
    """Whitespace tokenization, empty tokens dropped (mirrors
    ``list_filter(string_split_regex(text,'\\s+'), x -> x <> '')``)."""
    return F.filter(F.split(text, r"\s+"), lambda t: t != "")


def token_hash60(col: Column) -> Column:
    """60-bit md5-derived token hash (cross-engine reproducible)."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def token_count(text: Column) -> Column:
    return F.size(tokens(text))


def stopword_hits(text: Column, words: list[str]) -> Column:
    return F.size(F.filter(tokens(text), lambda t: F.lower(t).isin(words)))


def lang_id(text: Column) -> Column:
    """n-gram/stopword language heuristic: argmax of per-language stopword
    hits, first-listed language wins ties (deterministic CASE chain)."""
    scores = {lang: stopword_hits(text, STOPWORDS[lang]) for lang in LANG_ORDER}
    expr = F.lit(LANG_ORDER[-1])
    # build the CASE chain back-to-front so earlier langs win ties
    for lang in reversed(LANG_ORDER[:-1]):
        later = [scores[o] for o in LANG_ORDER[LANG_ORDER.index(lang) + 1:]]
        cond = None
        for other in later:
            c = scores[lang] >= other
            cond = c if cond is None else (cond & c)
        expr = F.when(cond, F.lit(lang)).otherwise(expr)
    return expr


def lang_id_sql(text: str = "text") -> str:
    def hits(lang):
        words = ", ".join(f"'{w}'" for w in STOPWORDS[lang])
        return (f"len(list_filter(list_filter(string_split_regex({text},'\\s+'), x -> x <> ''), "
                f"t -> lower(t) IN ({words})))")

    s = {lang: hits(lang) for lang in LANG_ORDER}
    return (f"CASE WHEN {s['en']} >= {s['es']} AND {s['en']} >= {s['de']} THEN 'en' "
            f"WHEN {s['es']} >= {s['de']} THEN 'es' ELSE 'de' END")


def quality_score(text: Column, n_tokens: Column) -> Column:
    """Deterministic quality heuristic: length saturation x lexical
    diversity x stopword presence (double arithmetic, same op order as the
    SQL mirror)."""
    uniq_ratio = F.size(F.array_distinct(tokens(text))).cast("double") / n_tokens.cast("double")
    stop_ratio = stopword_hits(text, STOPWORDS["en"]).cast("double") / n_tokens.cast("double")
    len_sat = F.least(F.lit(1.0), n_tokens.cast("double") / F.lit(100.0))
    return len_sat * F.lit(0.5) + uniq_ratio * F.lit(0.3) + stop_ratio * F.lit(0.2)


QUALITY_SQL = (
    "least(1.0, CAST(n_tokens AS DOUBLE) / 100.0) * 0.5"
    " + CAST(len(list_distinct(toks)) AS DOUBLE) / CAST(n_tokens AS DOUBLE) * 0.3"
    " + CAST(len(list_filter(toks, t -> lower(t) IN ('the','a','of','and','to','is'))) AS DOUBLE)"
    "   / CAST(n_tokens AS DOUBLE) * 0.2"
)


def fingerprint(text: Column) -> Column:
    """Document fingerprint: polynomial rolling hash over characters,
    mod 1e9+7 (stays < 2**35, ANSI-overflow-safe; codegen'd fold)."""
    chars = F.filter(F.split(text, ""), lambda c: c != "")
    return F.aggregate(
        chars,
        F.lit(0).cast("long"),
        lambda acc, ch: (acc * 31 + F.ascii(ch)) % MOD,
    )


FINGERPRINT_SQL = (
    "list_reduce(list_prepend(CAST(0 AS BIGINT), "
    "list_transform(list_filter(string_split(text,''), c -> c <> ''), "
    "c -> CAST(ascii(c) AS BIGINT))), (acc, ch) -> (acc * 31 + ch) % 1000000007)"
)


def text_profile(docs: DataFrame) -> DataFrame:
    """Per-document text analysis record: tokens, language, quality,
    fingerprint — the per-doc stage of a data-curation pipeline."""
    t = tokens(F.col("text"))
    n = F.size(t)
    return docs.select(
        "doc_id",
        n.alias("n_tokens"),
        lang_id(F.col("text")).alias("lang_pred"),
        quality_score(F.col("text"), n).alias("quality"),
        fingerprint(F.col("text")).alias("fp"),
    )


# ---------------------------------------------------------------------------
# Token statistics (whitespace + BPE-ish regex counting)
# ---------------------------------------------------------------------------

# GPT-2-flavoured pre-tokenizer shape: letter runs | digit runs | single
# non-space symbols.  Plain character classes only, so Java regex (Spark)
# and RE2-ish (DuckDB) agree character-for-character.
BPE_TOKEN_REGEX = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9 \\t\\n\\r]"


def token_stats(docs: DataFrame) -> DataFrame:
    """Per-doc token counts: whitespace tokens and BPE-ish regex tokens
    (the cheap proxy for 'how many LLM tokens is this corpus')."""
    return docs.select(
        "doc_id",
        token_count(F.col("text")).alias("n_tokens_ws"),
        F.size(F.regexp_extract_all(F.col("text"), F.lit(BPE_TOKEN_REGEX), F.lit(0)))
        .alias("n_tokens_bpe"),
        F.length("text").alias("n_chars"),
    )


TOKEN_STATS_SQL = f"""
    SELECT doc_id,
           CAST(len(list_filter(string_split_regex(text, '\\s+'), x -> x <> '')) AS INTEGER) AS n_tokens_ws,
           CAST(len(regexp_extract_all(text, '{BPE_TOKEN_REGEX}')) AS INTEGER) AS n_tokens_bpe,
           CAST(length(text) AS INTEGER) AS n_chars
    FROM documents
"""
