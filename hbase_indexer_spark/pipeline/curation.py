"""Corpus curation operators: deterministic train/test splitting,
stratified sampling, and the composed clean-corpus query.

All selection is hash-based (md5-derived, seeded by an explicit salt), so:

- **no shuffle, no state**: every operator is a pure map over the corpus —
  the only shape that is trivially correct at 100 TB (a reservoir or
  rand()-based sampler is neither deterministic nor restart-safe);
- **stable under re-runs and appends**: a document's split/sample fate
  depends only on (doc_id, salt), never on partitioning, row order, or
  cluster size — re-running after adding data never migrates old docs
  across splits (the property training pipelines need to avoid test-set
  leakage);
- **cross-engine reproducible**: the same md5 arithmetic runs in DuckDB,
  so the t2 oracle matches bit-for-bit.

Reference analog: none (the reference has no sampling surface) — these are
part of the beyond-reference training-data operators, same registry surface
as pipeline.dedup / pipeline.text.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from hbase_indexer_spark.pipeline.text import token_hash60

SPLIT_BUCKETS = 10_000


def _bucket(doc_id: Column, salt: str) -> Column:
    """Deterministic bucket in [0, SPLIT_BUCKETS): 60-bit md5 hash of
    ``doc_id:salt`` — changing the salt re-deals every assignment."""
    key = F.concat(doc_id.cast("string"), F.lit(":" + salt))
    return token_hash60(key) % SPLIT_BUCKETS


def _bucket_sql(salt: str, doc_id: str = "doc_id") -> str:
    return (f"CAST(('0x' || substr(md5(CAST({doc_id} AS VARCHAR) || ':{salt}'),"
            f" 1, 15)) AS BIGINT) % {SPLIT_BUCKETS}")


def train_test_split(docs: DataFrame, test_frac: float = 0.1,
                     salt: str = "split-v1") -> DataFrame:
    """Assign every doc to 'train' or 'test' by hash bucket.  Pure
    projection — the split of 100 TB costs one scan, and a given doc_id
    lands in the same split on every run and every cluster."""
    cut = int(test_frac * SPLIT_BUCKETS)
    b = _bucket(F.col("doc_id"), salt)
    return docs.select(
        "doc_id",
        b.alias("bucket"),
        F.when(b < cut, F.lit("test")).otherwise(F.lit("train")).alias("split"),
    )


def train_test_split_sql(test_frac: float = 0.1,
                         salt: str = "split-v1") -> str:
    cut = int(test_frac * SPLIT_BUCKETS)
    b = _bucket_sql(salt)
    return f"""
        SELECT doc_id, {b} AS bucket,
               CASE WHEN {b} < {cut} THEN 'test' ELSE 'train' END AS split
        FROM documents
    """


def stratified_sample(docs: DataFrame, fracs: dict[str, float],
                      strat_col: str = "lang", default_frac: float = 0.0,
                      salt: str = "sample-v1") -> DataFrame:
    """Per-stratum Bernoulli sampling at deterministic hash rates — the
    'rebalance the language mix' primitive.  ``fracs`` maps stratum value →
    keep fraction; unlisted strata keep ``default_frac``.  Map-only: the
    stratum rate lookup is a literal CASE chain, not a join."""
    cut = F.lit(int(default_frac * SPLIT_BUCKETS))
    for value, frac in sorted(fracs.items()):
        cut = F.when(F.col(strat_col) == value,
                     F.lit(int(frac * SPLIT_BUCKETS))).otherwise(cut)
    return (
        docs.withColumn("_b", _bucket(F.col("doc_id"), salt))
        .filter(F.col("_b") < cut)
        .select("doc_id", strat_col, F.col("_b").alias("bucket"))
    )


def stratified_sample_sql(fracs: dict[str, float], strat_col: str = "lang",
                          default_frac: float = 0.0,
                          salt: str = "sample-v1") -> str:
    cases = " ".join(
        "WHEN {} = '{}' THEN {}".format(
            strat_col, v.replace("'", "''"), int(f * SPLIT_BUCKETS))
        for v, f in sorted(fracs.items())
    )
    cut = f"CASE {cases} ELSE {int(default_frac * SPLIT_BUCKETS)} END"
    b = _bucket_sql(salt)
    return f"""
        SELECT doc_id, {strat_col}, {b} AS bucket
        FROM documents
        WHERE {b} < {cut}
    """


def curated_corpus(docs: DataFrame, min_tokens: int = 10,
                   min_quality: float = 0.5,
                   dedup_threshold: float = 0.7) -> DataFrame:
    """The composed corpus-cleaning pipeline: per-doc profile filters
    (length + quality), exact-dedup keep-set, near-dup loser removal —
    each stage the scale-path variant (map-only profile, one hash shuffle
    for exact dedup, LSH-banded near-dup pairs).  Returns the surviving
    docs with their metrics, ready to feed tokenization."""
    from pyspark.sql import Window

    from hbase_indexer_spark.pipeline.dedup import minhash_lsh_dedup_pairs
    from hbase_indexer_spark.pipeline.text import quality_score, tokens

    t = tokens(F.col("text"))
    n = F.size(t)
    # profile metrics and the exact-dedup hash come out of ONE text scan;
    # the keep decision is a window-min over the hash (one shuffle), not a
    # second scan + self-semi-join — at 100 TB the text read is the cost
    profiled = (
        docs.select(
            "doc_id", "lang",
            n.alias("n_tokens"),
            quality_score(F.col("text"), n).alias("quality"),
            F.md5(F.col("text")).alias("h"),
        )
        .withColumn(
            "keep",
            F.col("doc_id") == F.min("doc_id").over(Window.partitionBy("h")))
        .filter((F.col("n_tokens") >= min_tokens)
                & (F.col("quality") >= min_quality)
                & F.col("keep"))
        .drop("h", "keep")
    )
    losers = (
        minhash_lsh_dedup_pairs(docs, threshold=dedup_threshold)
        .select(F.col("y").alias("doc_id")).distinct()
    )
    return (
        profiled
        .join(losers, "doc_id", "left_anti")
        .orderBy("doc_id")
    )


def curated_corpus_sql(min_tokens: int = 10, min_quality: float = 0.5,
                       dedup_threshold: float = 0.7) -> str:
    from hbase_indexer_spark.pipeline.dedup import TOKS_SQL, ngram_jaccard_sql
    from hbase_indexer_spark.pipeline.text import QUALITY_SQL

    return f"""
        WITH t AS (
            SELECT doc_id, lang, text, {TOKS_SQL} AS toks FROM documents
        ), t2 AS (
            SELECT doc_id, lang, text, toks, len(toks) AS n_tokens FROM t
        ), profiled AS (
            SELECT doc_id, lang, CAST(n_tokens AS INTEGER) AS n_tokens,
                   {QUALITY_SQL} AS quality
            FROM t2
            WHERE n_tokens >= {min_tokens} AND {QUALITY_SQL} >= {min_quality}
        ), keepers AS (
            SELECT min(doc_id) AS doc_id FROM documents GROUP BY md5(text)
        ), pairs AS ({ngram_jaccard_sql(dedup_threshold)}),
        losers AS (SELECT DISTINCT y AS doc_id FROM pairs)
        SELECT p.doc_id, p.lang, p.n_tokens, p.quality
        FROM profiled p
        JOIN keepers k ON p.doc_id = k.doc_id
        LEFT JOIN losers l ON p.doc_id = l.doc_id
        WHERE l.doc_id IS NULL
        ORDER BY p.doc_id
    """


def training_corpus(docs: DataFrame, min_tokens: int = 10,
                    min_quality: float = 0.5, dedup_threshold: float = 0.7,
                    ngram_n: int = 6, min_shared: int = 3,
                    test_frac: float = 0.1,
                    salt: str = "split-v1") -> DataFrame:
    """The full what-actually-feeds-the-tokenizer composition: the train
    split of the curated corpus (profile filters + exact dedup + LSH
    near-dup removal) minus benchmark-contaminated documents.

    Each stage is the scale-path variant, and every join added here is
    small-side: the split predicate is a map-only hash, the contaminated
    set is (flagged docs only) — an anti-join Spark broadcasts."""
    from hbase_indexer_spark.pipeline.decontam import decontaminate

    kept = curated_corpus(docs, min_tokens=min_tokens,
                          min_quality=min_quality,
                          dedup_threshold=dedup_threshold)
    cut = int(test_frac * SPLIT_BUCKETS)
    train_only = kept.filter(_bucket(F.col("doc_id"), salt) >= cut)
    contaminated = decontaminate(docs, n=ngram_n, min_shared=min_shared,
                                 test_frac=test_frac, salt=salt)
    return train_only.join(contaminated.select("doc_id"), "doc_id",
                           "left_anti")


def training_corpus_sql(min_tokens: int = 10, min_quality: float = 0.5,
                        dedup_threshold: float = 0.7, ngram_n: int = 6,
                        min_shared: int = 3, test_frac: float = 0.1,
                        salt: str = "split-v1") -> str:
    from hbase_indexer_spark.pipeline.decontam import decontaminate_sql

    cut = int(test_frac * SPLIT_BUCKETS)
    return f"""
        WITH curated AS ({curated_corpus_sql(min_tokens, min_quality,
                                             dedup_threshold)}),
        contaminated AS ({decontaminate_sql(ngram_n, min_shared,
                                            test_frac, salt)})
        SELECT c.*
        FROM curated c
        LEFT JOIN contaminated x ON c.doc_id = x.doc_id
        WHERE ({_bucket_sql(salt, 'c.doc_id')}) >= {cut}
          AND x.doc_id IS NULL
    """


# ---------------------------------------------------------------------------
# Temperature-scaled mixture resampling
# ---------------------------------------------------------------------------

def _keep_frac(n: Column, n_min: Column, alpha: float) -> Column:
    # keep_frac_g = (n_min / n_g) ^ (1 - alpha): the largest-keeping
    # rescale whose output mixture is proportional to n_g ^ alpha (the
    # smallest group keeps 100%).  alpha = 0.5 routes through sqrt, which
    # IEEE 754 rounds correctly in both the JVM and DuckDB, so the hash
    # cutoffs match the oracle bit-for-bit; general pow() is not
    # correctly rounded, so other alphas may flip a doc at an exact
    # cutoff boundary between engines (fine in production, noted for t2).
    if abs(alpha - 0.5) < 1e-12:
        return F.sqrt(n_min) / F.sqrt(n)
    return F.pow(n_min / n, F.lit(1.0 - alpha))


def mixture_resample(docs: DataFrame, alpha: float = 0.5,
                     group_col: str = "lang",
                     salt: str = "mixture-v1") -> DataFrame:
    """Rebalance the corpus mixture by temperature ``alpha``: downsample
    each ``group_col`` value so the surviving mixture is proportional to
    ``n_g ** alpha`` (multilingual-LM temperature sampling: alpha = 1
    keeps the natural mix, alpha = 0 equalizes groups), keeping the
    maximum possible data — the smallest group is never downsampled.

    Selection is the same deterministic md5 bucket as the split/sample
    operators (stable under re-runs, appends, and repartitioning).

    Scale: one map-side-combinable count per group (G rows), the group
    minimum as a window over that aggregate (G-row input, corpus-size
    independent), then a broadcast join of the G cutoffs back onto the
    corpus and a map-only bucket filter — one full scan, one tiny agg,
    no driver materialization.
    """
    from pyspark.sql import Window

    counts = docs.groupBy(group_col).agg(F.count("*").alias("n"))
    w_all = Window.partitionBy(F.lit(1))
    cuts = counts.select(
        group_col,
        F.floor(
            _keep_frac(F.col("n"), F.min("n").over(w_all).cast("double"),
                       alpha) * SPLIT_BUCKETS
        ).alias("cutoff"),
    )
    b = _bucket(F.col("doc_id"), salt)
    return (
        docs.select("doc_id", group_col, b.alias("bucket"))
        .join(F.broadcast(cuts), group_col)
        .filter(F.col("bucket") < F.col("cutoff"))
        .select("doc_id", group_col, "bucket", "cutoff")
    )


def mixture_resample_sql(alpha: float = 0.5, group_col: str = "lang",
                         salt: str = "mixture-v1") -> str:
    if abs(alpha - 0.5) < 1e-12:
        frac = "sqrt(mn) / sqrt(CAST(n AS DOUBLE))"
    else:
        frac = f"power(mn / CAST(n AS DOUBLE), {1.0 - alpha!r})"
    b = _bucket_sql(salt, "d.doc_id")
    return f"""
        WITH c AS (
            SELECT {group_col}, count(*) AS n FROM documents
            GROUP BY {group_col}
        ),
        r AS (
            SELECT {group_col},
                   CAST(floor({frac} * {SPLIT_BUCKETS}) AS BIGINT) AS cutoff
            FROM (SELECT {group_col}, n,
                         CAST(min(n) OVER () AS DOUBLE) AS mn FROM c)
        )
        SELECT d.doc_id, d.{group_col}, {b} AS bucket, r.cutoff
        FROM documents d JOIN r USING ({group_col})
        WHERE {b} < r.cutoff
    """


# ---------------------------------------------------------------------------
# Corpus health report
# ---------------------------------------------------------------------------

def corpus_report(docs: DataFrame, min_tokens: int = 50) -> DataFrame:
    """Per (source, lang) corpus health: doc/token volume, exact-duplicate
    rate, Gopher keep rate, and mean quality — the one-glance table a
    curation run is judged by.

    Columns: ``(source, lang, n_docs, n_tokens, uniq_texts, n_dup_docs,
    n_keep, quality_micro_mean)``.  Quality is snapped to integer
    micro-units per row before summing (float sums are
    partitioning-dependent; integer sums are exact), and the mean is an
    integer division.

    Scale: one scan computing all per-doc signals, then a single
    combinable aggregation on (source, lang); the distinct-text count
    rides the same shuffle via the two-phase count-distinct expand.
    """
    from hbase_indexer_spark.pipeline.text import (
        gopher_exprs,
        quality_score,
        token_count,
    )

    ex = gopher_exprs(min_tokens=min_tokens)
    n = token_count(F.col("text")).cast("long")
    per_doc = docs.select(
        "source", "lang",
        n.alias("n_tokens"),
        F.md5("text").alias("h"),
        F.when(n > 0,
               F.floor(quality_score(F.col("text"), n) * 1_000_000 + F.lit(0.5)))
        .otherwise(F.lit(0)).alias("q_micro"),
        ex["keep"].cast("long").alias("keep"),
    )
    return (
        per_doc.groupBy("source", "lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tokens").alias("n_tokens"),
            F.countDistinct("h").alias("uniq_texts"),
            (F.count("*") - F.countDistinct("h")).alias("n_dup_docs"),
            F.sum("keep").alias("n_keep"),
            F.expr("sum(q_micro) div count(*)").alias("quality_micro_mean"),
        )
    )


def corpus_report_sql(min_tokens: int = 50) -> str:
    from hbase_indexer_spark.pipeline.dedup import TOKS_SQL
    from hbase_indexer_spark.pipeline.text import gopher_rules_sql

    return f"""
        WITH g AS ({gopher_rules_sql(min_tokens)}),
        t AS (
            SELECT d.source, d.lang, d.text,
                   {TOKS_SQL.replace('text', 'd.text')} AS toks,
                   g.keep
            FROM documents d JOIN g USING (doc_id)
        ),
        t2 AS (
            SELECT source, lang, text, keep,
                   CAST(len(toks) AS BIGINT) AS n_tokens,
                   CASE WHEN len(toks) > 0 THEN
                       CAST(floor((
                           least(1.0, CAST(len(toks) AS DOUBLE) / 100.0) * 0.5
                           + CAST(len(list_distinct(toks)) AS DOUBLE)
                             / CAST(len(toks) AS DOUBLE) * 0.3
                           + CAST(len(list_filter(toks, x -> lower(x) IN
                               ('the','a','of','and','to','is'))) AS DOUBLE)
                             / CAST(len(toks) AS DOUBLE) * 0.2
                       ) * 1000000 + 0.5) AS BIGINT)
                   ELSE 0 END AS q_micro
            FROM t
        )
        SELECT source, lang,
               count(*) AS n_docs,
               CAST(sum(n_tokens) AS BIGINT) AS n_tokens,
               count(DISTINCT md5(text)) AS uniq_texts,
               count(*) - count(DISTINCT md5(text)) AS n_dup_docs,
               CAST(sum(CAST(keep AS BIGINT)) AS BIGINT) AS n_keep,
               CAST(sum(q_micro) // count(*) AS BIGINT) AS quality_micro_mean
        FROM t2 GROUP BY source, lang
    """


# ---------------------------------------------------------------------------
# Per-source token-budget sampling (mixture building by token count)
# ---------------------------------------------------------------------------

_BUDGET_HASH_BLOCKS = 4096


def token_budget_sample(docs: DataFrame, budget: int = 2000,
                        salt: str = "budget-v1") -> DataFrame:
    """Subsample every source down to a TOKEN budget (not a row count):
    walk each source's docs in deterministic salted-hash order and keep
    docs while the running token total is below ``budget`` — the doc
    that crosses the line is included, so a source always contributes at
    least one doc and its kept total is the smallest hash-prefix
    reaching the budget.  This is how training mixtures are actually
    specified ("20 B tokens of web, 5 B of code"), where row-count
    sampling over variable-length docs misses the target.

    Returns ``(doc_id, source, n_tokens, cum_before, kept)`` — a total
    assignment, auditable before materializing.

    Scale: the per-source running total never globally sorts a source.
    Docs land in 4096 hash-range blocks (uniform by construction);
    per-(source, block) token totals aggregate combinably, a window over
    those ~4096*S aggregate rows produces per-source block offsets, and
    the within-block cumsum is a block-partitioned window — the same
    two-level scan as ``pack_sequences``, keyed by source."""
    cum = group_cum_tokens(docs, group_col="source", salt=salt)
    return cum.select(
        "doc_id", "source", "n_tokens", "cum_before",
        (F.col("cum_before") < F.lit(budget)).alias("kept"),
    )


def group_cum_tokens(docs: DataFrame, group_col: str = "source",
                     salt: str = "budget-v1") -> DataFrame:
    """Per-group running token totals in deterministic salted-hash order:
    ``(doc_id, {group_col}, n_tokens, cum_before)`` via the two-level
    block scan (per-(group, block) combinable totals -> window over
    ~4096*G aggregate rows -> block-partitioned within-block cumsum) —
    shared by :func:`token_budget_sample` and :func:`epoch_expand`."""
    from hbase_indexer_spark.pipeline.text import token_count, token_hash60

    block_size = (1 << 60) // _BUDGET_HASH_BLOCKS
    key = F.concat(F.col("doc_id").cast("string"), F.lit(":" + salt))
    keyed = docs.select(
        "doc_id", group_col,
        token_count(F.col("text")).cast("long").alias("n_tokens"),
        token_hash60(key).alias("h"),
    ).withColumn("block", F.expr(f"h div {block_size}"))
    block_off = (
        keyed.groupBy(group_col, "block")
        .agg(F.sum("n_tokens").alias("bt"))
        .withColumn(
            "boff",
            F.coalesce(
                F.sum("bt").over(
                    Window.partitionBy(group_col).orderBy("block")
                    .rowsBetween(Window.unboundedPreceding, -1)),
                F.lit(0),
            ),
        )
        .drop("bt")
    )
    w = (Window.partitionBy(group_col, "block").orderBy("h", "doc_id")
         .rowsBetween(Window.unboundedPreceding, -1))
    return (
        keyed.join(F.broadcast(block_off), [group_col, "block"])
        .withColumn(
            "cum_before",
            F.col("boff") + F.coalesce(F.sum("n_tokens").over(w), F.lit(0)),
        )
        .select("doc_id", group_col, "n_tokens", "cum_before")
    )


def token_budget_sample_sql(budget: int = 2000,
                            salt: str = "budget-v1") -> str:
    from hbase_indexer_spark.pipeline.dedup import TOKS_SQL

    h = (f"CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':{salt}'),"
         f" 1, 15) AS BIGINT)")
    return f"""
        WITH tk AS (
            SELECT doc_id, source,
                   CAST(len({TOKS_SQL}) AS BIGINT) AS n_tokens,
                   {h} AS h
            FROM documents
        )
        SELECT doc_id, source, n_tokens,
               CAST(coalesce(sum(n_tokens) OVER (
                   PARTITION BY source ORDER BY h, doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
               ), 0) AS BIGINT) AS cum_before,
               coalesce(sum(n_tokens) OVER (
                   PARTITION BY source ORDER BY h, doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
               ), 0) < {budget} AS kept
        FROM tk
    """


def fixed_k_sample(docs: DataFrame, k: int = 5,
                   strat_col: str = "lang",
                   salt: str = "fixedk-v1") -> DataFrame:
    """Exactly ``min(k, n)`` documents per stratum, chosen as the k
    smallest salted hashes — the eval-set constructor (Bernoulli
    sampling can't promise "exactly 200 eval docs per language";
    this does, deterministically and append-stably: a doc's hash never
    changes, so adding corpus can only displace the current winners).

    Returns ``(doc_id, {strat_col}, rk)`` with ``rk`` in 1..k.

    Scale: per-stratum top-k by hash — Spark's WindowGroupLimit pushes
    the rank filter into a partial top-k per task (each task keeps k
    rows per stratum), so the shuffle carries at most
    ``k x n_strata x n_tasks`` rows, never the corpus."""
    h = token_hash60(
        F.concat(F.col("doc_id").cast("string"), F.lit(":" + salt)))
    return (
        docs.select("doc_id", strat_col, h.alias("_h"))
        .withColumn("rk", F.row_number().over(
            Window.partitionBy(strat_col).orderBy(F.col("_h").asc(),
                                                  F.col("doc_id").asc())))
        .filter(F.col("rk") <= k)
        .select("doc_id", strat_col, "rk")
    )


def fixed_k_sample_sql(k: int = 5, strat_col: str = "lang",
                       salt: str = "fixedk-v1") -> str:
    h = (f"CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':{salt}'),"
         f" 1, 15) AS BIGINT)")
    return f"""
        SELECT doc_id, {strat_col}, rk FROM (
            SELECT doc_id, {strat_col},
                   row_number() OVER (
                       PARTITION BY {strat_col} ORDER BY {h}, doc_id
                   ) AS rk
            FROM documents
        ) WHERE rk <= {k}
    """


def epoch_expand(docs: DataFrame, targets: dict[str, int],
                 group_col: str = "lang",
                 salt: str = "budget-v1") -> DataFrame:
    """Oversampling by token target: expand each group to ~``targets[g]``
    tokens by repeating the whole group ``target div available`` times
    (full epochs) plus the deterministic hash-prefix of the group that
    covers the remainder — the up-sampling half of mixture building
    (small high-quality sources are repeated for multiple epochs, e.g.
    Wikipedia x5 in GPT-3's mix), where ``mixture_resample`` /
    ``token_budget_sample`` only go down.

    Returns ``(doc_id, {group_col}, n_tokens, epoch)`` — one row per
    (doc, epoch), ``epoch`` 0-based; groups absent from ``targets`` get
    exactly their epoch-0 rows.  The remainder epoch includes the doc
    that crosses the remainder line iff its ``cum_before`` is under it
    (same crossing rule as ``token_budget_sample``), so every group
    with a nonzero remainder contributes at least one extra doc.

    Scale: per-group totals are one combinable agg (G rows, broadcast);
    the remainder cut reuses :func:`group_cum_tokens` (two-level block
    scan, no per-group sort); the explode emits exactly the training
    multiset, so downstream shuffles see the expanded stream only
    once."""
    cum = group_cum_tokens(docs, group_col=group_col, salt=salt)
    totals = cum.groupBy(group_col).agg(
        F.sum("n_tokens").alias("avail"))
    target_expr = F.create_map(
        *[F.lit(x) for kv in targets.items() for x in kv])
    planned = (
        cum.join(F.broadcast(totals), group_col)
        .withColumn("_target", target_expr[F.col(group_col)])
        .withColumn(
            "_full",
            F.when(F.col("_target").isNull() | (F.col("avail") == 0),
                   F.lit(1))
            .otherwise(F.expr("_target div avail")))
        .withColumn(
            "_rem",
            F.when(F.col("_target").isNull() | (F.col("avail") == 0),
                   F.lit(0))
            .otherwise(F.col("_target") % F.col("avail")))
        .withColumn(
            "_epochs",
            F.greatest(
                F.col("_full")
                + F.when(F.col("cum_before") < F.col("_rem"), 1)
                .otherwise(0),
                # a group targeted below one epoch still emits epoch 0
                # for its remainder-prefix docs; everything else drops
                F.lit(0)),
        )
    )
    return (
        planned.filter(F.col("_epochs") > 0)
        .select(
            "doc_id", group_col, "n_tokens",
            F.explode(F.sequence(F.lit(0), F.col("_epochs") - 1))
            .alias("epoch"),
        )
    )


def epoch_expand_sql(targets: dict[str, int], group_col: str = "lang",
                     salt: str = "budget-v1") -> str:
    from hbase_indexer_spark.pipeline.dedup import TOKS_SQL

    h = (f"CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':{salt}'),"
         f" 1, 15) AS BIGINT)")
    tgt = " ".join("WHEN '{}' THEN {}".format(g.replace("'", "''"), t)
                   for g, t in targets.items())
    return f"""
        WITH tk AS (
            SELECT doc_id, {group_col},
                   CAST(len({TOKS_SQL}) AS BIGINT) AS n_tokens,
                   {h} AS hh
            FROM documents
        ),
        cum AS (
            SELECT doc_id, {group_col}, n_tokens,
                   coalesce(sum(n_tokens) OVER (
                       PARTITION BY {group_col} ORDER BY hh, doc_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                   ), 0) AS cum_before,
                   sum(n_tokens) OVER (PARTITION BY {group_col}) AS avail
            FROM tk
        ),
        planned AS (
            SELECT doc_id, {group_col}, n_tokens, cum_before, avail,
                   CASE {group_col} {tgt} ELSE NULL END AS tgt
            FROM cum
        ),
        epochs AS (
            SELECT doc_id, {group_col}, n_tokens,
                   greatest(
                       CASE WHEN tgt IS NULL OR avail = 0 THEN 1
                            ELSE tgt // avail END
                       + CASE WHEN tgt IS NOT NULL AND avail > 0
                                   AND cum_before < tgt % avail
                              THEN 1 ELSE 0 END,
                       0) AS n_epochs
            FROM planned
        )
        SELECT doc_id, {group_col}, n_tokens,
               unnest(range(0, CAST(n_epochs AS INTEGER))) AS epoch
        FROM epochs WHERE n_epochs > 0
    """


def quality_deciles(docs: DataFrame, n_bins: int = 10,
                    group_col: str = "source") -> DataFrame:
    """Assign every document its quality decile WITHIN its group — the
    "train on the top 30% of each source" selector.  Uses the corpus-
    statistics quality proxy (token-count-normalized character entropy
    would also fit); bin b means the doc's score is above the
    ``b/n_bins`` group quantile.

    Two passes, neither sorting the corpus: (1) per-group exact
    interpolated quantile boundaries via ``percentile`` — a combinable
    aggregate producing G rows, broadcast; (2) a map-only comparison of
    each doc's score against its group's boundary array.  A window
    ``ntile`` would per-group-sort every doc instead.

    Ties sit in the highest bin whose lower boundary they meet, so
    equal scores always share a bin (ntile would split them
    arbitrarily).  Returns ``(doc_id, {group_col}, score_micro,
    decile)`` with decile in 1..n_bins; empty docs score 0.
    """
    from hbase_indexer_spark.pipeline.text import quality_score, token_count

    n_tok = token_count(F.col("text"))
    score = F.when(n_tok > 0, quality_score(F.col("text"), n_tok)) \
        .otherwise(F.lit(0.0))
    scored = docs.select(
        "doc_id", group_col,
        F.floor(score * F.lit(1_000_000.0) + F.lit(0.5))
        .cast("long").alias("score_micro"),
    )
    qs = [i / n_bins for i in range(1, n_bins)]
    bounds = scored.groupBy(group_col).agg(
        F.percentile(F.col("score_micro"), F.array(*[F.lit(q) for q in qs]))
        .alias("bounds"))
    joined = scored.join(F.broadcast(bounds), group_col)
    decile = F.lit(1) + F.size(F.filter(
        F.col("bounds"),
        lambda b: F.col("score_micro").cast("double") > b))
    return joined.select(
        "doc_id", group_col, "score_micro", decile.alias("decile"))


def quality_deciles_sql(n_bins: int = 10,
                        group_col: str = "source") -> str:
    from hbase_indexer_spark.pipeline.dedup import TOKS_SQL
    from hbase_indexer_spark.pipeline.text import QUALITY_SQL

    qs = ", ".join(str(i / n_bins) for i in range(1, n_bins))
    return f"""
        WITH tk AS (
            SELECT doc_id, {group_col}, {TOKS_SQL} AS toks,
                   len({TOKS_SQL}) AS n_tokens
            FROM documents
        ),
        scored AS (
            SELECT doc_id, {group_col},
                   CAST(floor(CASE WHEN n_tokens > 0
                        THEN ({QUALITY_SQL}) ELSE 0.0 END * 1000000.0 + 0.5)
                        AS BIGINT) AS score_micro
            FROM tk
        ),
        bounds AS (
            SELECT {group_col},
                   quantile_cont(score_micro, [{qs}]) AS bs
            FROM scored GROUP BY {group_col}
        )
        SELECT s.doc_id, s.{group_col}, s.score_micro,
               1 + len(list_filter(b.bs,
                       x -> CAST(s.score_micro AS DOUBLE) > x)) AS decile
        FROM scored s JOIN bounds b USING ({group_col})
    """


def curriculum_order(docs: DataFrame, n_bins: int = 4,
                     group_col: str = "source",
                     salt: str = "curriculum-v1",
                     easy_first: bool = True) -> DataFrame:
    """Deterministic curriculum training order: documents sorted by
    quality tier (within-group deciles from :func:`quality_deciles`),
    shuffled hash-uniformly INSIDE each tier — curriculum learning's
    "easy/clean first" schedule, with ``easy_first=False`` flipping to
    anti-curriculum.  Returns ``(doc_id, tier, pos)`` where ``pos`` is
    a dense permutation of 0..N-1.

    Scale: no global sort.  Tier offsets are one T-row aggregate
    (broadcast); within a tier the rank comes from the same hash-block
    two-level scan as ``shuffle_order`` (per-(tier, block) counts →
    window over T*4096 aggregate rows → block-partitioned
    row_number)."""
    from hbase_indexer_spark.pipeline.text import token_hash60

    tiers = quality_deciles(docs, n_bins=n_bins, group_col=group_col) \
        .select("doc_id", F.col("decile").alias("tier"))
    tier_key = (F.col("tier") if easy_first
                else (F.lit(n_bins + 1) - F.col("tier")))
    blocks = 4096
    block_size = (1 << 60) // blocks
    key = F.concat(F.col("doc_id").cast("string"), F.lit(":" + salt))
    keyed = tiers.select(
        "doc_id", tier_key.alias("_tk"), "tier",
        token_hash60(key).alias("h"),
    ).withColumn("block", F.expr(f"h div {block_size}"))
    block_off = (
        keyed.groupBy("_tk", "block").agg(F.count("*").alias("n"))
        .withColumn(
            "off",
            F.coalesce(
                F.sum("n").over(
                    Window.orderBy("_tk", "block")
                    .rowsBetween(Window.unboundedPreceding, -1)),
                F.lit(0),
            ),
        )
        .drop("n")
    )
    w = Window.partitionBy("_tk", "block").orderBy("h", "doc_id")
    return (
        keyed.join(F.broadcast(block_off), ["_tk", "block"])
        .select(
            "doc_id", "tier",
            (F.col("off") + F.row_number().over(w) - 1).alias("pos"),
        )
    )


def curriculum_order_sql(n_bins: int = 4, group_col: str = "source",
                         salt: str = "curriculum-v1",
                         easy_first: bool = True) -> str:
    h = (f"CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':{salt}'),"
         f" 1, 15)) AS BIGINT)")
    direction = "ASC" if easy_first else "DESC"
    return f"""
        WITH tiers AS (
            SELECT doc_id, decile AS tier
            FROM ({quality_deciles_sql(n_bins, group_col)})
        )
        SELECT doc_id, tier,
               row_number() OVER (
                   ORDER BY tier {direction}, {h}, doc_id
               ) - 1 AS pos
        FROM tiers
    """


def curation_lineage(docs: DataFrame, min_tokens: int = 10,
                     min_quality: float = 0.5,
                     dedup_threshold: float = 0.7) -> DataFrame:
    """Per-document provenance for :func:`curated_corpus`: which stage
    dropped each doc — the "why did my page disappear?" audit every
    curation pipeline owes its users.  ``dropped_by`` is the FIRST
    failing stage in pipeline order (``short`` | ``low_quality`` |
    ``exact_dup`` | ``near_dup`` | NULL for survivors), plus the raw
    per-stage verdicts so downstream dashboards can cross-tabulate.

    Drop-stage attribution matches curated_corpus exactly: a doc passes
    iff dropped_by IS NULL.

    Scale: identical cost shape to curated_corpus itself — one text
    scan for the profile+hash, one hash window, the banded pair set;
    the extra columns are free."""
    from pyspark.sql import Window as W

    from hbase_indexer_spark.pipeline.dedup import minhash_lsh_dedup_pairs
    from hbase_indexer_spark.pipeline.text import quality_score, tokens

    t = tokens(F.col("text"))
    n = F.size(t)
    profiled = (
        docs.select(
            "doc_id",
            n.alias("n_tokens"),
            quality_score(F.col("text"), n).alias("quality"),
            F.md5(F.col("text")).alias("h"),
        )
        .withColumn(
            "exact_keep",
            F.col("doc_id") == F.min("doc_id").over(W.partitionBy("h")))
        .drop("h")
    )
    losers = (
        minhash_lsh_dedup_pairs(docs, threshold=dedup_threshold)
        .select(F.col("y").alias("doc_id")).distinct()
        .withColumn("near_loser", F.lit(True))
    )
    j = profiled.join(losers, "doc_id", "left")
    return j.select(
        "doc_id", "n_tokens",
        "exact_keep",
        F.coalesce("near_loser", F.lit(False)).alias("near_loser"),
        F.when(F.col("n_tokens") < min_tokens, "short")
        .when(F.col("quality") < min_quality, "low_quality")
        .when(~F.col("exact_keep"), "exact_dup")
        .when(F.coalesce("near_loser", F.lit(False)), "near_dup")
        .alias("dropped_by"),
    )


def curation_lineage_sql(min_tokens: int = 10, min_quality: float = 0.5,
                         dedup_threshold: float = 0.7) -> str:
    from hbase_indexer_spark.pipeline.dedup import TOKS_SQL, ngram_jaccard_sql
    from hbase_indexer_spark.pipeline.text import QUALITY_SQL

    return f"""
        WITH tk AS (
            SELECT doc_id, text, {TOKS_SQL} AS toks,
                   len({TOKS_SQL}) AS n_tokens
            FROM documents
        ),
        prof AS (
            SELECT doc_id, n_tokens,
                   CASE WHEN n_tokens > 0 THEN ({QUALITY_SQL})
                        ELSE 0.0 END AS quality,
                   doc_id = min(doc_id) OVER (PARTITION BY md5(text))
                       AS exact_keep
            FROM tk
        ),
        pairs AS ({ngram_jaccard_sql(dedup_threshold)}),
        losers AS (SELECT DISTINCT y AS doc_id FROM pairs)
        SELECT p.doc_id, p.n_tokens, p.exact_keep,
               (l.doc_id IS NOT NULL) AS near_loser,
               CASE WHEN p.n_tokens < {min_tokens} THEN 'short'
                    WHEN p.quality < {min_quality} THEN 'low_quality'
                    WHEN NOT p.exact_keep THEN 'exact_dup'
                    WHEN l.doc_id IS NOT NULL THEN 'near_dup'
               END AS dropped_by
        FROM prof p LEFT JOIN losers l ON p.doc_id = l.doc_id
    """


def snapshot_diff(base: DataFrame, new: DataFrame,
                  group_col: str = "source") -> DataFrame:
    """Corpus snapshot diff by content hash, per group: how many docs
    each source added, removed, or carried over between two snapshots —
    the release-notes table for a corpus publish ("web refreshed 40%,
    books unchanged").

    Returns ``({group_col}, n_added, n_removed, n_unchanged)``.
    A doc counts as unchanged when its exact content hash appears in
    both snapshots (doc_id may differ — re-crawls renumber).

    Scale: both snapshots reduce to (group, hash) — one map pass each —
    and the verdict is a full-outer join on the hash pairs; text never
    crosses the shuffle."""
    a = base.select(F.col(group_col).alias("grp"),
                    F.md5("text").alias("h")).distinct() \
        .withColumn("in_a", F.lit(1))
    b = new.select(F.col(group_col).alias("grp"),
                   F.md5("text").alias("h")).distinct() \
        .withColumn("in_b", F.lit(1))
    return (
        a.join(b, ["grp", "h"], "full_outer")
        .groupBy(F.col("grp").alias(group_col))
        .agg(
            F.sum(F.when(F.col("in_a").isNull(), 1).otherwise(0))
            .alias("n_added"),
            F.sum(F.when(F.col("in_b").isNull(), 1).otherwise(0))
            .alias("n_removed"),
            F.sum(F.when(F.col("in_a").isNotNull()
                         & F.col("in_b").isNotNull(), 1).otherwise(0))
            .alias("n_unchanged"),
        )
    )


def snapshot_diff_sql(base_pred: str = "doc_id % 2 = 0",
                      new_pred: str = "doc_id % 2 = 1",
                      group_col: str = "source") -> str:
    return f"""
        WITH a AS (
            SELECT DISTINCT {group_col} AS grp, md5(text) AS h
            FROM documents WHERE {base_pred}
        ),
        b AS (
            SELECT DISTINCT {group_col} AS grp, md5(text) AS h
            FROM documents WHERE {new_pred}
        ),
        j AS (
            SELECT coalesce(a.grp, b.grp) AS grp,
                   (a.h IS NOT NULL) AS in_a, (b.h IS NOT NULL) AS in_b
            FROM a FULL OUTER JOIN b ON a.grp = b.grp AND a.h = b.h
        )
        SELECT grp AS {group_col},
               CAST(sum(CASE WHEN NOT in_a THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_added,
               CAST(sum(CASE WHEN NOT in_b THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_removed,
               CAST(sum(CASE WHEN in_a AND in_b THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_unchanged
        FROM j GROUP BY grp
    """


def psi_drift(base: DataFrame, new: DataFrame,
              group_col: str = "source",
              boundaries: tuple[int, ...] = (16, 32, 48, 64, 96)) -> DataFrame:
    """Population Stability Index per source between two corpus
    snapshots, over the token-length distribution — the standard data-
    drift monitor: PSI = sum_bins (p_new - p_old) * ln(p_new / p_old).
    Rule of thumb: < 0.1 stable, 0.1-0.25 shifting, > 0.25 the source
    changed character (crawler broke, domain pivoted) and needs review
    before the next training mix.

    Docs bin by ``#(boundaries <= n_tokens)``; bin shares are Laplace-
    smoothed ((c+1)/(n+B), B = #bins) so empty bins never divide by
    zero, and bins empty on BOTH sides contribute exactly 0 (p_new ==
    p_old), so only bins observed on at least one side materialize.
    Per-bin terms are floored to integer micro-PSI *before* the sum
    (the repo's cross-engine fixed-point convention), making the
    result hash-stable: ``(source, n_base, n_new, n_bins, psi_micro)``.

    Scale: each snapshot reduces to (source, bin) counts in one
    combinable pass; the verdict is a full-outer join + one aggregation
    over |sources| x |bins| rows — corpus text never shuffles."""
    n_bins = len(boundaries) + 1

    def binned(df: DataFrame, cname: str) -> DataFrame:
        bucket = sum(
            (F.when(token_count_col() >= b, 1).otherwise(0)
             for b in boundaries),
            F.lit(0),
        )
        return (
            df.select(F.col(group_col).alias("grp"), bucket.alias("bin"))
            .groupBy("grp", "bin")
            .agg(F.count(F.lit(1)).alias(cname))
        )

    a, b = binned(base, "c_a"), binned(new, "c_b")
    per_bin = (
        a.join(b, ["grp", "bin"], "full_outer")
        .fillna(0, subset=["c_a", "c_b"])
    )
    # per-source totals as a window over the |sources| x |bins| aggregate
    # (NOT a second aggregation + join — that would re-scan the corpus)
    wg = Window.partitionBy("grp")
    per_bin = (
        per_bin
        .withColumn("n_base", F.sum("c_a").over(wg))
        .withColumn("n_new", F.sum("c_b").over(wg))
        .withColumn("obs_bins", F.count(F.lit(1)).over(wg))
    )
    p_a = (F.col("c_a") + 1).cast("double") / (F.col("n_base") + n_bins)
    p_b = (F.col("c_b") + 1).cast("double") / (F.col("n_new") + n_bins)
    term = F.floor(1_000_000 * (p_b - p_a) * F.log(p_b / p_a))
    return (
        per_bin.groupBy(F.col("grp").alias(group_col))
        .agg(
            F.first("n_base").alias("n_base"),
            F.first("n_new").alias("n_new"),
            F.first("obs_bins").alias("n_bins"),
            F.sum(term).alias("psi_micro"),
        )
    )


def psi_drift_sql(base_pred: str = "doc_id % 2 = 0",
                  new_pred: str = "doc_id % 2 = 1",
                  group_col: str = "source",
                  boundaries: tuple[int, ...] = (16, 32, 48, 64, 96)) -> str:
    from hbase_indexer_spark.pipeline.dedup import TOKS_SQL

    n_bins = len(boundaries) + 1
    bucket = " + ".join(
        f"CASE WHEN n_tokens >= {b} THEN 1 ELSE 0 END" for b in boundaries)
    return f"""
        WITH tk AS (
            SELECT doc_id, {group_col} AS grp,
                   len({TOKS_SQL}) AS n_tokens
            FROM documents
        ),
        a AS (
            SELECT grp, {bucket} AS bin, count(*) AS c_a
            FROM tk WHERE {base_pred} GROUP BY 1, 2
        ),
        b AS (
            SELECT grp, {bucket} AS bin, count(*) AS c_b
            FROM tk WHERE {new_pred} GROUP BY 1, 2
        ),
        j AS (
            SELECT coalesce(a.grp, b.grp) AS grp,
                   coalesce(a.bin, b.bin) AS bin,
                   coalesce(c_a, 0) AS c_a, coalesce(c_b, 0) AS c_b
            FROM a FULL OUTER JOIN b ON a.grp = b.grp AND a.bin = b.bin
        ),
        t AS (
            SELECT grp, sum(c_a) AS n_base, sum(c_b) AS n_new,
                   count(*) AS n_bins
            FROM j GROUP BY grp
        )
        SELECT j.grp AS {group_col},
               CAST(any_value(t.n_base) AS BIGINT) AS n_base,
               CAST(any_value(t.n_new) AS BIGINT) AS n_new,
               CAST(any_value(t.n_bins) AS BIGINT) AS n_bins,
               CAST(sum(floor(1000000
                   * (CAST(j.c_b + 1 AS DOUBLE) / (t.n_new + {n_bins})
                      - CAST(j.c_a + 1 AS DOUBLE) / (t.n_base + {n_bins}))
                   * ln((CAST(j.c_b + 1 AS DOUBLE) / (t.n_new + {n_bins}))
                        / (CAST(j.c_a + 1 AS DOUBLE)
                           / (t.n_base + {n_bins})))))
                   AS BIGINT) AS psi_micro
        FROM j JOIN t ON j.grp = t.grp
        GROUP BY j.grp
    """


def corpus_summary(docs: DataFrame) -> DataFrame:
    """One-row executive summary of a corpus snapshot: volumes, source/
    language breadth, and the exact-duplicate rate — the number that
    opens every corpus review.  ``dup_pct`` is an integer percent of
    docs that are NOT the first copy of their content.

    Scale: one scan with combinable aggregates; the distinct-hash count
    rides the same pass (two-phase count distinct)."""
    return (
        docs.select(
            "doc_id", "source", "lang",
            F.md5("text").alias("h"),
            token_count_col(),
            F.length("text").alias("_chars"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("_tok").alias("n_tokens"),
            F.sum("_chars").alias("n_chars"),
            F.countDistinct("source").alias("n_sources"),
            F.countDistinct("lang").alias("n_langs"),
            F.countDistinct("h").alias("n_distinct"),
        )
        .select(
            "n_docs", "n_tokens", "n_chars", "n_sources", "n_langs",
            (F.col("n_docs") - F.col("n_distinct")).alias("n_dup_docs"),
            F.expr("(100 * (n_docs - n_distinct)) div n_docs")
            .alias("dup_pct"),
        )
    )


def token_count_col():
    from hbase_indexer_spark.pipeline.text import token_count

    return token_count(F.col("text")).cast("long").alias("_tok")


def corpus_summary_sql() -> str:
    from hbase_indexer_spark.pipeline.dedup import TOKS_SQL

    return f"""
        SELECT count(*) AS n_docs,
               CAST(sum(CAST(len({TOKS_SQL}) AS BIGINT)) AS BIGINT) AS n_tokens,
               CAST(sum(CAST(len(text) AS BIGINT)) AS BIGINT) AS n_chars,
               count(DISTINCT source) AS n_sources,
               count(DISTINCT lang) AS n_langs,
               count(*) - count(DISTINCT md5(text)) AS n_dup_docs,
               CAST((100 * (count(*) - count(DISTINCT md5(text)))) // count(*)
                   AS BIGINT) AS dup_pct
        FROM documents
    """


# ---------------------------------------------------------------------------
# Filter ablation: which gate is killing the data?
# ---------------------------------------------------------------------------

def filter_ablation(docs: DataFrame,
                    quality_threshold_micro: int = 150_000) -> DataFrame:
    """Per-gate ablation across the quality-filter stack: every document
    gets a verdict bit from each of the four public gates — C4 line
    cleaning (doc gate), Gopher rules, intra-doc repetition, and the
    hashed-n-gram quality model — and the report aggregates doc/token
    counts per bit PATTERN, so "which filter is killing my data" (and
    which combinations overlap) is one query.

    Repetition gate: dup-word fraction <= 0.3 AND dup-bigram fraction
    <= 0.2, in cross-multiplied integers (no float ratios).  Docs with
    no bigrams pass the bigram leg.

    Returns ``(c4_keep, gopher_keep, rep_keep, quality_keep, n_docs,
    n_tokens)`` — one row per observed pattern (<= 16).

    Scale: composes the existing gate operators and joins their per-doc
    verdicts on doc_id (the audit reads the corpus a few times — at
    100 TB materialize the per-gate verdict table once and point every
    audit at it); the final aggregation is <= 16 groups, fully
    combinable."""
    from hbase_indexer_spark.pipeline.text import (
        c4_line_clean, gopher_rules, quality_model_scores,
        repetition_stats)

    c4 = c4_line_clean(docs).select(
        "doc_id", F.col("keep").cast("int").alias("c4_keep"))
    gop = gopher_rules(docs).select(
        "doc_id", F.col("n_tokens"),
        F.col("keep").cast("int").alias("gopher_keep"))
    rep = repetition_stats(docs).select(
        "doc_id",
        ((F.col("n_words") > 0)
         & (F.col("dup_word_count") * 10 <= F.col("n_words") * 3)
         & ((F.col("n_bigrams") == 0)
            | (F.col("dup_bigram_count") * 10 <= F.col("n_bigrams") * 2)))
        .cast("int").alias("rep_keep"))
    qual = quality_model_scores(docs).select(
        "doc_id",
        (F.col("logit_micro") >= quality_threshold_micro)
        .cast("int").alias("quality_keep"))
    return (
        # rep joins LEFT: repetition_stats emits no row for empty docs
        # (its gram explode produces nothing), and a verdict grid that
        # silently loses documents under-reports — empty docs fail the
        # n_words > 0 leg, so their rep bit is 0
        gop.join(c4, "doc_id").join(rep, "doc_id", "left")
        .join(qual, "doc_id")
        .withColumn("rep_keep", F.coalesce("rep_keep", F.lit(0)))
        .groupBy("c4_keep", "gopher_keep", "rep_keep", "quality_keep")
        .agg(F.count(F.lit(1)).cast("long").alias("n_docs"),
             F.sum("n_tokens").cast("long").alias("n_tokens"))
    )


def filter_ablation_sql(quality_threshold_micro: int = 150_000) -> str:
    from hbase_indexer_spark.pipeline.text import (
        c4_line_clean_sql, gopher_rules_sql, quality_model_scores_sql,
        repetition_sql)

    return f"""
        WITH c4r AS ({c4_line_clean_sql()}),
        gr AS ({gopher_rules_sql()}),
        rr AS ({repetition_sql()}),
        qr AS ({quality_model_scores_sql()})
        SELECT CAST(c4r.keep AS INTEGER) AS c4_keep,
               CAST(CASE WHEN gr.keep THEN 1 ELSE 0 END AS INTEGER)
                   AS gopher_keep,
               CAST(CASE WHEN rr.n_words > 0
                         AND rr.dup_word_count * 10 <= rr.n_words * 3
                         AND (rr.n_bigrams = 0
                              OR rr.dup_bigram_count * 10
                                 <= rr.n_bigrams * 2)
                    THEN 1 ELSE 0 END AS INTEGER) AS rep_keep,  -- NULL
                    -- rr row (empty doc) falls to ELSE 0, matching the
                    -- Spark left join's coalesced 0
               CAST(CASE WHEN qr.logit_micro >= {quality_threshold_micro}
                    THEN 1 ELSE 0 END AS INTEGER) AS quality_keep,
               CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(gr.n_tokens) AS BIGINT) AS n_tokens
        FROM gr
        JOIN c4r ON gr.doc_id = c4r.doc_id
        LEFT JOIN rr ON gr.doc_id = rr.doc_id
        JOIN qr ON gr.doc_id = qr.doc_id
        GROUP BY 1, 2, 3, 4
    """


def quality_ensemble(docs: DataFrame, bins: int = 256) -> DataFrame:
    """Multi-signal quality ensemble WITHOUT a corpus rank sort: each of
    three independent per-doc signals — the heuristic quality score
    (higher better), character entropy per char (higher = diverse, not
    boilerplate), and unigram-LM NLL per token (LOWER = more typical) —
    is equi-width binned into ``bins`` positions against its corpus
    min/max (one broadcast aggregate row), and the ensemble is the mean
    bin position scaled to micro.  This is the scale-first substitute
    for rank-averaging: a per-signal ``row_number`` over the corpus is a
    global sort per signal, while binning is map-only after one
    combinable (min, max) pass.  (Equi-width is not equi-depth: a
    heavy-tailed signal crowds bins — acceptable for a combiner whose
    job is cross-signal agreement, and the per-signal bins are emitted
    so the spread is auditable.)

    All-integer after the signals themselves (micro fixed point), so
    the DuckDB oracle replays exact values.  Docs with no tokens carry
    no signals and are excluded (state them via `corpus_report`).

    Returns ``(doc_id, q_bin, ent_bin, typ_bin, ensemble_micro)`` where
    ``typ_bin`` is the INVERTED nll bin (bins-1 - bin) so that in every
    column larger = better.
    """
    from hbase_indexer_spark.pipeline.corpus_stats import unigram_logprob
    from hbase_indexer_spark.pipeline.text import (
        char_entropy,
        quality_score,
        token_count,
    )

    if bins < 2:
        raise ValueError("bins must be >= 2")
    n_tok = token_count(F.col("text"))
    q = docs.filter(n_tok > 0).select(
        "doc_id",
        F.floor(quality_score(F.col("text"), n_tok) * F.lit(1_000_000.0)
                + F.lit(0.5)).cast("long").alias("q_micro"))
    ent = char_entropy(docs).select(
        "doc_id", F.col("entropy_micro_per_char").alias("ent_micro"))
    nll = unigram_logprob(docs).select(
        "doc_id", F.col("nll_micro_per_token").alias("nll_micro"))
    sig = (q.join(ent, "doc_id").join(nll, "doc_id")
           .filter(F.col("ent_micro").isNotNull()
                   & F.col("nll_micro").isNotNull()))
    ranges = sig.agg(
        F.min("q_micro").alias("q_lo"), F.max("q_micro").alias("q_hi"),
        F.min("ent_micro").alias("e_lo"), F.max("ent_micro").alias("e_hi"),
        F.min("nll_micro").alias("n_lo"), F.max("nll_micro").alias("n_hi"))
    j = sig.crossJoin(F.broadcast(ranges))

    def bin_of(v: str, lo: str, hi: str):
        return F.expr(f"(({v} - {lo}) * {bins}) div ({hi} - {lo} + 1)")

    binned = j.select(
        "doc_id",
        bin_of("q_micro", "q_lo", "q_hi").alias("q_bin"),
        bin_of("ent_micro", "e_lo", "e_hi").alias("ent_bin"),
        (F.lit(bins - 1) - bin_of("nll_micro", "n_lo", "n_hi"))
        .alias("typ_bin"),
    )
    return binned.select(
        "doc_id", "q_bin", "ent_bin", "typ_bin",
        F.expr(f"((q_bin + ent_bin + typ_bin) * 1000000)"
               f" div (3 * {bins - 1})").alias("ensemble_micro"))


def quality_ensemble_sql(bins: int = 256) -> str:
    from hbase_indexer_spark.pipeline.corpus_stats import unigram_logprob_sql
    from hbase_indexer_spark.pipeline.dedup import TOKS_SQL
    from hbase_indexer_spark.pipeline.text import QUALITY_SQL, char_entropy_sql

    return f"""
        WITH t0 AS (
            SELECT doc_id, text, {TOKS_SQL} AS toks FROM documents
        ),
        t1 AS (
            SELECT doc_id, text, toks, len(toks) AS n_tokens FROM t0
            WHERE len(toks) > 0
        ),
        q AS (
            SELECT doc_id,
                   CAST(floor(({QUALITY_SQL}) * 1000000.0 + 0.5) AS BIGINT)
                       AS q_micro
            FROM t1
        ),
        ce AS ({char_entropy_sql()}),
        ul AS ({unigram_logprob_sql()}),
        sig AS (
            SELECT q.doc_id, q.q_micro,
                   ce.entropy_micro_per_char AS ent_micro,
                   ul.nll_micro_per_token AS nll_micro
            FROM q
            JOIN ce ON q.doc_id = ce.doc_id
            JOIN ul ON q.doc_id = ul.doc_id
            WHERE ce.entropy_micro_per_char IS NOT NULL
              AND ul.nll_micro_per_token IS NOT NULL
        ),
        rg AS (
            SELECT min(q_micro) AS q_lo, max(q_micro) AS q_hi,
                   min(ent_micro) AS e_lo, max(ent_micro) AS e_hi,
                   min(nll_micro) AS n_lo, max(nll_micro) AS n_hi
            FROM sig
        ),
        binned AS (
            SELECT doc_id,
                   ((q_micro - rg.q_lo) * {bins}) // (rg.q_hi - rg.q_lo + 1)
                       AS q_bin,
                   ((ent_micro - rg.e_lo) * {bins}) // (rg.e_hi - rg.e_lo + 1)
                       AS ent_bin,
                   {bins - 1} - ((nll_micro - rg.n_lo) * {bins})
                       // (rg.n_hi - rg.n_lo + 1) AS typ_bin
            FROM sig, rg
        )
        SELECT doc_id, CAST(q_bin AS BIGINT) AS q_bin,
               CAST(ent_bin AS BIGINT) AS ent_bin,
               CAST(typ_bin AS BIGINT) AS typ_bin,
               CAST(((q_bin + ent_bin + typ_bin) * 1000000)
                    // (3 * {bins - 1}) AS BIGINT) AS ensemble_micro
        FROM binned
    """


# ---------------------------------------------------------------------------
# k-anonymity audit (r8): privacy-risk governance over quasi-identifiers
# ---------------------------------------------------------------------------

def k_anonymity_audit(df: DataFrame, quasi_cols: list[str],
                      k: int = 5) -> DataFrame:
    """k-anonymity audit over a quasi-identifier combination — the
    privacy-governance pass a training-data pipeline runs before
    release: every row whose quasi-identifier tuple is shared by fewer
    than ``k`` rows is re-identifiable at confidence 1/count.

    Returns one row per quasi-identifier GROUP below the threshold:
    ``(*quasi_cols, n_rows, risk_ppm)`` where ``risk_ppm`` is the
    re-identification probability ``1e6 div n_rows``.  NULL identifier
    values group together (they are still a linkable signature).

    Scale: ONE combinable aggregation keyed by the quasi tuple and a
    post-agg filter — map-side partials make this a single shuffle of
    group-sized data however wide the table; no row-level output ever
    leaves the executors."""
    counts = (df.groupBy(*quasi_cols)
              .agg(F.count(F.lit(1)).alias("n_rows")))
    return (counts.filter(F.col("n_rows") < k)
            .withColumn("risk_ppm",
                        F.expr("1000000 div n_rows").cast("long"))
            .orderBy(*quasi_cols))


def k_anonymity_audit_sql(quasi_exprs: dict[str, str], k: int,
                          table: str) -> str:
    """DuckDB mirror: ``quasi_exprs`` maps output column -> SQL expr."""
    sel = ", ".join(f"{e} AS {c}" for c, e in quasi_exprs.items())
    cols = ", ".join(quasi_exprs)
    return f"""
        WITH q AS (SELECT {sel} FROM {table}),
        g AS (
            SELECT {cols}, CAST(count(*) AS BIGINT) AS n_rows
            FROM q GROUP BY {cols}
        )
        SELECT {cols}, n_rows,
               CAST(1000000 // n_rows AS BIGINT) AS risk_ppm
        FROM g WHERE n_rows < {k}
        ORDER BY {cols}
    """


def l_diversity_audit(df: DataFrame, quasi_cols: list[str],
                      sensitive_col: str, l: int = 3) -> DataFrame:
    """l-diversity audit (r9) — k-anonymity's companion check
    (Machanavajjhala et al.): a quasi-identifier group can be large
    enough to pass k-anonymity yet still leak the SENSITIVE attribute
    when every member shares one value (the homogeneity attack).  A
    group is l-diverse when it contains at least ``l`` distinct
    well-represented sensitive values; this audit returns the groups
    below that bar.

    Returns one row per failing group: ``(*quasi_cols, n_rows,
    n_sensitive, top_sensitive_ppm)`` where ``n_sensitive`` counts
    distinct non-NULL sensitive values and ``top_sensitive_ppm`` is the
    most-common value's share of the group in ppm (the attacker's
    posterior confidence under homogeneity).  NULL sensitive values
    are not diversity (an absent diagnosis reveals nothing to hide) but
    still count toward group size.

    Scale: two combinable aggregations — (quasi, sensitive) counts,
    then the group rollup — both group-sized shuffles; exact distinct
    via the two-phase reduction, never a row-level window."""
    per_val = (df.groupBy(*quasi_cols, sensitive_col)
               .agg(F.count(F.lit(1)).alias("_n")))
    grp = (per_val.groupBy(*quasi_cols)
           .agg(F.sum("_n").cast("long").alias("n_rows"),
                F.count(F.when(F.col(sensitive_col).isNotNull(), 1))
                .cast("long").alias("n_sensitive"),
                F.max(F.when(F.col(sensitive_col).isNotNull(),
                             F.col("_n"))).alias("_top")))
    return (grp.filter(F.col("n_sensitive") < l)
            .withColumn(
                "top_sensitive_ppm",
                F.expr("1000000 * coalesce(_top, 0) div n_rows")
                .cast("long"))
            .drop("_top")
            .orderBy(*quasi_cols))


def l_diversity_audit_sql(quasi_exprs: dict[str, str],
                          sensitive_expr: str, l: int,
                          table: str) -> str:
    """DuckDB mirror of :func:`l_diversity_audit`."""
    sel = ", ".join(f"{e} AS {c}" for c, e in quasi_exprs.items())
    cols = ", ".join(quasi_exprs)
    return f"""
        WITH q AS (SELECT {sel}, {sensitive_expr} AS sv FROM {table}),
        pv AS (
            SELECT {cols}, sv, count(*) AS n FROM q GROUP BY {cols}, sv
        ),
        g AS (
            SELECT {cols},
                   CAST(sum(n) AS BIGINT) AS n_rows,
                   CAST(count(CASE WHEN sv IS NOT NULL THEN 1 END)
                        AS BIGINT) AS n_sensitive,
                   max(CASE WHEN sv IS NOT NULL THEN n END) AS top_n
            FROM pv GROUP BY {cols}
        )
        SELECT {cols}, n_rows, n_sensitive,
               CAST((1000000 * coalesce(top_n, 0)) // n_rows AS BIGINT)
                   AS top_sensitive_ppm
        FROM g WHERE n_sensitive < {l}
        ORDER BY {cols}
    """


def t_closeness_audit(df: DataFrame, quasi_cols: list[str],
                      sensitive_col: str,
                      t_ppm: int = 300_000) -> DataFrame:
    """t-closeness audit (r9) — the third leg of the release-privacy
    triad (Li et al.): a group can be k-anonymous AND l-diverse yet
    still leak when its sensitive-value DISTRIBUTION diverges from the
    corpus-wide one (the skewness attack: 90% 'flu' in a group vs 1%
    globally is a strong inference even with several distinct values).
    For categorical attributes the variational distance IS the EMD
    under uniform ground distance; computed here in EXACT integer
    arithmetic:

        tv_ppm = 1e6 * sum_v |c_gv*n - c_v*n_g|  div  (2 * n_g * n)

    (common denominator n_g*n — no floats, so both engines agree
    bit-for-bit).  Values absent from a group still contribute
    |0 - c_v*n_g|; NULL sensitive values are treated as one more
    category (an absent value is itself a distribution signal here,
    unlike l-diversity's well-representedness count) — normalized to a
    NUL-byte sentinel string so the category joins like any other
    (NULL never equi-joins, in either engine).

    Returns groups with ``tv_ppm > t_ppm``: ``(*quasi_cols, n_rows,
    tv_ppm)``.

    Scale: (quasi, value) counts + a broadcast of the VALUE-sized
    global distribution + one group rollup — two combinable shuffles of
    group-sized data and one tiny dim join; the groups x values frame
    is |groups| * |distinct values| rows, both census-sized."""
    sv = F.coalesce(F.col(sensitive_col).cast("string"), F.lit("\x00"))
    base = df.select(*quasi_cols, sv.alias("_sv"))
    n_total = base.count()
    per_val = (base.groupBy(*quasi_cols, "_sv")
               .agg(F.count(F.lit(1)).alias("_cgv")))
    glob = base.groupBy("_sv").agg(F.count(F.lit(1)).alias("_cv"))
    grp = (per_val.groupBy(*quasi_cols)
           .agg(F.sum("_cgv").cast("long").alias("n_rows")))
    # every (group, value) cell, including values the group lacks
    cells = (grp.crossJoin(F.broadcast(glob))
             .join(per_val, [*quasi_cols, "_sv"], "left")
             .na.fill({"_cgv": 0}))
    dev = (cells.groupBy(*quasi_cols, "n_rows")
           .agg(F.sum(F.abs(F.col("_cgv") * F.lit(n_total)
                            - F.col("_cv") * F.col("n_rows")))
                .alias("_dev")))
    return (dev.withColumn(
                "tv_ppm",
                F.expr(f"(1000000 * _dev) div (2 * n_rows * {n_total})")
                .cast("long"))
            .filter(F.col("tv_ppm") > t_ppm)
            .select(*quasi_cols, "n_rows", "tv_ppm")
            .orderBy(*quasi_cols))


def t_closeness_audit_sql(quasi_exprs: dict[str, str],
                          sensitive_expr: str, t_ppm: int,
                          table: str) -> str:
    """DuckDB mirror of :func:`t_closeness_audit`."""
    sel = ", ".join(f"{e} AS {c}" for c, e in quasi_exprs.items())
    cols = ", ".join(quasi_exprs)
    return f"""
        WITH q AS (SELECT {sel},
                          coalesce(CAST({sensitive_expr} AS VARCHAR),
                                   chr(0)) AS sv
                   FROM {table}),
        tot AS (SELECT count(*) AS n FROM q),
        pv AS (
            SELECT {cols}, sv, CAST(count(*) AS BIGINT) AS cgv
            FROM q GROUP BY {cols}, sv
        ),
        gv AS (SELECT sv, CAST(count(*) AS BIGINT) AS cv FROM q GROUP BY sv),
        g AS (SELECT {cols}, CAST(sum(cgv) AS BIGINT) AS n_rows
              FROM pv GROUP BY {cols}),
        cells AS (
            SELECT g.*, gv.sv, gv.cv, coalesce(pv.cgv, 0) AS cgv
            FROM g CROSS JOIN gv
            LEFT JOIN pv USING ({cols}, sv)
        ),
        dev AS (
            SELECT {cols}, n_rows,
                   CAST(sum(abs(cgv * tot.n - cv * n_rows)) AS BIGINT)
                       AS d
            FROM cells, tot GROUP BY {cols}, n_rows, tot.n
        )
        SELECT {cols}, n_rows,
               CAST((1000000 * d) // (2 * n_rows * (SELECT n FROM tot))
                    AS BIGINT) AS tv_ppm
        FROM dev
        WHERE (1000000 * d) // (2 * n_rows * (SELECT n FROM tot)) > {t_ppm}
        ORDER BY {cols}
    """
