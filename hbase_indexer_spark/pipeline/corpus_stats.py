"""Corpus-statistics document scorers: per-doc TF-IDF keyterms and a
CCNet-style unigram language-model score.

Both operators weigh each document's tokens against global corpus
frequencies — the classic "how typical / how informative is this text"
signals a curation pipeline ranks and filters on.

**Fixed-point discipline.**  Log-weights are snapped to integer
micro-units (``floor(1e6 * ln(...))``) the moment they are computed, and
every downstream aggregate is integer arithmetic.  Float addition is not
associative, so a ``sum(double)`` over a shuffled corpus is neither
deterministic across runs nor reproducible in another engine; integer
sums are both.  The only float op left is one ``ln`` per *vocabulary
term* (not per token), and its 1-ulp platform wiggle is absorbed by the
floor except when the product sits within ~1e-10 of an integer —
validated empirically against DuckDB at every gate scale.

Scale notes (100 TB):

- term frequencies are one combinable ``(doc_id, token)`` aggregation;
  document/corpus frequencies aggregate *that* (token-keyed, combinable).
  Catalyst column-prunes the df/weight branch down to a term-only scan,
  so the plan reads the text twice (each branch cheaper than a shared
  unpruned exchange); at 100 TB, materialize ``term_freqs`` once and
  feed both consumers from parquet instead;
- the per-token weight table is one row per vocabulary term.  It joins
  back on the token key; hot terms (stopwords) are heavy on the tf side
  but single-row on the weight side, the shape AQE's skew-join handles;
- top-k extraction windows by ``doc_id`` — partitioned, no global sort;
- corpus scalars (doc count / token count) are one cheap auxiliary agg
  embedded as literals, never a full-table window.

Reference analog: none — beyond-reference training-data operators, same
registry surface as pipeline.text / pipeline.curation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from hbase_indexer_spark.pipeline.text import tokens

MICRO = 1_000_000


def term_freqs(docs: DataFrame) -> DataFrame:
    """``(doc_id, term, tf)`` — one combinable aggregation over the
    exploded token stream."""
    return (
        docs.select("doc_id", F.explode(tokens(F.col("text"))).alias("term"))
        .groupBy("doc_id", "term")
        .agg(F.count("*").alias("tf"))
    )


def tfidf_topk(docs: DataFrame, k: int = 5) -> DataFrame:
    """Top-``k`` TF-IDF terms per document.

    ``score_micro = tf * floor(1e6 * (ln((N+1)/(df+1)) + 1))`` (smoothed
    idf in integer micro-units); rank is dense per doc by
    ``(score_micro DESC, term ASC)`` — the term tiebreak makes the
    cutoff deterministic.  Returns ``(doc_id, rank, term, tf,
    score_micro)``; docs with fewer than ``k`` distinct terms emit fewer
    rows, empty docs none.
    """
    n_docs = docs.count()
    tf = term_freqs(docs)
    idf = tf.groupBy("term").agg(
        F.floor(
            MICRO
            * (F.log((F.lit(float(n_docs + 1)))
                     / (F.count("*") + F.lit(1)).cast("double"))
               + F.lit(1.0))
        ).alias("w_micro")
    )
    scored = (
        tf.join(idf, "term")
        .withColumn("score_micro", F.col("tf") * F.col("w_micro"))
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.col("score_micro").desc(), F.col("term"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("doc_id", "rank", "term", "tf", "score_micro")
    )


def tfidf_topk_sql(k: int = 5) -> str:
    from hbase_indexer_spark.pipeline.dedup import TOKS_SQL

    return f"""
        WITH tf AS (
            SELECT doc_id, t.term, count(*) AS tf
            FROM (SELECT doc_id, unnest({TOKS_SQL}) AS term
                  FROM documents) t
            GROUP BY doc_id, t.term
        ),
        idf AS (
            SELECT term,
                   CAST(floor({MICRO} * (
                       ln(((SELECT count(*) FROM documents) + 1.0)
                          / CAST(count(*) + 1 AS DOUBLE)) + 1.0
                   )) AS BIGINT) AS w_micro
            FROM tf GROUP BY term
        ),
        scored AS (
            SELECT tf.doc_id, tf.term, tf.tf,
                   tf.tf * idf.w_micro AS score_micro
            FROM tf JOIN idf USING (term)
        ),
        ranked AS (
            SELECT doc_id, term, tf, score_micro,
                   CAST(row_number() OVER (
                       PARTITION BY doc_id
                       ORDER BY score_micro DESC, term
                   ) AS INTEGER) AS rank
            FROM scored
        )
        SELECT doc_id, rank, term, tf, score_micro
        FROM ranked WHERE rank <= {k}
    """


BM25_K1_MILLI = 1200  # k1 = 1.2 in integer milli
BM25_B_MILLI = 750    # b  = 0.75 in integer milli


def bm25_topk(docs: DataFrame, queries: list[tuple[int, str]],
              k: int = 10) -> DataFrame:
    """BM25 retrieval: top-``k`` documents per query, exact fixed-point
    scores — the sparse-retrieval primitive next to the dense ANN family
    (the classic hybrid-search pair; also the standard hard-negative
    miner for embedding-model training data).

    ``score(q, d) = sum over distinct query terms t of
    idf(t) * tf * (k1 + 1) / (tf + k1 * (1 - b + b * dl/avgdl))`` with
    the Robertson-Sparck-Jones idf ``ln((N - df + 0.5)/(df + 0.5) + 1)``
    (the +1 keeps it positive, Lucene-style).  Everything after the one
    ``ln`` per vocabulary term is integer micro-unit arithmetic on
    non-negative operands (the module's fixed-point discipline), so the
    DuckDB mirror replays the identical scores:

    - ``ratio_micro = (dl * N * 1e6) div total_len``     (dl/avgdl)
    - ``denom_micro = tf*1e6 + (k1‰ * (1000 - b‰)*1000
                                + k1‰ * b‰ * ratio_micro div 1000) ...``
      — see the expression; every div is on non-negative ints
    - ``term_score_micro = (idf_micro * (k1‰+1000) * tf * 1000)
                            div denom_micro``

    Query texts tokenize through the SAME recipe as documents (one
    Spark-side ``tokens()`` pass over the query literals), distinct
    terms per query (query-term multiplicity is ignored — standard when
    queries are short).  Rank ties break by doc_id ascending.

    Returns ``(query_id, doc_id, rank, score_micro)``.

    Scale shape: postings = one combinable (doc_id, term) aggregation;
    df aggregates that (term-keyed); the query side is tiny and
    BROADCAST into the postings join, so per query the cost is the
    postings of its terms only (an inverted-index probe, not a corpus
    scan); top-k windows by query — partitioned, no global sort.
    Corpus scalars (N, total_len) are one auxiliary aggregate."""
    spark = docs.sparkSession
    return _bm25_from_tf(spark, term_freqs(docs), docs.count(), queries, k)


BM25_TF_CAP = 50_000  # tf saturation bound: keeps every product in int64


def _bm25_from_tf(spark, tf: DataFrame, n_docs: int,
                  queries: list[tuple[int, str]], k: int,
                  total_len: int | None = None) -> DataFrame:
    """Shared BM25 scoring core over a ``(doc_id, term, tf)`` postings
    frame — used by the ad-hoc path (tf built from the docs scan) and
    the indexed path (tf read from the postings store).

    Fixed-point domain (r6 self-review, the histogram_quantiles lesson
    applied preemptively): ``dl/avgdl`` divides by the PRE-COMPUTED
    integer mean doc length (``avgdl = total_len div N``, floored,
    >= 1) rather than forming ``dl * N * 1e6`` — that triple product
    wraps int64 once corpus_tokens x doc_tokens passes ~9.2e12, i.e.
    at exactly 100 TB scale.  ``tf`` is capped at ``BM25_TF_CAP``
    (BM25's tf term saturates toward idf*(k1+1) anyway), which bounds
    the score numerator at ~3e18 < 2^63 even for ln(N)-sized idf."""
    dl = tf.groupBy("doc_id").agg(F.sum("tf").alias("dl"))
    if total_len is None:
        # collect(), not first(): first() is limit(1) and Spark's
        # incremental limit-scaling can run several partial jobs even over
        # a 1-row global aggregate (the incremental.replay lesson)
        total_len = tf.agg(F.sum("tf")).collect()[0][0] or 0
    if total_len == 0:
        return spark.createDataFrame(
            [], "query_id long, doc_id long, rank int, score_micro long")
    avgdl = max(1, total_len // max(1, n_docs))
    dfreq = tf.groupBy("term").agg(F.count("*").alias("df"))
    idf = dfreq.select(
        "term",
        F.floor(MICRO * F.log(
            (F.lit(float(n_docs)) - F.col("df") + F.lit(0.5))
            / (F.col("df") + F.lit(0.5)) + F.lit(1.0)
        )).cast("long").alias("idf_micro"),
    )
    q = spark.createDataFrame(queries, "query_id long, qtext string")
    q_terms = (q.select("query_id",
                        F.explode(tokens(F.col("qtext"))).alias("term"))
               .distinct())
    k1, b = BM25_K1_MILLI, BM25_B_MILLI
    postings = (
        tf.join(F.broadcast(q_terms), "term")
        .join(idf, "term")
        .join(dl, "doc_id")
        .withColumn("tfc", F.expr(f"least(tf, {BM25_TF_CAP})"))
        .withColumn(
            "ratio_micro",
            F.expr(f"(dl * {MICRO}) div CAST({avgdl} AS BIGINT)"))
        .withColumn(
            "denom_micro",
            F.expr(f"tfc * {MICRO}"
                   f" + ({k1} * (1000 - {b}) * 1000) div 1000"
                   f" + ({k1} * (({b} * ratio_micro) div 1000)) div 1000"))
        .withColumn(
            "term_score_micro",
            F.expr(f"(idf_micro * {k1 + 1000} * tfc * 1000)"
                   " div denom_micro"))
    )
    scored = (postings.groupBy("query_id", "doc_id")
              .agg(F.sum("term_score_micro").alias("score_micro")))
    w = Window.partitionBy("query_id").orderBy(
        F.col("score_micro").desc(), F.col("doc_id"))
    return (scored.withColumn("rank", F.row_number().over(w).cast("int"))
            .filter(F.col("rank") <= k)
            .select("query_id", "doc_id", "rank", "score_micro"))


def postings_upsert(store, batch_docs: DataFrame) -> None:
    """Fold a document batch into a persistent postings index (an
    ``IndexStore`` keyed by ``pk = term\\x1fdoc_id``): RE-ingesting a
    document REPLACES all its postings (anti-join on doc_id via the
    store's set-oriented delete), so upserts are idempotent and edits
    never leave stale terms behind — the reference's incremental
    index-maintenance contract applied to an inverted text index.

    Scale: per batch the cost is one combinable (doc_id, term)
    aggregation over the batch + the store's bounded merge (old view ⋈
    batch doc set); document frequency / corpus length are NOT
    materialized — they derive from the postings at query time, so no
    global statistic needs transactional maintenance."""
    posts = term_freqs(batch_docs).select(
        F.concat_ws("\x1f", F.col("term"), F.col("doc_id").cast("string"))
        .alias("pk"),
        "term", "doc_id", "tf")
    store.merge(
        batch_docs.sparkSession,
        adds=posts,
        delete_match=[batch_docs.select("doc_id").distinct()],
    )


def bm25_topk_indexed(spark, store, queries: list[tuple[int, str]],
                      k: int = 10) -> DataFrame:
    """BM25 over a :func:`postings_upsert`-maintained store: corpus
    statistics (N, total length, document frequencies) derive from the
    stored postings — N counts docs with >= 1 token, the one definitional
    difference from the ad-hoc :func:`bm25_topk` (mirrored by
    ``bm25_topk_sql(n_docs_from_postings=True)``)."""
    tf = store.read(spark)
    if tf is None:
        return spark.createDataFrame(
            [], "query_id long, doc_id long, rank int, score_micro long")
    tf = tf.select("doc_id", "term", "tf")
    # ONE stats job instead of two full postings scans (r10 #9): N and the
    # corpus length ride the same aggregate — count_distinct is exact, so
    # the statistics are unchanged
    stats = tf.agg(F.count_distinct("doc_id").alias("n"),
                   F.sum("tf").alias("s")).collect()[0]
    return _bm25_from_tf(spark, tf, stats["n"], queries, k,
                         total_len=stats["s"] or 0)


def bm25_topk_sql(queries: list[tuple[int, str]], k: int = 10,
                  n_docs_from_postings: bool = False) -> str:
    """DuckDB mirror of :func:`bm25_topk` — query literals as VALUES
    rows tokenized with the shared recipe, identical integer ops.

    ``n_docs_from_postings``: mirror of the INDEXED path
    (:func:`bm25_topk_indexed`), whose corpus statistics come from the
    postings store itself — N counts docs with >= 1 token (a token-less
    doc writes no postings), vs the ad-hoc path's raw document count."""
    from hbase_indexer_spark.pipeline.dedup import TOKS_SQL

    # SQL-escape via '' doubling: Python repr switches to double quotes
    # when the text contains an apostrophe, which DuckDB reads as an
    # identifier, not a string literal
    values = ", ".join(
        "({}, '{}')".format(qid, qtext.replace("'", "''"))
        for qid, qtext in queries)
    q_toks = TOKS_SQL.replace("text", "qtext")
    k1, b = BM25_K1_MILLI, BM25_B_MILLI
    n_docs_expr = ("(SELECT count(DISTINCT doc_id) FROM tf)"
                   if n_docs_from_postings
                   else "(SELECT count(*) FROM documents)")
    return f"""
        WITH tf AS (
            SELECT doc_id, t.term, count(*) AS tf
            FROM (SELECT doc_id, unnest({TOKS_SQL}) AS term
                  FROM documents) t
            GROUP BY doc_id, t.term
        ),
        dl AS (SELECT doc_id, CAST(sum(tf) AS BIGINT) AS dl
               FROM tf GROUP BY doc_id),
        scal AS (
            SELECT {n_docs_expr} AS n_docs,
                   (SELECT CAST(sum(tf) AS BIGINT) FROM tf) AS total_len
        ),
        avgdl AS (
            SELECT greatest(CAST(1 AS BIGINT),
                            total_len // greatest(1, n_docs)) AS avgdl
            FROM scal
        ),
        idf AS (
            SELECT term,
                   CAST(floor({MICRO} * ln(
                       ((SELECT n_docs FROM scal) - count(*) + 0.5)
                       / (count(*) + 0.5) + 1.0
                   )) AS BIGINT) AS idf_micro
            FROM tf GROUP BY term
        ),
        qt AS (
            SELECT DISTINCT query_id, t.term
            FROM (SELECT query_id, unnest({q_toks}) AS term
                  FROM (VALUES {values}) AS v(query_id, qtext)) t
        ),
        postings AS (
            SELECT qt.query_id, tf.doc_id,
                   least(tf.tf, {BM25_TF_CAP}) AS tfc,
                   idf.idf_micro, dl.dl,
                   (dl.dl * {MICRO}) // (SELECT avgdl FROM avgdl)
                       AS ratio_micro
            FROM tf
            JOIN qt ON tf.term = qt.term
            JOIN idf ON tf.term = idf.term
            JOIN dl ON tf.doc_id = dl.doc_id
        ),
        term_scores AS (
            SELECT query_id, doc_id,
                   (idf_micro * {k1 + 1000} * tfc * 1000) // (
                       tfc * {MICRO}
                       + ({k1} * (1000 - {b}) * 1000) // 1000
                       + ({k1} * (({b} * ratio_micro) // 1000)) // 1000
                   ) AS term_score_micro
            FROM postings
        ),
        scored AS (
            SELECT query_id, doc_id,
                   CAST(sum(term_score_micro) AS BIGINT) AS score_micro
            FROM term_scores GROUP BY query_id, doc_id
        )
        SELECT query_id, doc_id, rank, score_micro FROM (
            SELECT query_id, doc_id, score_micro,
                   CAST(row_number() OVER (
                       PARTITION BY query_id
                       ORDER BY score_micro DESC, doc_id
                   ) AS INTEGER) AS rank
            FROM scored
        ) WHERE rank <= {k}
    """


def trigram_freqs(docs: DataFrame) -> DataFrame:
    """``(doc_id, w1, w2, w3, tf)`` — adjacent-token trigrams, one
    combinable aggregation; docs with < 3 tokens emit nothing (sequence
    guard as in :func:`bigram_freqs`)."""
    toked = docs.select(
        "doc_id", F.explode(F.array(tokens(F.col("text")))).alias("_toks"))
    t = F.col("_toks")  # bound attribute — no per-gram re-tokenize
    tris = F.when(
        F.size(t) >= 3,
        F.transform(
            F.sequence(F.lit(1), F.size(t) - 2),
            lambda i: F.struct(
                F.element_at(t, i).alias("w1"),
                F.element_at(t, i + 1).alias("w2"),
                F.element_at(t, i + 2).alias("w3"),
            ),
        ),
    ).otherwise(
        F.array().cast("array<struct<w1:string,w2:string,w3:string>>"))
    return (
        toked.select("doc_id", F.explode(tris).alias("p"))
        .groupBy("doc_id", F.col("p.w1").alias("w1"),
                 F.col("p.w2").alias("w2"), F.col("p.w3").alias("w3"))
        .agg(F.count("*").alias("tf"))
    )


# floor(1e6 * ln(1/0.4)) — one backoff level's nll penalty in micro-nats
BACKOFF_MICRO = 916_290


def backoff_trigram_logprob(docs: DataFrame,
                            train_pred: str = "doc_id % 2 = 0"
                            ) -> DataFrame:
    """Stupid-backoff trigram LM scoring of a HELD-OUT split against a
    train split — the cross-corpus perplexity filter (KenLM-shaped):
    train n-gram counts on ``train_pred`` docs, score the rest.  Unlike
    :func:`bigram_logprob` (corpus as its own training set, every
    n-gram has support), held-out docs genuinely contain unseen
    trigrams, so the backoff chain does real work:

    - trigram seen in train:  ``nll += floor(1e6 * ln(c12 / c123))``
    - else bigram seen:       ``nll += B + floor(1e6 * ln(c2 / c23))``
    - else unigram seen:      ``nll += 2B + floor(1e6 * ln(C / c3))``
    - else (OOV ``w3``):      position counted in ``n_oov``, not scored

    with ``B = floor(1e6 * ln(1/0.4)) = 916290`` (stupid backoff's 0.4,
    Brants et al. 2007) and context counts from the train split.  One
    float ``ln`` per distinct train n-gram, integer sums after — the
    module's fixed-point discipline, exactly replayable in SQL.

    Returns ``(doc_id, n_scored, n_oov, nll_micro_total,
    nll_micro_per_gram)`` for every held-out doc (docs with < 3 tokens
    score 0/0/0/NULL).

    Scale: n-gram tables are combinable aggregations over the train
    split; the scoring stream joins them token-keyed (inverted-index
    shape, AQE-skew-safe) — never a per-doc loop, never Python."""
    train = docs.filter(F.expr(train_pred))
    held = docs.filter(~F.expr(train_pred))

    tri = (trigram_freqs(train).groupBy("w1", "w2", "w3")
           .agg(F.sum("tf").alias("c123")))
    trictx = tri.groupBy("w1", "w2").agg(F.sum("c123").alias("c12"))
    tri_w = tri.join(trictx, ["w1", "w2"]).select(
        "w1", "w2", "w3",
        F.floor(MICRO * F.log(F.col("c12").cast("double")
                              / F.col("c123").cast("double")))
        .alias("tri_w"))
    bi = (bigram_freqs(train).groupBy("w1", "w2")
          .agg(F.sum("tf").alias("c23"))
          .select(F.col("w1").alias("b2"), F.col("w2").alias("b3"), "c23"))
    bictx = bi.groupBy("b2").agg(F.sum("c23").alias("c2"))
    bi_w = bi.join(bictx, "b2").select(
        "b2", "b3",
        F.floor(MICRO * F.log(F.col("c2").cast("double")
                              / F.col("c23").cast("double")))
        .alias("bi_w"))
    uni = (train.select(F.explode(tokens(F.col("text"))).alias("u3"))
           .groupBy("u3").agg(F.count("*").alias("c3")))
    total = uni.agg(F.sum("c3")).first()[0] or 0
    uni_w = uni.select(
        "u3",
        F.floor(MICRO * F.log(F.lit(float(total))
                              / F.col("c3").cast("double")))
        .alias("uni_w"))

    pos = trigram_freqs(held)
    scored = (
        pos.join(tri_w, ["w1", "w2", "w3"], "left")
        .join(bi_w, (F.col("w2") == F.col("b2"))
              & (F.col("w3") == F.col("b3")), "left")
        .join(uni_w, F.col("w3") == F.col("u3"), "left")
        .withColumn(
            "gram_w",
            F.when(F.col("tri_w").isNotNull(), F.col("tri_w"))
            .when(F.col("bi_w").isNotNull(),
                  F.lit(BACKOFF_MICRO) + F.col("bi_w"))
            .when(F.col("uni_w").isNotNull(),
                  F.lit(2 * BACKOFF_MICRO) + F.col("uni_w")))
    )
    per_doc = scored.groupBy("doc_id").agg(
        F.sum(F.when(F.col("gram_w").isNotNull(), F.col("tf"))
              .otherwise(F.lit(0))).alias("n_scored"),
        F.sum(F.when(F.col("gram_w").isNull(), F.col("tf"))
              .otherwise(F.lit(0))).alias("n_oov"),
        F.sum(F.when(F.col("gram_w").isNotNull(),
                     F.col("tf") * F.col("gram_w"))
              .otherwise(F.lit(0))).alias("nll_micro_total"),
    )
    return (
        held.select("doc_id")
        .join(per_doc, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_scored", F.lit(0)).alias("n_scored"),
            F.coalesce("n_oov", F.lit(0)).alias("n_oov"),
            F.coalesce("nll_micro_total", F.lit(0))
            .alias("nll_micro_total"),
            F.expr("nll_micro_total div nullif(n_scored, 0)")
            .alias("nll_micro_per_gram"),
        )
    )


def backoff_trigram_logprob_sql(train_pred: str = "doc_id % 2 = 0") -> str:
    from hbase_indexer_spark.pipeline.dedup import TOKS_SQL

    return f"""
        WITH tr AS (SELECT doc_id, {TOKS_SQL} AS toks FROM documents
                    WHERE {train_pred}),
        hd AS (SELECT doc_id, {TOKS_SQL} AS toks FROM documents
               WHERE NOT ({train_pred})),
        tr_tri AS (
            SELECT toks[i] AS w1, toks[i+1] AS w2, toks[i+2] AS w3,
                   count(*) AS c123
            FROM tr, UNNEST(range(1, len(toks) - 1)) AS g(i)
            WHERE len(toks) >= 3 GROUP BY 1, 2, 3
        ),
        tr_trictx AS (SELECT w1, w2, sum(c123) AS c12
                      FROM tr_tri GROUP BY 1, 2),
        tri_w AS (
            SELECT t.w1, t.w2, t.w3,
                   CAST(floor({MICRO} * ln(CAST(x.c12 AS DOUBLE)
                        / CAST(t.c123 AS DOUBLE))) AS BIGINT) AS tri_w
            FROM tr_tri t JOIN tr_trictx x ON t.w1 = x.w1 AND t.w2 = x.w2
        ),
        tr_bi AS (
            SELECT toks[i] AS b2, toks[i+1] AS b3, count(*) AS c23
            FROM tr, UNNEST(range(1, len(toks))) AS g(i)
            WHERE len(toks) >= 2 GROUP BY 1, 2
        ),
        tr_bictx AS (SELECT b2, sum(c23) AS c2 FROM tr_bi GROUP BY 1),
        bi_w AS (
            SELECT b.b2, b.b3,
                   CAST(floor({MICRO} * ln(CAST(x.c2 AS DOUBLE)
                        / CAST(b.c23 AS DOUBLE))) AS BIGINT) AS bi_w
            FROM tr_bi b JOIN tr_bictx x ON b.b2 = x.b2
        ),
        tr_uni AS (
            SELECT t.u3, count(*) AS c3
            FROM (SELECT unnest(toks) AS u3 FROM tr) t GROUP BY 1
        ),
        uni_w AS (
            SELECT u3,
                   CAST(floor({MICRO} * ln(
                        CAST((SELECT sum(c3) FROM tr_uni) AS DOUBLE)
                        / CAST(c3 AS DOUBLE))) AS BIGINT) AS uni_w
            FROM tr_uni
        ),
        pos AS (
            SELECT doc_id, toks[i] AS w1, toks[i+1] AS w2,
                   toks[i+2] AS w3, count(*) AS tf
            FROM hd, UNNEST(range(1, len(toks) - 1)) AS g(i)
            WHERE len(toks) >= 3 GROUP BY 1, 2, 3, 4
        ),
        g AS (
            SELECT p.doc_id, p.tf,
                   CASE WHEN t.tri_w IS NOT NULL THEN t.tri_w
                        WHEN b.bi_w IS NOT NULL
                            THEN {BACKOFF_MICRO} + b.bi_w
                        WHEN u.uni_w IS NOT NULL
                            THEN {2 * BACKOFF_MICRO} + u.uni_w
                   END AS gram_w
            FROM pos p
            LEFT JOIN tri_w t ON p.w1 = t.w1 AND p.w2 = t.w2
                 AND p.w3 = t.w3
            LEFT JOIN bi_w b ON p.w2 = b.b2 AND p.w3 = b.b3
            LEFT JOIN uni_w u ON p.w3 = u.u3
        ),
        per_doc AS (
            SELECT doc_id,
                   sum(CASE WHEN gram_w IS NOT NULL THEN tf ELSE 0 END)
                       AS n_scored,
                   sum(CASE WHEN gram_w IS NULL THEN tf ELSE 0 END)
                       AS n_oov,
                   sum(CASE WHEN gram_w IS NOT NULL THEN tf * gram_w
                        ELSE 0 END) AS nll_micro_total
            FROM g GROUP BY doc_id
        )
        SELECT h.doc_id,
               CAST(coalesce(p.n_scored, 0) AS BIGINT) AS n_scored,
               CAST(coalesce(p.n_oov, 0) AS BIGINT) AS n_oov,
               CAST(coalesce(p.nll_micro_total, 0) AS BIGINT)
                   AS nll_micro_total,
               CAST(coalesce(p.nll_micro_total, 0)
                    // NULLIF(coalesce(p.n_scored, 0), 0) AS BIGINT)
                   AS nll_micro_per_gram
        FROM (SELECT DISTINCT doc_id FROM hd) h
        LEFT JOIN per_doc p ON h.doc_id = p.doc_id
    """


RRF_K = 60  # the standard reciprocal-rank-fusion constant


def rrf_fuse(rankings: list[DataFrame], k: int = 10,
             k_rrf: int = RRF_K) -> DataFrame:
    """Reciprocal-rank fusion of N rankings into one — the standard
    hybrid-search combiner (sparse BM25 + dense ANN), score-free so
    incomparable scoring scales never need calibration:

    ``score(q, d) = sum over rankings of 1e6 div (k_rrf + rank(q, d))``
    (integer micro-units — exact in both engines), where a (q, d) pair
    absent from a ranking contributes nothing.  Ties break by doc_id.

    Each input is ``(query_id, doc_id, rank)``; extra columns are
    ignored.  Returns ``(query_id, doc_id, rank, rrf_micro)``.

    Scale: the inputs are already top-k truncated (queries x k rows —
    aggregate-sized, NOT corpus-sized), so the union + groupBy here is
    trivially small; the heavy lifting happened inside the input
    retrievers."""
    uni = rankings[0].select("query_id", "doc_id", "rank")
    for r in rankings[1:]:
        uni = uni.unionByName(r.select("query_id", "doc_id", "rank"))
    scored = (
        uni.select("query_id", "doc_id",
                   F.expr(f"{MICRO} div ({k_rrf} + rank)").alias("c"))
        .groupBy("query_id", "doc_id")
        .agg(F.sum("c").alias("rrf_micro"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("rrf_micro").desc(), F.col("doc_id"))
    return (scored.withColumn("rank", F.row_number().over(w).cast("int"))
            .filter(F.col("rank") <= k)
            .select("query_id", "doc_id", "rank", "rrf_micro"))


def rrf_fuse_sql(ranking_ctes: list[str], k: int = 10,
                 k_rrf: int = RRF_K) -> str:
    """DuckDB mirror: each entry of ``ranking_ctes`` is a SELECT
    producing (query_id, doc_id, rank); they union and fuse exactly as
    :func:`rrf_fuse`."""
    uni = " UNION ALL ".join(
        f"SELECT query_id, doc_id, rank FROM ({cte})"
        for cte in ranking_ctes)
    return f"""
        WITH uni AS ({uni}),
        scored AS (
            SELECT query_id, doc_id,
                   CAST(sum({MICRO} // ({k_rrf} + rank)) AS BIGINT)
                       AS rrf_micro
            FROM uni GROUP BY query_id, doc_id
        )
        SELECT query_id, doc_id, rank, rrf_micro FROM (
            SELECT query_id, doc_id, rrf_micro,
                   CAST(row_number() OVER (
                       PARTITION BY query_id
                       ORDER BY rrf_micro DESC, doc_id
                   ) AS INTEGER) AS rank
            FROM scored
        ) WHERE rank <= {k}
    """


def fk_integrity_report(relations: list[tuple[str, DataFrame, str,
                                              DataFrame, str]]) -> DataFrame:
    """Referential-integrity audit: for each ``(name, child_df,
    child_key, parent_df, parent_key)`` relation, count child rows whose
    key has no parent (left anti-join) — the pre-join sanity check that
    decides whether an inner join silently drops data.  NULL child keys
    are counted separately (``n_null_keys``): they vanish from any
    equi-join but are not orphans in the FK sense.

    Returns one row per relation: ``(relation, n_child, n_null_keys,
    n_orphans, orphan_ppm)``.

    Scale: per relation one anti-join (parent keys distinct — usually
    broadcast-sized after distinct) + combinable counts; the report is
    len(relations) rows.  Fully DECLARATIVE — the per-relation plans
    union into ONE lazy plan (the 1x1 crossJoin of the two single-row
    aggregates is the allowlisted scalar-join shape), so the audit is
    one job, not 3 driver actions per relation."""
    out = None
    for name, child, ck, parent, pk in relations:
        keys = child.select(F.col(ck).alias("_k"))
        pkeys = (parent.select(F.col(pk).alias("_k"))
                 .filter(F.col("_k").isNotNull()).distinct())
        base = keys.agg(
            F.count(F.lit(1)).alias("n_child"),
            # coalesce: SUM over zero rows is NULL, but the oracle's
            # COUNT(*) WHERE ... over an empty child is 0
            F.coalesce(
                F.sum(F.when(F.col("_k").isNull(), 1).otherwise(0)),
                F.lit(0)).cast("long").alias("n_null_keys"))
        orph = (keys.filter(F.col("_k").isNotNull())
                .join(pkeys, "_k", "left_anti")
                .agg(F.count(F.lit(1)).alias("n_orphans")))
        row = (base.crossJoin(orph).select(
            F.lit(name).alias("relation"), "n_child", "n_null_keys",
            "n_orphans",
            F.expr("CASE WHEN n_child > 0"
                   " THEN (1000000 * n_orphans) div n_child"
                   " ELSE CAST(0 AS BIGINT) END").alias("orphan_ppm")))
        out = row if out is None else out.unionByName(row)
    return out


def fk_integrity_report_sql(
        relations: list[tuple[str, str, str, str, str]]) -> str:
    """Mirror over table names: ``(name, child_table, child_key,
    parent_table, parent_key)``."""
    parts = []
    for name, ct, ck, pt, pk in relations:
        parts.append(f"""
            SELECT '{name}' AS relation,
                   (SELECT count(*) FROM {ct}) AS n_child,
                   (SELECT count(*) FROM {ct} WHERE {ck} IS NULL)
                       AS n_null_keys,
                   (SELECT count(*) FROM {ct}
                    WHERE {ck} IS NOT NULL
                      AND {ck} NOT IN (SELECT {pk} FROM {pt}
                                       WHERE {pk} IS NOT NULL))
                       AS n_orphans
        """)
    uni = " UNION ALL ".join(f"({p})" for p in parts)
    return f"""
        SELECT relation, CAST(n_child AS BIGINT) AS n_child,
               CAST(n_null_keys AS BIGINT) AS n_null_keys,
               CAST(n_orphans AS BIGINT) AS n_orphans,
               CAST(CASE WHEN n_child > 0
                    THEN (1000000 * n_orphans) // n_child
                    ELSE 0 END AS BIGINT) AS orphan_ppm
        FROM ({uni})
    """


def _ndcg_weights_micro(k: int) -> list[int]:
    """Position weights ``floor(1e6 / log2(i+1))`` for i = 1..k, computed
    ONCE in Python and embedded as literals in both engines — no
    cross-engine float risk."""
    import math

    return [int(MICRO // math.log2(i + 1)) for i in range(1, k + 1)]


def retrieval_eval(ranking: DataFrame, truth: DataFrame,
                   k: int = 10) -> DataFrame:
    """Ranking-quality report: NDCG@k and recall@k of ``ranking``
    against ``truth`` (both ``(query_id, doc_id, rank)`` top-k frames,
    e.g. BM25 evaluated against the exact dense ranking) — the eval leg
    of the retrieval family (search → fusion → EVAL).

    Graded relevance is derived from the truth ranks (``rel = k+1 -
    truth_rank``; absent docs are irrelevant), so the ideal DCG is the
    CONSTANT ``sum_i (k+1-i) * W[i]`` and every number is integer micro
    fixed point: ``dcg_micro = sum over ranking positions of rel *
    W[pos]`` with ``W[pos] = floor(1e6 / log2(pos+1))`` (literal table,
    see :func:`_ndcg_weights_micro`), ``ndcg_micro = (1e6 * dcg) div
    idcg``, ``recall_micro = (1e6 * overlap) div k``.

    Returns ``(query_id, overlap, recall_micro, dcg_micro, idcg_micro,
    ndcg_micro)`` — one row per query present in either frame.

    Scale: both inputs are top-k truncated (queries x k rows), so the
    whole evaluation is aggregate-sized."""
    w = _ndcg_weights_micro(k)
    idcg = sum((k + 1 - i) * w[i - 1] for i in range(1, k + 1))
    w_expr = F.element_at(
        F.array(*[F.lit(x).cast("long") for x in w]), F.col("rank"))
    t = truth.select(
        "query_id", "doc_id",
        (F.lit(k + 1) - F.col("rank")).cast("long").alias("rel"))
    r = ranking.select("query_id", "doc_id", F.col("rank").cast("int")
                       .alias("rank"))
    joined = (r.join(t, ["query_id", "doc_id"], "full")
              .select("query_id",
                      F.coalesce(F.col("rel"), F.lit(0)).alias("rel"),
                      "rank"))
    per_q = joined.groupBy("query_id").agg(
        F.sum(F.when(F.col("rank").isNotNull() & (F.col("rel") > 0),
                     F.lit(1)).otherwise(F.lit(0))).alias("overlap"),
        F.sum(F.when(F.col("rank").isNotNull(),
                     F.col("rel") * w_expr).otherwise(F.lit(0)))
        .alias("dcg_micro"),
    )
    return per_q.select(
        "query_id", "overlap",
        F.expr(f"(1000000 * overlap) div {k}").alias("recall_micro"),
        "dcg_micro",
        F.lit(idcg).cast("long").alias("idcg_micro"),
        F.expr(f"(1000000 * dcg_micro) div {idcg}").alias("ndcg_micro"),
    )


def retrieval_eval_sql(ranking_cte: str, truth_cte: str,
                       k: int = 10) -> str:
    """DuckDB mirror: same literal weight table, same integer ops."""
    w = _ndcg_weights_micro(k)
    idcg = sum((k + 1 - i) * w[i - 1] for i in range(1, k + 1))
    w_list = ", ".join(str(x) for x in w)
    return f"""
        WITH r AS ({ranking_cte}),
        t AS ({truth_cte}),
        j AS (
            SELECT coalesce(r.query_id, t.query_id) AS query_id,
                   coalesce({k + 1} - t.rank, 0) AS rel,
                   r.rank AS pos
            FROM r FULL JOIN t
              ON r.query_id = t.query_id AND r.doc_id = t.doc_id
        ),
        per_q AS (
            SELECT query_id,
                   CAST(sum(CASE WHEN pos IS NOT NULL AND rel > 0
                            THEN 1 ELSE 0 END) AS BIGINT) AS overlap,
                   CAST(sum(CASE WHEN pos IS NOT NULL
                            THEN rel * ([{w_list}])[pos] ELSE 0 END)
                        AS BIGINT) AS dcg_micro
            FROM j GROUP BY query_id
        )
        SELECT query_id, overlap,
               (1000000 * overlap) // {k} AS recall_micro,
               dcg_micro,
               CAST({idcg} AS BIGINT) AS idcg_micro,
               (1000000 * dcg_micro) // {idcg} AS ndcg_micro
        FROM per_q
    """


def key_skew_report(df: DataFrame, key_col: str, k: int = 10) -> DataFrame:
    """Per-key skew profile for a prospective join/groupBy key: the
    top-``k`` heaviest keys with their row count, corpus share in
    integer ppm, and the key's count as a multiple of the mean key load
    (also ppm) — the numbers that decide whether a key needs salting
    (`operators/skew.py`) or AQE skew-join before a 100 TB shuffle is
    launched.  NULL keys profile like any other value (they hash to one
    reducer too — the classic accidental hot key).

    Returns ``(key, n_rows, share_ppm, x_mean_ppm, rank)``; rank ties
    break by key string ascending.

    Scale: one combinable count per key + one aggregate-sized window —
    the report is k rows; nothing corpus-sized leaves the first agg."""
    counts = (df.groupBy(F.col(key_col).cast("string").alias("key"))
              .agg(F.count(F.lit(1)).alias("n_rows")))
    tot = counts.agg(
        F.sum("n_rows").alias("t"),
        F.count(F.lit(1)).alias("nk")).select(
        "t", "nk")
    j = counts.crossJoin(F.broadcast(tot))
    # top-k via orderBy+limit (TakeOrderedAndProject: O(k) per partition,
    # no global sort of the key-cardinality table), THEN rank the k
    # survivors with an aggregate-sized window.
    # x_mean divides by the PRE-COMPUTED integer mean key load (t div nk,
    # >= 1 since every key has >= 1 row) instead of multiplying
    # n_rows * nk * 1e6 — that triple product wraps int64 once
    # total_rows x n_keys passes ~9.2e12, i.e. at exactly the scales a
    # skew profile matters.  1e6 * n_rows alone stays safe to ~9.2e12
    # rows per key (same domain as share_ppm).
    topk = (
        j.select(
            "key", "n_rows",
            F.expr("(1000000 * n_rows) div t").alias("share_ppm"),
            F.expr("(1000000 * n_rows) div (t div nk)").alias("x_mean_ppm"),
        )
        .orderBy(F.col("n_rows").desc(), F.col("key"))
        .limit(k)
    )
    w = Window.orderBy(F.col("n_rows").desc(), F.col("key"))
    return topk.withColumn("rank", F.row_number().over(w).cast("int"))


def key_skew_report_sql(key_expr: str, table: str, k: int = 10) -> str:
    return f"""
        WITH counts AS (
            SELECT CAST({key_expr} AS VARCHAR) AS key,
                   count(*) AS n_rows
            FROM {table} GROUP BY 1
        ),
        tot AS (SELECT CAST(sum(n_rows) AS BIGINT) AS t,
                       count(*) AS nk FROM counts)
        SELECT key, CAST(n_rows AS BIGINT) AS n_rows, share_ppm,
               x_mean_ppm, rank
        FROM (
            SELECT key, n_rows,
                   (1000000 * n_rows) // (SELECT t FROM tot)
                       AS share_ppm,
                   (1000000 * n_rows)
                       // (SELECT t // nk FROM tot) AS x_mean_ppm,
                   CAST(row_number() OVER (
                       ORDER BY n_rows DESC, key
                   ) AS INTEGER) AS rank
            FROM counts
        ) WHERE rank <= {k}
    """


def unigram_logprob(docs: DataFrame) -> DataFrame:
    """Unigram LM negative log-likelihood per document, in integer
    micro-nats — the CCNet-style "how surprising is this text under the
    corpus unigram distribution" quality signal (high per-token NLL =
    rare vocabulary; near-zero = boilerplate).

    ``nll_micro_total = sum_t tf_t * floor(1e6 * ln(C / c_t))`` where
    ``c_t`` is the corpus count of term t and C the corpus token count;
    ``nll_micro_per_token`` integer-divides by the doc length.  Returns
    one row per input doc: ``(doc_id, n_tokens, nll_micro_total,
    nll_micro_per_token)`` — empty docs score 0 tokens / NULL per-token.
    """
    total = docs.select(
        F.sum(F.size(tokens(F.col("text")))).alias("c")).first()[0] or 0
    tf = term_freqs(docs)
    weights = tf.groupBy("term").agg(
        F.floor(
            MICRO * F.log(F.lit(float(total)) / F.sum("tf").cast("double"))
        ).alias("w_micro")
    )
    per_doc = (
        tf.join(weights, "term")
        .groupBy("doc_id")
        .agg(
            F.sum("tf").alias("n_tokens"),
            F.sum(F.col("tf") * F.col("w_micro")).alias("nll_micro_total"),
        )
    )
    return (
        docs.select("doc_id")
        .join(per_doc, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_tokens", F.lit(0)).alias("n_tokens"),
            F.coalesce("nll_micro_total", F.lit(0))
            .alias("nll_micro_total"),
            # per_doc's (pre-coalesce) columns: NULL for empty docs, so
            # the div null-propagates instead of ANSI-throwing on zero
            F.expr("nll_micro_total div n_tokens")
            .alias("nll_micro_per_token"),
        )
    )


def unigram_logprob_sql() -> str:
    from hbase_indexer_spark.pipeline.dedup import TOKS_SQL

    return f"""
        WITH tf AS (
            SELECT doc_id, t.term, count(*) AS tf
            FROM (SELECT doc_id, unnest({TOKS_SQL}) AS term
                  FROM documents) t
            GROUP BY doc_id, t.term
        ),
        w AS (
            SELECT term,
                   CAST(floor({MICRO} * ln(
                       (SELECT CAST(sum(tf) AS DOUBLE) FROM tf)
                       / CAST(sum(tf) AS DOUBLE)
                   )) AS BIGINT) AS w_micro
            FROM tf GROUP BY term
        ),
        per_doc AS (
            SELECT tf.doc_id, sum(tf.tf) AS n_tokens,
                   sum(tf.tf * w.w_micro) AS nll_micro_total
            FROM tf JOIN w USING (term)
            GROUP BY tf.doc_id
        )
        SELECT d.doc_id,
               CAST(coalesce(p.n_tokens, 0) AS BIGINT) AS n_tokens,
               CAST(coalesce(p.nll_micro_total, 0) AS BIGINT)
                   AS nll_micro_total,
               CAST(CASE WHEN p.n_tokens > 0
                    THEN p.nll_micro_total // p.n_tokens
                    END AS BIGINT) AS nll_micro_per_token
        FROM documents d LEFT JOIN per_doc p ON d.doc_id = p.doc_id
    """


def bigram_freqs(docs: DataFrame) -> DataFrame:
    """``(doc_id, w1, w2, tf)`` — adjacent-token bigrams, one combinable
    aggregation.  Docs with < 2 tokens emit nothing (sequence() would
    count DOWN for size < 2 — the guard is load-bearing)."""
    toked = docs.select(
        "doc_id", F.explode(F.array(tokens(F.col("text")))).alias("_toks"))
    t = F.col("_toks")  # bound attribute: element_at in the lambda must
    # not re-tokenize the text per bigram (interpreted HOF re-evaluation)
    pairs = F.when(
        F.size(t) >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size(t) - 1),
            lambda i: F.struct(
                F.element_at(t, i).alias("w1"),
                F.element_at(t, i + 1).alias("w2"),
            ),
        ),
    ).otherwise(F.array().cast("array<struct<w1:string,w2:string>>"))
    return (
        toked.select("doc_id", F.explode(pairs).alias("p"))
        .groupBy("doc_id", F.col("p.w1").alias("w1"),
                 F.col("p.w2").alias("w2"))
        .agg(F.count("*").alias("tf"))
    )


def bigram_logprob(docs: DataFrame) -> DataFrame:
    """Bigram LM negative log-likelihood per document in integer
    micro-nats: ``sum over adjacent pairs of floor(1e6 * ln(c(w1,.) /
    c(w1,w2)))`` — the conditional MLE ``p(w2|w1)`` with the corpus as
    its own training set (every doc bigram has corpus support by
    construction, so no smoothing is needed for finiteness).

    Returns ``(doc_id, n_bigrams, nll_micro_total,
    nll_micro_per_bigram)``; docs with < 2 tokens score 0 bigrams /
    NULL per-bigram.  Same fixed-point discipline as
    :func:`unigram_logprob` — one float ``ln`` per distinct corpus
    bigram, integer sums everywhere after.
    """
    bf = bigram_freqs(docs)
    c12 = bf.groupBy("w1", "w2").agg(F.sum("tf").alias("c12"))
    cl = c12.groupBy("w1").agg(F.sum("c12").alias("cl"))
    weights = c12.join(cl, "w1").select(
        "w1", "w2",
        F.floor(
            MICRO * F.log(F.col("cl").cast("double")
                          / F.col("c12").cast("double"))
        ).alias("w_micro"),
    )
    per_doc = (
        bf.join(weights, ["w1", "w2"])
        .groupBy("doc_id")
        .agg(
            F.sum("tf").alias("n_bigrams"),
            F.sum(F.col("tf") * F.col("w_micro")).alias("nll_micro_total"),
        )
    )
    return (
        docs.select("doc_id")
        .join(per_doc, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_bigrams", F.lit(0)).alias("n_bigrams"),
            F.coalesce("nll_micro_total", F.lit(0))
            .alias("nll_micro_total"),
            # pre-coalesce columns: NULL for short docs -> div
            # null-propagates instead of ANSI-throwing
            F.expr("nll_micro_total div n_bigrams")
            .alias("nll_micro_per_bigram"),
        )
    )


def bigram_logprob_sql() -> str:
    from hbase_indexer_spark.pipeline.dedup import TOKS_SQL

    return f"""
        WITH tk AS (SELECT doc_id, {TOKS_SQL} AS toks FROM documents),
        bg AS (
            SELECT doc_id, toks[i] AS w1, toks[i+1] AS w2, count(*) AS tf
            FROM (SELECT doc_id, toks,
                         unnest(range(1, len(toks))) AS i FROM tk)
            GROUP BY doc_id, toks[i], toks[i+1]
        ),
        c12 AS (SELECT w1, w2, sum(tf) AS c12 FROM bg GROUP BY w1, w2),
        cl AS (SELECT w1, sum(c12) AS cl FROM c12 GROUP BY w1),
        w AS (
            SELECT c12.w1, c12.w2,
                   CAST(floor({MICRO} * ln(CAST(cl.cl AS DOUBLE)
                                           / CAST(c12.c12 AS DOUBLE)))
                        AS BIGINT) AS w_micro
            FROM c12 JOIN cl USING (w1)
        ),
        per_doc AS (
            SELECT bg.doc_id, sum(bg.tf) AS n_bigrams,
                   sum(bg.tf * w.w_micro) AS nll_micro_total
            FROM bg JOIN w USING (w1, w2)
            GROUP BY bg.doc_id
        )
        SELECT d.doc_id,
               CAST(coalesce(p.n_bigrams, 0) AS BIGINT) AS n_bigrams,
               CAST(coalesce(p.nll_micro_total, 0) AS BIGINT)
                   AS nll_micro_total,
               CAST(CASE WHEN p.n_bigrams > 0
                    THEN p.nll_micro_total // p.n_bigrams
                    END AS BIGINT) AS nll_micro_per_bigram
        FROM documents d LEFT JOIN per_doc p ON d.doc_id = p.doc_id
    """


# ---------------------------------------------------------------------------
# BPE merge-candidate statistics (tokenizer training, first iteration)
# ---------------------------------------------------------------------------

def bpe_merge_candidates(docs: DataFrame, k: int = 20) -> DataFrame:
    """The first iteration of corpus-scale BPE tokenizer training: count
    every adjacent character pair weighted by word frequency and rank
    the top-``k`` merge candidates.  (Full BPE iterates this with the
    winning pair merged; each round is this same plan over re-segmented
    words — the per-round cost, the part that must scale, is what's
    exercised and oracle-checked here.)

    Returns ``(left, right, n_occ, rank)``, rank by (count desc, left
    asc, right asc) so ties are deterministic.

    Scale: token explode -> distinct-word counts (combinable; the word
    table is vocab-sized, orders of magnitude smaller than the corpus),
    then in-row character pairing over the VOCAB — pair counting never
    touches corpus-length strings twice.  The final top-k sorts only
    (pair, count) aggregates."""
    words = (
        docs.select(F.explode(tokens(F.col("text"))).alias("w"))
        .groupBy("w").agg(F.count(F.lit(1)).alias("wf"))
    )
    pairs = (
        words.filter(F.length("w") >= 2)
        .select(
            "wf",
            F.explode(F.transform(
                F.sequence(F.lit(1), F.length("w") - 1),
                lambda i: F.struct(
                    F.col("w").substr(i, F.lit(1)).alias("left"),
                    F.col("w").substr(i + 1, F.lit(1)).alias("right"),
                ),
            )).alias("p"),
        )
        .select(F.col("p.left").alias("left"),
                F.col("p.right").alias("right"), "wf")
        .groupBy("left", "right")
        .agg(F.sum("wf").alias("n_occ"))
    )
    # TakeOrderedAndProject (per-partition top-k + merge) narrows the
    # global sort to k rows BEFORE the rank window sees anything — the
    # unpartitioned window below is over k rows, not the pair table
    top = pairs.orderBy(F.desc("n_occ"), F.asc("left"),
                        F.asc("right")).limit(k)
    w = Window.orderBy(F.desc("n_occ"), F.asc("left"), F.asc("right"))
    return top.withColumn("rank", F.row_number().over(w))


_BPE_WORD_RE = "[a-z0-9]+"


# re-materialize the BPE symbol table every K merge rounds so chained
# literal replaces never stack into an unboundedly deep plan
_BPE_CHECKPOINT_EVERY = 25


def bpe_train(docs: DataFrame, n_merges: int = 6) -> DataFrame:
    """FULL corpus-scale BPE tokenizer training (extends
    :func:`bpe_merge_candidates`, which is this loop's first round):
    iterate ``n_merges`` rounds of count-adjacent-symbol-pairs ->
    argmax -> merge-everywhere, producing the merge table a tokenizer
    ships (``(round, left, right, n_occ)``, ranked by count desc with
    (left, right) tie-break — fully deterministic).

    Words (lowercased ``[a-z0-9]+`` runs — BPE's standard pre-tokenize)
    are carried as paren-wrapped symbol strings ``(h)(e)(l)(l)(o)``;
    merging (l, r) is the LITERAL replace ``(l)(r) -> (lr)``, whose
    left-to-right non-overlapping semantics are identical in Spark's
    ``replace`` and DuckDB's ``replace`` — so greedy BPE merge order
    (``(a)(a)(a) -> (aa)(a)``) is bit-equal cross-engine and the whole
    trainer is SQL-oracle-checkable round for round.

    Scale: the corpus is read ONCE (word-frequency count, combinable);
    every round after that runs on the VOCAB-sized word table — one
    combinable pair aggregation, one TakeOrdered(1) argmax (a 1-row
    driver collect, the allowlisted fixed-point shape), one map-only
    literal replace.  The symbol table is re-materialized every
    ``_BPE_CHECKPOINT_EVERY`` rounds (r7 ADVICE: the chained replaces
    otherwise stack one plan node per round, so round i would replay
    all i-1 prior replaces and Catalyst analysis cost would grow
    linearly — at the stated tokenizer scale of 100s-10000s merges the
    checkpoint keeps per-round plan depth bounded and per-round cost
    genuinely independent of how many merges came before).  n_merges
    is tokenizer-sized; each round's plan is vocab-scan + agg."""
    spark = docs.sparkSession
    words = (
        docs.select(F.explode(
            F.expr(f"regexp_extract_all(lower(text), '{_BPE_WORD_RE}', 0)")
        ).alias("w"))
        .groupBy("w").agg(F.count(F.lit(1)).alias("wf"))
        .select(F.regexp_replace("w", "(.)", r"($1)").alias("s"), "wf")
    )
    # vocab-sized; rounds iterate over it — pin it once
    cur = words.localCheckpoint(eager=True)
    merges: list[tuple[int, str, str, int]] = []
    for rnd in range(1, n_merges + 1):
        best = bpe_pair_counts(cur).orderBy(
            F.desc("n_occ"), F.asc("l"), F.asc("r")).limit(1).collect()
        if not best:
            break
        l, r, n_occ = best[0]["l"], best[0]["r"], int(best[0]["n_occ"])
        merges.append((rnd, l, r, n_occ))
        cur = cur.withColumn("s", F.replace(
            F.col("s"), F.lit(f"({l})({r})"), F.lit(f"({l}{r})")))
        if rnd % _BPE_CHECKPOINT_EVERY == 0:
            # collapse the stacked replaces: bounded plan depth no
            # matter how many merge rounds run (r7 ADVICE)
            cur = cur.localCheckpoint(eager=True)
    return spark.createDataFrame(
        merges, "round int, left string, right string, n_occ long")


def bpe_encode_stats(docs: DataFrame, merges: list[tuple[str, str]],
                     lang_col: str = "lang") -> DataFrame:
    """ENCODE under a learned merge list (the other half of the
    tokenizer story: :func:`bpe_train` learns, this applies): re-derive
    the vocabulary, apply the merges as the same chained literal
    replaces, and report per-language token statistics —
    ``(lang, n_words, n_chars, n_bpe_tokens, fertility_micro)`` where
    fertility is BPE tokens per word in integer micro units (the
    metric that decides whether a tokenizer suits a language mix).

    Scale: the merge chain is applied ONCE PER DISTINCT WORD (map-only
    over the vocab, never per occurrence), then one equi-join back to
    the (doc, word) stream and one combinable per-language aggregate."""
    word_arr = F.expr(
        f"regexp_extract_all(lower(text), '{_BPE_WORD_RE}', 0)")
    dwords = docs.select(F.col(lang_col).alias("lang"),
                         F.explode(word_arr).alias("w"))
    s = F.regexp_replace("w", "(.)", r"($1)")
    for l, r in merges:
        s = F.replace(s, F.lit(f"({l})({r})"), F.lit(f"({l}{r})"))
    vocab = (dwords.select("w").distinct()
             .withColumn("_s", s)
             .select("w", F.size(F.split(
                 F.expr("substring(_s, 2, length(_s) - 2)"),
                 r"\)\(")).cast("long").alias("n_sym")))
    joined = dwords.join(vocab, "w")
    return (joined.groupBy("lang")
            .agg(F.count(F.lit(1)).alias("n_words"),
                 F.sum(F.length("w")).cast("long").alias("n_chars"),
                 F.sum("n_sym").alias("n_bpe_tokens"))
            .select("lang", "n_words", "n_chars", "n_bpe_tokens",
                    F.expr("(1000000 * n_bpe_tokens) div n_words")
                    .alias("fertility_micro"))
            .orderBy("lang"))


def bpe_pair_counts(words: DataFrame) -> DataFrame:
    """One BPE round's pair aggregation over a wrapped-symbol word table
    ``(s, wf)`` -> ``(l, r, n_occ)``.  Exposed so the per-round plan
    shape is pinnable by tests (the trainer's RESULT is a driver-sized
    local relation, which carries no plan): one map-only split+explode,
    one combinable HashAggregate; the argmax downstream must compile to
    TakeOrderedAndProject, never a global sort."""
    syms = F.split(F.expr("substring(s, 2, length(s) - 2)"), r"\)\(")
    return (
        words.select("wf", syms.alias("y"))
        .filter(F.size("y") >= 2)
        .select("wf", F.explode(F.transform(
            F.sequence(F.lit(1), F.size("y") - 1),
            lambda i: F.struct(
                F.element_at("y", i).alias("l"),
                F.element_at("y", i + F.lit(1)).alias("r")),
        )).alias("p"))
        .groupBy(F.col("p.l").alias("l"), F.col("p.r").alias("r"))
        .agg(F.sum("wf").alias("n_occ"))
    )


def _bpe_chain_sql(n_merges: int) -> str:
    """The shared CTE chain both BPE oracles build on: words0 (wrapped
    symbols + frequency + the raw word) and n_merges rounds of
    pair-count -> argmax -> merge-everywhere.  Every chained CTE is
    AS MATERIALIZED: DuckDB inlines CTEs by default, and best{i} is
    referenced four times inside words{i}, so un-materialized the
    recomputation compounds ~4^n across rounds (the 6-round oracle
    never finished before this)."""
    parts = [f"""
        words0 AS MATERIALIZED (
            SELECT w, regexp_replace(w, '(.)', '(\\1)', 'g') AS s,
                   CAST(count(*) AS BIGINT) AS wf
            FROM (
                SELECT unnest(regexp_extract_all(lower(text),
                                                 '{_BPE_WORD_RE}')) AS w
                FROM documents
            ) GROUP BY 1, 2
        )"""]
    for i in range(1, n_merges + 1):
        parts.append(f"""
        syms{i} AS (
            SELECT string_split(s[2:-2], ')(') AS y, wf
            FROM words{i - 1} WHERE len(s) > 3
        ),
        pairs{i} AS (
            SELECT y[i] AS l, y[i + 1] AS r, sum(wf) AS n_occ
            FROM (SELECT y, wf, unnest(range(1, len(y))) AS i
                  FROM syms{i} WHERE len(y) >= 2)
            GROUP BY 1, 2
        ),
        best{i} AS MATERIALIZED (
            SELECT {i} AS round, l, r, CAST(n_occ AS BIGINT) AS n_occ
            FROM pairs{i} ORDER BY n_occ DESC, l ASC, r ASC LIMIT 1
        ),
        words{i} AS MATERIALIZED (
            SELECT w, replace(s,
                           '(' || (SELECT l FROM best{i}) || ')(' ||
                           (SELECT r FROM best{i}) || ')',
                           '(' || (SELECT l FROM best{i}) ||
                           (SELECT r FROM best{i}) || ')') AS s, wf
            FROM words{i - 1}
        )""")
    return "WITH " + ",".join(parts)


def bpe_train_sql(n_merges: int = 6) -> str:
    """DuckDB mirror of :func:`bpe_train`: the same rounds unrolled as
    CTEs — same wrapped encoding, same literal replace, same
    (count desc, l, r) argmax."""
    union = "\n            UNION ALL ".join(
        f"SELECT round, l AS left, r AS right, n_occ FROM best{i}"
        for i in range(1, n_merges + 1))
    return (_bpe_chain_sql(n_merges)
            + f"\n        SELECT * FROM ({union}) ORDER BY round")


def bpe_fertility_sql(n_merges: int = 6) -> str:
    """DuckDB mirror of :func:`bpe_encode_stats` over the trained
    merges: the final words{n} table maps each word to its symbol
    count; per-language sums come from re-tokenizing the docs and
    joining that vocab table."""
    return _bpe_chain_sql(n_merges) + f""",
        vocab AS (
            SELECT w,
                   CAST(len(string_split(s[2:-2], ')(')) AS BIGINT)
                       AS n_sym
            FROM words{n_merges}
        ),
        dwords AS (
            SELECT d.doc_id, d.lang, t.w
            FROM documents d,
                 unnest(regexp_extract_all(lower(d.text),
                                           '{_BPE_WORD_RE}')) AS t(w)
        )
        SELECT dw.lang,
               CAST(count(*) AS BIGINT) AS n_words,
               CAST(sum(len(dw.w)) AS BIGINT) AS n_chars,
               CAST(sum(v.n_sym) AS BIGINT) AS n_bpe_tokens,
               CAST((1000000 * sum(v.n_sym)) // count(*) AS BIGINT)
                   AS fertility_micro
        FROM dwords dw JOIN vocab v USING (w)
        GROUP BY dw.lang ORDER BY dw.lang
    """


def bpe_merge_candidates_sql(k: int = 20) -> str:
    from hbase_indexer_spark.pipeline.dedup import TOKS_SQL

    return f"""
        WITH words AS (
            SELECT w, count(*) AS wf
            FROM (SELECT unnest({TOKS_SQL}) AS w FROM documents)
            GROUP BY w
        ),
        pairs AS (
            SELECT unnest(list_transform(
                       range(1, len(w)),
                       i -> struct_pack(l := w[i], r := w[i + 1])
                   )) AS p,
                   wf
            FROM words WHERE len(w) >= 2
        ),
        agg AS (
            SELECT p.l AS "left", p.r AS "right",
                   CAST(sum(wf) AS BIGINT) AS n_occ
            FROM pairs GROUP BY 1, 2
        )
        SELECT "left", "right", n_occ, rank FROM (
            SELECT "left", "right", n_occ,
                   row_number() OVER (
                       ORDER BY n_occ DESC, "left" ASC, "right" ASC
                   ) AS rank
            FROM agg
        ) WHERE rank <= {k}
    """


# ---------------------------------------------------------------------------
# Sparse TF-IDF cosine similarity pairs (the third near-dup family)
# ---------------------------------------------------------------------------

def tfidf_cosine_pairs(docs: DataFrame, threshold: float = 0.3,
                       max_df: int | None = None) -> DataFrame:
    """Document pairs whose TF-IDF-weighted sparse cosine similarity is
    >= ``threshold`` — the bag-of-words similarity family: shingle
    Jaccard catches near-verbatim copies, dense-embedding cosine
    catches semantic paraphrase, and this catches topical/vocabulary
    overlap (same words, any order) that both miss.

    Weights are the module's integer micro-unit TF-IDF
    (``tf * floor(1e6*(ln((N+1)/(df+1))+1))``), so the pair dot product
    is an ORDER-INDEPENDENT integer sum and the only float ops are one
    sqrt/divide per pair — bit-exact cross-engine.

    Returns ``(x, y, n_shared, cos_sim)`` with x < y.

    Scale: candidates come from the term inverted index — cost is
    sum_t df_t^2 over SHARED terms only.  ``max_df`` caps the hot-term
    quadratic bomb: terms in more than ``max_df`` docs are dropped from
    the index (a ubiquitous term has idf ~ ln(1+eps) ~ 0 weight — it
    contributes nothing to the score but dominates the join), bounding
    per-term fan-out; the standard df-cut from the IR literature."""
    n_docs = docs.count()
    tf = term_freqs(docs)
    idf = tf.groupBy("term").agg(
        F.count("*").alias("df"),
        F.floor(
            MICRO
            * (F.log(F.lit(float(n_docs + 1))
                     / (F.count("*") + F.lit(1)).cast("double"))
               + F.lit(1.0))
        ).alias("w_micro"),
    )
    wt = (
        tf.join(idf, "term")
        .select("doc_id", "term", (F.col("tf") * F.col("w_micro")).alias("wt"),
                "df")
    )
    # decimal(38,0) sums: wt ~ tf * 1e7 squares to ~1e17 per element —
    # a long sum overflows right where the operator gets interesting
    # (DuckDB's integer SUM is already 128-bit)
    ssq = wt.groupBy("doc_id").agg(
        F.sum(F.col("wt").cast("decimal(38,0)") * F.col("wt")).alias("ssq"))
    indexed = wt if max_df is None else wt.filter(F.col("df") <= max_df)
    a, b = indexed.alias("a"), indexed.alias("b")
    dots = (
        a.join(b, (F.col("a.term") == F.col("b.term"))
               & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("x"), F.col("b.doc_id").alias("y"))
        .agg(F.count(F.lit(1)).alias("n_shared"),
             F.sum(F.col("a.wt").cast("decimal(38,0)")
                   * F.col("b.wt")).alias("intdot"))
    )
    sx = ssq.select(F.col("doc_id").alias("x"), F.col("ssq").alias("ssx"))
    sy = ssq.select(F.col("doc_id").alias("y"), F.col("ssq").alias("ssy"))
    return (
        dots.join(sx, "x").join(sy, "y")
        .select(
            "x", "y", "n_shared",
            (F.col("intdot").cast("double")
             / F.sqrt(F.col("ssx").cast("double")
                      * F.col("ssy").cast("double"))).alias("cos_sim"),
        )
        .filter(F.col("cos_sim") >= threshold)
    )


def tfidf_cosine_pairs_sql(threshold: float = 0.3,
                           max_df: int | None = None) -> str:
    from hbase_indexer_spark.pipeline.dedup import TOKS_SQL

    df_cut = "" if max_df is None else f"WHERE df <= {max_df}"
    return f"""
        WITH tf AS (
            SELECT doc_id, t.term, count(*) AS tf
            FROM (SELECT doc_id, unnest({TOKS_SQL}) AS term
                  FROM documents) t
            GROUP BY doc_id, t.term
        ),
        idf AS (
            SELECT term, count(*) AS df,
                   CAST(floor({MICRO} * (
                       ln(((SELECT count(*) FROM documents) + 1.0)
                          / CAST(count(*) + 1 AS DOUBLE)) + 1.0
                   )) AS BIGINT) AS w_micro
            FROM tf GROUP BY term
        ),
        wt AS (
            SELECT tf.doc_id, tf.term, tf.tf * idf.w_micro AS wt, idf.df
            FROM tf JOIN idf USING (term)
        ),
        ssq AS (
            SELECT doc_id, sum(wt * wt) AS ssq FROM wt GROUP BY doc_id
        ),
        indexed AS (SELECT * FROM wt {df_cut}),
        dots AS (
            SELECT a.doc_id AS x, b.doc_id AS y,
                   count(*) AS n_shared, sum(a.wt * b.wt) AS intdot
            FROM indexed a
            JOIN indexed b ON a.term = b.term AND a.doc_id < b.doc_id
            GROUP BY 1, 2
        )
        SELECT d.x, d.y, d.n_shared,
               CAST(d.intdot AS DOUBLE)
               / sqrt(CAST(sx.ssq AS DOUBLE) * CAST(sy.ssq AS DOUBLE))
                   AS cos_sim
        FROM dots d
        JOIN ssq sx ON d.x = sx.doc_id
        JOIN ssq sy ON d.y = sy.doc_id
        WHERE CAST(d.intdot AS DOUBLE)
              / sqrt(CAST(sx.ssq AS DOUBLE) * CAST(sy.ssq AS DOUBLE))
              >= {threshold}
    """


# ---------------------------------------------------------------------------
# NLL quality outliers (per-group z-test, exact integer arithmetic)
# ---------------------------------------------------------------------------

def nll_outliers(docs: DataFrame, z: int = 2,
                 group_col: str = "lang") -> DataFrame:
    """Flag documents whose unigram-NLL-per-token deviates more than
    ``z`` standard deviations from their group's mean — the outlier
    screen over the CCNet-style quality signal (gibberish scores high,
    boilerplate near zero; both tails are suspect).

    The z-test runs entirely in exact integer arithmetic on the
    micro-nat scores: ``|x - mean| > z*sigma`` rearranges to
    ``n*(n*x - s)^2 > z^2 * n * (n*q - s^2)`` with s = sum, q = sum of
    squares — no float mean/stddev, so the verdict is bit-exact
    cross-engine (DECIMAL(38) intermediates; micro-nat scores ~1e7
    squared times n^2 overflow BIGINT by design).

    Returns ``(doc_id, {group_col}, nll_micro_per_token, is_outlier)``
    (empty docs: NULL score, not outliers).

    Scale: the expensive input is :func:`unigram_logprob` (two
    combinable aggs); the group moments are G rows broadcast back."""
    nll = unigram_logprob(docs).join(
        docs.select("doc_id", group_col), "doc_id")
    x = F.col("nll_micro_per_token").cast("decimal(38,0)")
    moments = (
        nll.filter(F.col("n_tokens") > 0)
        .groupBy(group_col)
        .agg(
            F.count(F.lit(1)).cast("decimal(38,0)").alias("gn"),
            F.sum(x).alias("gs"),
            F.sum(x * x).alias("gq"),
        )
    )
    joined = nll.join(F.broadcast(moments), group_col, "left")
    n, s, q = F.col("gn"), F.col("gs"), F.col("gq")
    dev = n * x - s
    lhs = n * (dev * dev)
    rhs = F.lit(z * z).cast("decimal(38,0)") * n * (n * q - s * s)
    return joined.select(
        "doc_id", group_col, "nll_micro_per_token",
        F.when(F.col("n_tokens") > 0, lhs > rhs)
        .otherwise(F.lit(False)).alias("is_outlier"),
    )


def nll_outliers_sql(z: int = 2, group_col: str = "lang") -> str:
    return f"""
        WITH nll AS ({unigram_logprob_sql()}),
        g AS (
            SELECT d.{group_col} AS grp,
                   CAST(count(*) AS HUGEINT) AS gn,
                   CAST(sum(n.nll_micro_per_token) AS HUGEINT) AS gs,
                   CAST(sum(CAST(n.nll_micro_per_token AS HUGEINT)
                            * n.nll_micro_per_token) AS HUGEINT) AS gq
            FROM nll n JOIN documents d USING (doc_id)
            WHERE n.n_tokens > 0
            GROUP BY 1
        )
        SELECT n.doc_id, d.{group_col} AS {group_col},
               n.nll_micro_per_token,
               CASE WHEN n.n_tokens > 0 THEN
                   g.gn * (g.gn * n.nll_micro_per_token - g.gs)
                        * (g.gn * n.nll_micro_per_token - g.gs)
                   > {z * z} * g.gn * (g.gn * g.gq - g.gs * g.gs)
               ELSE FALSE END AS is_outlier
        FROM nll n
        JOIN documents d USING (doc_id)
        LEFT JOIN g ON d.{group_col} = g.grp
    """


# ---------------------------------------------------------------------------
# DSIR: data selection via importance resampling (Xie et al. 2023 recipe)
# ---------------------------------------------------------------------------

DSIR_BUCKETS = 1024
_HASH_SPACE_F = float(1 << 60)


def _bucket_tf(docs: DataFrame, n_buckets: int) -> DataFrame:
    """``(doc_id, b, tf)`` — hashed-unigram bucket frequencies, one
    combinable aggregation (the DSIR feature map: token -> md5 60-bit
    hash -> bucket, exactly reproducible in SQL)."""
    from hbase_indexer_spark.pipeline.text import token_hash60

    return (
        docs.select("doc_id",
                    F.explode(tokens(F.col("text"))).alias("term"))
        .select("doc_id",
                (token_hash60(F.col("term")) % n_buckets).alias("b"))
        .groupBy("doc_id", "b")
        .agg(F.count("*").alias("tf"))
    )


def dsir_selection(docs: DataFrame, target: DataFrame, k: int = 100,
                   n_buckets: int = DSIR_BUCKETS) -> DataFrame:
    """DSIR data selection: score every raw document by the
    log-likelihood ratio of its hashed-unigram bag under a TARGET-domain
    LM vs the RAW-corpus LM (add-1 smoothed over ``n_buckets`` hashed
    buckets), then Gumbel-top-``k`` resample — the public
    importance-resampling recipe for "pick web data that looks like the
    target domain".

    Determinism: bucket log-ratios are snapped to integer micro-nats the
    moment they are computed (one ``ln`` per BUCKET, not per token — the
    same float discipline as :func:`unigram_logprob`); the Gumbel noise
    is hash-derived from ``doc_id`` (md5 -> uniform -> -ln(-ln(u))), so
    the "random" draw is replayable and exactly mirrorable in SQL.

    Returns one row per raw doc: ``(doc_id, n_tokens, dsir_micro,
    score_micro, sampled)`` where ``score_micro = dsir_micro +
    gumbel_micro`` and ``sampled`` marks the top-``k`` by
    ``(score_micro DESC, doc_id)``.

    Scale: two combinable bucket-count aggs + one broadcast join of a
    ≤ ``n_buckets``-row weight table against per-doc bucket freqs; the
    top-k is TakeOrderedAndProject (per-partition heads, never a global
    sort) and the sampled flag comes back via a broadcast of k ids.
    Corpus scalars (token totals) are two bounded auxiliary aggs, the
    unigram_logprob precedent."""
    raw_total = docs.select(
        F.sum(F.size(tokens(F.col("text")))).alias("c")).first()[0] or 0
    tgt_total = target.select(
        F.sum(F.size(tokens(F.col("text")))).alias("c")).first()[0] or 0

    tfb = _bucket_tf(docs, n_buckets)
    raw_c = tfb.groupBy("b").agg(F.sum("tf").alias("rc"))
    tgt_c = _bucket_tf(target, n_buckets).groupBy("b").agg(
        F.sum("tf").alias("tc"))
    # numerator/denominator are exact-integer doubles (< 2^53), so the
    # division and the single ln see bit-identical inputs in both engines
    w = (
        raw_c.join(tgt_c, "b", "left")
        .select(
            "b",
            F.floor(F.lit(float(MICRO)) * F.log(
                ((F.coalesce(F.col("tc"), F.lit(0)) + 1).cast("double")
                 * F.lit(float(raw_total + n_buckets)))
                / ((F.col("rc") + 1).cast("double")
                   * F.lit(float(tgt_total + n_buckets)))
            )).cast("long").alias("w_micro"),
        )
    )
    per_doc = (
        tfb
        .join(F.broadcast(w), "b")
        .groupBy("doc_id")
        .agg(F.sum("tf").alias("n_tokens"),
             F.sum(F.col("tf") * F.col("w_micro")).alias("dsir_micro"))
    )
    from hbase_indexer_spark.pipeline.text import token_hash60 as h60

    u = ((h60(F.col("doc_id").cast("string")).cast("double") + F.lit(0.5))
         / F.lit(_HASH_SPACE_F))
    gumbel_micro = F.floor(F.lit(float(MICRO)) * -F.log(-F.log(u))) \
        .cast("long")
    scored = (
        docs.select("doc_id")
        .join(per_doc, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_tokens", F.lit(0)).cast("long").alias("n_tokens"),
            F.coalesce("dsir_micro", F.lit(0)).cast("long")
            .alias("dsir_micro"),
            (F.coalesce("dsir_micro", F.lit(0)) + gumbel_micro)
            .cast("long").alias("score_micro"),
        )
    )
    topk = (
        scored.orderBy(F.desc("score_micro"), F.asc("doc_id")).limit(k)
        .select("doc_id", F.lit(1).alias("_s"))
    )
    return (
        scored.join(F.broadcast(topk), "doc_id", "left")
        .select("doc_id", "n_tokens", "dsir_micro", "score_micro",
                F.coalesce("_s", F.lit(0)).cast("int").alias("sampled"))
    )


def dsir_selection_sql(target_pred: str = "doc_id % 7 = 0", k: int = 100,
                       n_buckets: int = DSIR_BUCKETS) -> str:
    from hbase_indexer_spark.pipeline.dedup import TOKS_SQL

    b = f"CAST(('0x' || substr(md5(t), 1, 15)) AS BIGINT) % {n_buckets}"
    return f"""
        WITH tb AS (
            SELECT doc_id, {b} AS b
            FROM (SELECT doc_id, unnest({TOKS_SQL}) AS t FROM documents)
        ),
        scal AS (
            SELECT (SELECT count(*) FROM tb) AS rt,
                   (SELECT count(*) FROM tb WHERE {target_pred}) AS tt
        ),
        rawc AS (SELECT b, count(*) AS rc FROM tb GROUP BY b),
        tgtc AS (SELECT b, count(*) AS tc
                 FROM tb WHERE {target_pred} GROUP BY b),
        w AS (
            SELECT rawc.b,
                   CAST(floor(1000000.0 * ln(
                       (CAST(coalesce(tgtc.tc, 0) + 1 AS DOUBLE)
                        * CAST(scal.rt + {n_buckets} AS DOUBLE))
                       / (CAST(rawc.rc + 1 AS DOUBLE)
                          * CAST(scal.tt + {n_buckets} AS DOUBLE))
                   )) AS BIGINT) AS w_micro
            FROM rawc LEFT JOIN tgtc ON rawc.b = tgtc.b CROSS JOIN scal
        ),
        per_doc AS (
            SELECT tb.doc_id, count(*) AS n_tokens,
                   sum(w.w_micro) AS dsir_micro
            FROM tb JOIN w USING (b)
            GROUP BY tb.doc_id
        ),
        scored AS (
            SELECT d.doc_id,
                   CAST(coalesce(p.n_tokens, 0) AS BIGINT) AS n_tokens,
                   CAST(coalesce(p.dsir_micro, 0) AS BIGINT) AS dsir_micro,
                   CAST(coalesce(p.dsir_micro, 0)
                        + CAST(floor(1000000.0 * -ln(-ln(
                            (CAST(CAST(('0x' || substr(
                                 md5(CAST(d.doc_id AS VARCHAR)), 1, 15))
                                 AS BIGINT) AS DOUBLE) + 0.5)
                            / 1152921504606846976.0
                        ))) AS BIGINT) AS BIGINT) AS score_micro
            FROM documents d LEFT JOIN per_doc p ON d.doc_id = p.doc_id
        )
        SELECT doc_id, n_tokens, dsir_micro, score_micro,
               CAST(CASE WHEN row_number() OVER (
                   ORDER BY score_micro DESC, doc_id) <= {k}
                   THEN 1 ELSE 0 END AS INTEGER) AS sampled
        FROM scored
    """


# ---------------------------------------------------------------------------
# Vocabulary encoding: corpus-built word vocab -> token-id sequences
# ---------------------------------------------------------------------------

def build_vocab(docs: DataFrame, size: int = 4096) -> DataFrame:
    """Top-``size`` corpus tokens by (count DESC, token ASC), assigned
    ids 1..size in that order (0 is reserved for OOV).  Returns
    ``(token, token_id)``.

    Scale: one combinable token-count shuffle, then TakeOrderedAndProject
    for the top-``size`` rows; the id-assigning window runs over that
    already-LIMITed ``size``-row frame (the G-row-broadcast boundedness
    class), never over the corpus."""
    counts = (
        docs.select(F.explode(tokens(F.col("text"))).alias("token"))
        .groupBy("token").agg(F.count(F.lit(1)).alias("cnt"))
    )
    top = counts.orderBy(F.desc("cnt"), F.asc("token")).limit(size)
    w = Window.orderBy(F.desc("cnt"), F.asc("token"))
    return top.select(
        "token", F.row_number().over(w).cast("int").alias("token_id"))


def vocab_encode(docs: DataFrame, size: int = 4096) -> DataFrame:
    """Encode every document as a token-id sequence under the
    :func:`build_vocab` word vocabulary — the tokenize step feeding the
    pack_sequences layout (word-level here; a trained BPE drops into the
    same join shape).  OOV tokens map to id 0.

    Returns ``(doc_id, n_tokens, n_oov, ids)`` with ``ids`` the
    unit-separator-joined id string (the gate convention for array
    output).

    Scale: explode + broadcast vocab join + per-doc sorted rebuild —
    groups bounded by tokens/doc; the vocab is ``size`` rows by
    construction, always broadcastable."""
    vocab = build_vocab(docs, size=size)
    toked = docs.select(
        "doc_id", F.posexplode(tokens(F.col("text"))).alias("p", "token"))
    joined = toked.join(F.broadcast(vocab), "token", "left").select(
        "doc_id", "p",
        F.coalesce("token_id", F.lit(0)).cast("int").alias("tid"))
    rebuilt = (
        joined.groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_tokens"),
             F.sum(F.when(F.col("tid") == 0, 1).otherwise(0)).alias("n_oov"),
             F.array_sort(F.collect_list(F.struct("p", "tid"))).alias("ts"))
        .select(
            "doc_id",
            F.col("n_tokens").cast("int").alias("n_tokens"),
            F.col("n_oov").cast("int").alias("n_oov"),
            F.array_join(
                F.transform(F.col("ts"),
                            lambda s: s["tid"].cast("string")),
                "\x1f").alias("ids"))
    )
    return (
        docs.select("doc_id").join(rebuilt, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_tokens", F.lit(0)).cast("int").alias("n_tokens"),
            F.coalesce("n_oov", F.lit(0)).cast("int").alias("n_oov"),
            F.coalesce("ids", F.lit("")).alias("ids"))
    )


def vocab_encode_sql(size: int = 4096, table: str = "documents") -> str:
    from hbase_indexer_spark.pipeline.dedup import TOKS_SQL

    return f"""
        WITH tk AS (SELECT doc_id, {TOKS_SQL} AS toks FROM {table}),
        counts AS (
            SELECT t AS token, count(*) AS cnt
            FROM (SELECT unnest(toks) AS t FROM tk)
            GROUP BY t
        ),
        vocab AS (
            SELECT token,
                   CAST(row_number() OVER (ORDER BY cnt DESC, token)
                        AS INTEGER) AS token_id
            FROM counts
            ORDER BY cnt DESC, token
            LIMIT {size}
        ),
        e AS (
            SELECT doc_id, generate_subscripts(toks, 1) AS p,
                   unnest(toks) AS token
            FROM tk
        ),
        j AS (
            SELECT e.doc_id, e.p,
                   coalesce(v.token_id, 0) AS tid
            FROM e LEFT JOIN vocab v ON e.token = v.token
        ),
        r AS (
            SELECT doc_id, count(*) AS n_tokens,
                   sum(CASE WHEN tid = 0 THEN 1 ELSE 0 END) AS n_oov,
                   string_agg(CAST(tid AS VARCHAR), chr(31) ORDER BY p)
                       AS ids
            FROM j GROUP BY doc_id
        )
        SELECT tk.doc_id,
               CAST(coalesce(r.n_tokens, 0) AS INTEGER) AS n_tokens,
               CAST(coalesce(r.n_oov, 0) AS INTEGER) AS n_oov,
               coalesce(r.ids, '') AS ids
        FROM tk LEFT JOIN r ON tk.doc_id = r.doc_id
    """


# ---------------------------------------------------------------------------
# Count-min sketch: mergeable heavy-hitter frequency estimates
# ---------------------------------------------------------------------------

CMS_DEPTH = 4
CMS_WIDTH = 256


def _cms_cell(term: Column, row: int, width: int) -> Column:
    """Row ``row``'s cell index for a term: an independent 60-bit hash
    per row via a row-salted key (md5 — the house cross-engine hash)."""
    from hbase_indexer_spark.pipeline.text import token_hash60

    return (token_hash60(F.concat(F.lit(f"cms{row}:"), term))
            % width).cast("int")


def count_min_sketch(docs: DataFrame, depth: int = CMS_DEPTH,
                     width: int = CMS_WIDTH) -> DataFrame:
    """The count-min sketch as a DataFrame: ``(row, cell, c)`` — each
    token increments one cell per hash row.  Unlike Misra-Gries-style
    heavy-hitter summaries, count-min is ORDER-INDEPENDENT and
    mergeable (cells are plain sums), so the distributed build is one
    combinable aggregation and two sketches union by adding cells —
    exactly reproducible in SQL.

    Scale: the sketch is ``depth x width`` longs regardless of corpus
    size; the build shuffles only (row, cell) keys with map-side
    combine."""
    from hbase_indexer_spark.pipeline.text import tokens

    toks = docs.select(F.explode(tokens(F.col("text"))).alias("term"))
    rows = toks.select(F.explode(F.array(*[
        F.struct(F.lit(r).alias("row"),
                 _cms_cell(F.col("term"), r, width).alias("cell"))
        for r in range(depth)])).alias("rc"))
    return (
        rows.select(F.col("rc.row").alias("row"),
                    F.col("rc.cell").alias("cell"))
        .groupBy("row", "cell")
        .agg(F.count(F.lit(1)).alias("c"))
    )


def cms_estimates(docs: DataFrame, k: int = 20, depth: int = CMS_DEPTH,
                  width: int = CMS_WIDTH) -> DataFrame:
    """Count-min frequency estimates for the corpus's top-``k`` true
    terms: ``(term, true_count, est_count)`` with ``est = min over rows
    of the term's cell`` — the classic one-sided guarantee
    (``est >= true``; overshoot bounded by collisions at ``width``).
    Emitting both sides makes the sketch's error auditable as data, the
    same pattern as ann_recall_report.

    Scale: sketch build as :func:`count_min_sketch`; the probe side is
    the top-``k`` term list (TakeOrdered) joined against the
    ``depth x width``-row sketch — both broadcastable by
    construction."""
    from hbase_indexer_spark.pipeline.text import tokens

    sketch = count_min_sketch(docs, depth=depth, width=width)
    counts = (
        docs.select(F.explode(tokens(F.col("text"))).alias("term"))
        .groupBy("term").agg(F.count(F.lit(1)).alias("true_count"))
    )
    top = counts.orderBy(F.desc("true_count"), F.asc("term")).limit(k)
    probes = top.select(
        "term", "true_count",
        F.explode(F.array(*[
            F.struct(F.lit(r).alias("row"),
                     _cms_cell(F.col("term"), r, width).alias("cell"))
            for r in range(depth)])).alias("rc")
    ).select("term", "true_count",
             F.col("rc.row").alias("row"), F.col("rc.cell").alias("cell"))
    return (
        probes.join(F.broadcast(sketch), ["row", "cell"])
        .groupBy("term", "true_count")
        .agg(F.min("c").cast("long").alias("est_count"))
    )


def cms_estimates_sql(k: int = 20, depth: int = CMS_DEPTH,
                      width: int = CMS_WIDTH) -> str:
    from hbase_indexer_spark.pipeline.dedup import TOKS_SQL

    def cell(row: int, term: str) -> str:
        return (f"CAST(('0x' || substr(md5('cms{row}:' || {term}), 1, 15))"
                f" AS BIGINT) % {width}")

    hash_rows = " UNION ALL ".join(
        f"SELECT term, {r} AS row, {cell(r, 'term')} AS cell FROM toks"
        for r in range(depth))
    probe_rows = " UNION ALL ".join(
        f"SELECT term, true_count, {r} AS row, {cell(r, 'term')} AS cell"
        f" FROM top"
        for r in range(depth))
    return f"""
        WITH toks AS (
            SELECT unnest({TOKS_SQL}) AS term FROM documents
        ),
        cells AS ({hash_rows}),
        sketch AS (
            SELECT row, cell, count(*) AS c FROM cells GROUP BY row, cell
        ),
        counts AS (
            SELECT term, count(*) AS true_count FROM toks GROUP BY term
        ),
        top AS (
            SELECT term, true_count FROM counts
            ORDER BY true_count DESC, term LIMIT {k}
        ),
        probes AS ({probe_rows})
        SELECT p.term, CAST(p.true_count AS BIGINT) AS true_count,
               CAST(min(s.c) AS BIGINT) AS est_count
        FROM probes p JOIN sketch s ON p.row = s.row AND p.cell = s.cell
        GROUP BY p.term, p.true_count
    """


def count_min_sketch_sql(depth: int = CMS_DEPTH,
                         width: int = CMS_WIDTH,
                         table: str = "documents") -> str:
    """Batch sketch mirror — also the oracle for the STREAMING
    accumulation (`streaming/sketch_stream.py cms_stream`): count-min is
    mergeable, so the streamed end state equals this one batch sketch
    exactly."""
    from hbase_indexer_spark.pipeline.dedup import TOKS_SQL

    hash_rows = " UNION ALL ".join(
        f"SELECT {r} AS row, CAST(('0x' || substr(md5('cms{r}:' || term),"
        f" 1, 15)) AS BIGINT) % {width} AS cell FROM toks"
        for r in range(depth))
    return f"""
        WITH toks AS (
            SELECT unnest({TOKS_SQL}) AS term FROM {table}
        ),
        cells AS ({hash_rows})
        SELECT CAST(row AS INTEGER) AS row, CAST(cell AS INTEGER) AS cell,
               CAST(count(*) AS BIGINT) AS c
        FROM cells GROUP BY row, cell
    """

# ---------------------------------------------------------------------------
# HyperLogLog: mergeable distinct-count sketch (register-level, exact replay)
# ---------------------------------------------------------------------------

HLL_P = 6
HLL_M = 1 << HLL_P                      # 64 registers
# alpha_64 = 0.7213 / (1 + 1.079/64), snapped to integer micro-units so
# both engines apply the identical constant.
HLL_ALPHA_MICRO = 709341
_HLL_SCALE = 1 << 33                    # 2^33: rho in [1,33] -> shift >= 0
_HLL_INNER = HLL_M * HLL_M * _HLL_SCALE  # m^2 * 2^33 = 2^45


def hll_registers(df: DataFrame, key: Column,
                  group: str) -> DataFrame:
    """The HLL register table as a DataFrame: ``(group, reg, mr)`` where
    ``reg`` is the key-hash's low ``HLL_P`` bits and ``mr`` the max over
    keys of ``rho`` = 1 + leading zeros of the next 32 hash bits
    (``33 - length(bin(w))``, the cross-engine trick: both Spark and
    DuckDB ``bin()`` render without leading zeros).  Registers are
    max-mergeable, so the build is ONE combinable aggregation and two
    sketches union by register-wise max — the same mergeability story as
    the count-min sketch above.

    NULL keys are dropped (count-distinct semantics: NULL is not a
    value) — without the filter a NULL key would emit a (grp, NULL,
    NULL) register row that sum() skips but count(*) counts, skewing
    the estimate.

    Scale: the sketch is ``HLL_M`` rows per group regardless of key
    cardinality; the build shuffles only (group, reg) with map-side
    max-combine."""
    from hbase_indexer_spark.pipeline.text import token_hash60

    h = token_hash60(F.concat(F.lit("hll:"), key.cast("string")))
    return (
        df.filter(key.isNotNull())
        .select(F.col(group).alias("grp"),
                (h % HLL_M).cast("int").alias("reg"),
                h.alias("_h"))
        .select("grp", "reg",
                F.expr(f"_h div {HLL_M} % 4294967296").alias("w"))
        .select("grp", "reg",
                F.when(F.col("w") == 0, F.lit(33))
                .otherwise(F.lit(33) - F.length(F.bin(F.col("w"))))
                .cast("int").alias("rho"))
        .groupBy("grp", "reg").agg(F.max("rho").alias("mr"))
    )


def hll_distinct(df: DataFrame, key: Column, group: str) -> DataFrame:
    """Per-group HLL distinct-count estimate next to the exact count:
    ``(group, true_distinct, est_distinct)`` — the sketch's error is
    emitted as data (the ann_recall_report / cms_estimates pattern), and
    the whole computation is integer fixed point so the DuckDB oracle
    replays the identical registers and the identical estimate.

    ``est = (ALPHA_MICRO * ((m^2 * 2^33) div S)) div 1e6`` where
    ``S = sum over registers of 2^(33 - rho)`` with absent registers
    contributing ``2^33`` (rho = 0).  Raw HLL estimate — no small-range
    linear-counting correction (it needs a float ``ln``); the point is
    engine-vs-oracle equality, and the raw bias is visible against
    ``true_distinct`` in the output.

    Scale: register build as :func:`hll_registers`; the exact side is
    one distinct-count per group (itself combinable) and exists only to
    make the report auditable — at 100 TB, drop it and keep the
    sketch."""
    regs = hll_registers(df, key, group)
    sketch = (
        regs.groupBy("grp")
        .agg(F.sum(F.expr("CAST(1 AS BIGINT) << (33 - mr)")).alias("sp"),
             F.count(F.lit(1)).alias("nr"))
        .select(
            "grp",
            F.expr(f"sp + ({HLL_M} - nr) * CAST({_HLL_SCALE} AS BIGINT)")
            .alias("s_total"))
        .select(
            "grp",
            F.expr(f"({HLL_ALPHA_MICRO} * ({_HLL_INNER} div s_total))"
                   f" div 1000000").cast("long").alias("est_distinct"))
    )
    true = (df.groupBy(F.col(group).alias("grp"))
            .agg(F.countDistinct(key).cast("long").alias("true_distinct")))
    # left join + coalesce: a group whose keys are ALL NULL has no
    # registers (hll_registers drops NULL keys) but still deserves a
    # (group, 0, 0) row, matching countDistinct's NULL semantics.
    # NULL-SAFE equality (r5 ADVICE): a NULL group KEY is a real group to
    # both engines' GROUP BY, but a plain equi-join would never match it —
    # the sketch row would be dropped and the NULL group mis-reported as
    # est 0 while true > 0.  eqNullSafe here, IS NOT DISTINCT FROM in the
    # mirror.
    sk = sketch.select(F.col("grp").alias("sk_grp"), "est_distinct")
    return (true.join(sk, F.col("grp").eqNullSafe(F.col("sk_grp")), "left")
            .select(F.col("grp").alias(group), "true_distinct",
                    F.coalesce("est_distinct", F.lit(0)).cast("long")
                    .alias("est_distinct")))


def hll_distinct_sql(key_expr: str, group: str,
                     table: str = "events") -> str:
    # compose the register mirror (single source of the hash recipe —
    # including its NULL-key filter) rather than restating it
    regs = hll_registers_sql(key_expr, group, table)
    return f"""
        WITH regs AS ({regs}),
        sk AS (
            SELECT grp,
                   CAST(sum(CAST(1 AS BIGINT) << (33 - mr)) AS BIGINT)
                     + ({HLL_M} - count(*)) * CAST({_HLL_SCALE} AS BIGINT)
                     AS s_total
            FROM regs GROUP BY grp
        ),
        est AS (
            SELECT grp,
                   CAST(({HLL_ALPHA_MICRO} * ({_HLL_INNER} // s_total))
                        // 1000000 AS BIGINT) AS est_distinct
            FROM sk
        ),
        tr AS (
            SELECT {group} AS grp,
                   CAST(count(DISTINCT {key_expr}) AS BIGINT)
                     AS true_distinct
            FROM {table} GROUP BY {group}
        )
        SELECT t.grp AS {group}, t.true_distinct,
               CAST(coalesce(e.est_distinct, 0) AS BIGINT)
                   AS est_distinct
        FROM tr t LEFT JOIN est e ON t.grp IS NOT DISTINCT FROM e.grp
    """


def hll_registers_sql(key_expr: str, group: str,
                      table: str = "events") -> str:
    """Batch register mirror — also the oracle for the STREAMING
    accumulation (`streaming/sketch_stream.py hll_stream`): registers
    merge by max, so the streamed end state equals this one batch
    register table exactly.  NULL keys are dropped, matching
    ``hll_registers``."""
    return f"""
        WITH h AS (
            SELECT {group} AS grp,
                   CAST(('0x' || substr(md5('hll:' || {key_expr}), 1, 15))
                        AS BIGINT) AS h
            FROM {table}
            WHERE {key_expr} IS NOT NULL
        ),
        rw AS (
            SELECT grp, h % {HLL_M} AS reg,
                   (h // {HLL_M}) % 4294967296 AS w
            FROM h
        )
        SELECT grp, CAST(reg AS INTEGER) AS reg,
               CAST(max(CASE WHEN w = 0 THEN 33
                        ELSE 33 - length(bin(CAST(w AS BIGINT))) END)
                    AS INTEGER) AS mr
        FROM rw GROUP BY grp, reg
    """


# ---------------------------------------------------------------------------
# Histogram quantile sketch: mergeable equi-width buckets, rank-exact audit
# ---------------------------------------------------------------------------

HQ_BINS = 256


def histogram_quantiles(df: DataFrame, value_col: str, group: str,
                        qs: tuple = (50, 90, 99)) -> DataFrame:
    """Quantile estimates from a mergeable equi-width histogram —
    percentiles at 100 TB without a global sort.  The sketch family's
    ordered-statistics leg (count-min = frequency, HLL = distinct,
    bloom = membership): the histogram is ``HQ_BINS`` counts per group,
    buckets are plain sums so two sketches merge by adding, and the
    whole computation is integer fixed point (values snap to micro
    units, bucketing is ``((v - lo) * B) div span`` — exact in both
    engines).

    Returns ``(group, q_pct, n, target_rank, est_micro, true_micro)``
    per requested percentile: ``est`` is the answering bucket's lower
    edge; ``true`` is the exact rank-``ceil(q*n/100)`` order statistic,
    emitted next to it so the sketch's bucket-width error is auditable
    as data (the cms_estimates / hll_distinct pattern).

    Scale: min/max/count and the histogram are combinable aggregations;
    the cumulative pass windows over <= ``HQ_BINS`` rows per group —
    bounded, never corpus-sized.  The TRUE side is the audit: it ranks
    values per group (a per-group sort) — at full scale drop it, or
    narrow to the answering bucket first and rank only that slice."""
    # NULL values are dropped up front: a NULL would inflate n, put a
    # NULL bucket into the cumulative window, and diverge between
    # engines (Spark sorts NULLS FIRST, DuckDB NULLS LAST)
    #
    # Domain guards (r5 ADVICE): the micro-snap silently wraps int64 for
    # |value| > ~9.2e12, and the bucket product ``(v - lo) * HQ_BINS``
    # wraps when a group's span exceeds 2^63 // HQ_BINS micro-units —
    # DuckDB errors on either while non-ANSI Spark wraps, so the engine
    # and oracle would diverge exactly when it happens.  Guard both so
    # an out-of-domain corpus fails LOUDLY instead of mis-estimating.
    v_abs_max = (1 << 63) // 1_000_000 - 1  # micro-snap stays in int64
    v_raw = F.col(value_col)
    v = F.when(
        F.abs(v_raw) <= F.lit(float(v_abs_max)),
        F.expr(f"CAST(floor({value_col} * 1e6 + 0.5) AS BIGINT)"),
    ).otherwise(F.raise_error(F.lit(
        f"histogram_quantiles: |{value_col}| exceeds {v_abs_max} "
        "(int64 micro-snap domain)")))
    snapped = (df.filter(F.col(value_col).isNotNull())
               .select(F.col(group).alias("grp"), v.alias("v")))
    span_max = (1 << 63) // HQ_BINS  # (v - lo + 1) * HQ_BINS stays in int64
    # The guard itself must not overflow: hi and lo are each bounded by
    # ~9.2e18 micro, so hi - lo in int64 can wrap (or throw under ANSI)
    # before the comparison happens — compare in double instead, with a
    # 4096-micro safety margin absorbing the cast rounding (ulp near
    # 9.2e18 is 2048): a borderline span always lands on the LOUD-error
    # side, never through to a wrapped bucket product.
    stats = snapped.groupBy("grp").agg(
        F.min("v").alias("lo"), F.max("v").alias("hi"),
        F.count(F.lit(1)).alias("n")
    ).select(
        "grp",
        F.when(
            F.col("hi").cast("double") - F.col("lo").cast("double")
            < F.lit(float(span_max - 4096)),
            F.col("lo"))
        .otherwise(F.raise_error(F.lit(
            f"histogram_quantiles: group span exceeds {span_max} "
            "micro-units (bucket product would wrap int64)"))).alias("lo"),
        "hi", "n",
    )
    j = snapped.join(F.broadcast(stats), "grp")
    hist = (
        j.select("grp",
                 F.expr(f"((v - lo) * {HQ_BINS}) div (hi - lo + 1)")
                 .alias("bucket"))
        .groupBy("grp", "bucket").agg(F.count(F.lit(1)).alias("c"))
    )
    w = (Window.partitionBy("grp").orderBy("bucket")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    cum = hist.withColumn("cum", F.sum("c").over(w))
    targets = stats.select(
        "grp", "lo", "hi", "n",
        F.explode(F.array(*[F.lit(q) for q in qs])).alias("q_pct")
    ).withColumn("r", F.expr("(q_pct * n + 99) div 100"))
    est = (
        targets.join(cum, "grp")
        .filter(F.col("cum") >= F.col("r"))
        .groupBy("grp", "q_pct", "n", "r", "lo", "hi")
        .agg(F.min("bucket").alias("bucket"))
        .select("grp", "q_pct", "n", "r",
                F.expr(f"lo + (bucket * (hi - lo + 1)) div {HQ_BINS}")
                .alias("est_micro"))
    )
    rn = Window.partitionBy("grp").orderBy("v")
    # distinct column names on the ranked side: est descends from the
    # same snapped lineage, and a bare grp == grp would resolve as a
    # trivially-true self-compare
    ranked = (snapped.withColumn("rn", F.row_number().over(rn))
              .select(F.col("grp").alias("rk_grp"),
                      F.col("v").alias("true_micro"),
                      F.col("rn").alias("rk_rn")))
    return (
        est.join(ranked, (F.col("grp") == F.col("rk_grp"))
                 & (F.col("r") == F.col("rk_rn")))
        .select(F.col("grp").alias(group), "q_pct", "n",
                F.col("r").alias("target_rank"),
                "est_micro", "true_micro")
    )


def histogram_quantiles_sql(value_col: str, group: str,
                            table: str = "events",
                            qs: tuple = (50, 90, 99)) -> str:
    q_rows = " UNION ALL ".join(f"SELECT {q} AS q_pct" for q in qs)
    return f"""
        WITH snapped AS (
            SELECT {group} AS grp,
                   CAST(floor({value_col} * 1e6 + 0.5) AS BIGINT) AS v
            FROM {table}
            WHERE {value_col} IS NOT NULL
        ),
        stats AS (
            SELECT grp, min(v) AS lo, max(v) AS hi,
                   count(*) AS n
            FROM snapped GROUP BY grp
        ),
        hist AS (
            SELECT s.grp,
                   ((s.v - t.lo) * {HQ_BINS}) // (t.hi - t.lo + 1)
                       AS bucket,
                   count(*) AS c
            FROM snapped s JOIN stats t ON s.grp = t.grp
            GROUP BY s.grp, bucket
        ),
        cum AS (
            SELECT grp, bucket, c,
                   sum(c) OVER (PARTITION BY grp ORDER BY bucket
                                ROWS UNBOUNDED PRECEDING) AS cum
            FROM hist
        ),
        targets AS (
            SELECT t.grp, t.lo, t.hi, t.n, q.q_pct,
                   (q.q_pct * t.n + 99) // 100 AS r
            FROM stats t CROSS JOIN ({q_rows}) q
        ),
        est AS (
            SELECT t.grp, t.q_pct, t.n, t.r,
                   t.lo + (min(c.bucket) * (t.hi - t.lo + 1))
                       // {HQ_BINS} AS est_micro
            FROM targets t JOIN cum c ON t.grp = c.grp
            WHERE c.cum >= t.r
            GROUP BY t.grp, t.q_pct, t.n, t.r, t.lo, t.hi
        ),
        ranked AS (
            SELECT grp, v,
                   row_number() OVER (PARTITION BY grp ORDER BY v) AS rn
            FROM snapped
        )
        SELECT e.grp AS {group},
               CAST(e.q_pct AS INTEGER) AS q_pct,
               CAST(e.n AS BIGINT) AS n,
               CAST(e.r AS BIGINT) AS target_rank,
               CAST(e.est_micro AS BIGINT) AS est_micro,
               CAST(rk.v AS BIGINT) AS true_micro
        FROM est e JOIN ranked rk ON e.grp = rk.grp AND e.r = rk.rn
    """


def selfjoin_size_estimate(df: DataFrame, key: Column,
                           depth: int = CMS_DEPTH,
                           width: int = CMS_WIDTH) -> DataFrame:
    """Second-moment (self-join size) estimate from the count-min
    sketch: ``F2 = sum over keys of count(key)^2`` predicts the row
    count of a self-equijoin — THE number a planner needs to foresee
    shuffle skew before paying for it.  The estimate is the min over
    sketch rows of ``sum over cells of c^2`` (the AMS inner-product
    trick on CMS rows); like cms_estimates it is one-sided
    (``est >= true``, collision overcount bounded by width).

    Returns ONE row ``(n_rows, n_keys, true_f2, est_f2)`` — exact F2
    next to the estimate, error auditable as data.

    Scale: the sketch build is one combinable (row, cell) shuffle; the
    estimate folds ``depth x width`` cells.  The TRUE side is itself
    just a per-key count (combinable) and exists as the audit — at
    100 TB keep the sketch, which also MERGES across shards (cells add,
    squares fold after the merge)."""
    cells = (
        df.select(F.explode(F.array(*[
            F.struct(F.lit(r).alias("row"),
                     _cms_cell(key, r, width).alias("cell"))
            for r in range(depth)])).alias("rc"))
        .select(F.col("rc.row").alias("row"),
                F.col("rc.cell").alias("cell"))
        .groupBy("row", "cell").agg(F.count(F.lit(1)).alias("c"))
    )
    est = (cells.groupBy("row")
           .agg(F.sum(F.expr("c * c")).alias("f2"))
           .agg(F.min("f2").cast("long").alias("est_f2")))
    true = (df.groupBy(key.alias("k"))
            .agg(F.count(F.lit(1)).alias("n"))
            .agg(F.sum(F.lit(1)).cast("long").alias("n_keys"),
                 F.sum("n").cast("long").alias("n_rows"),
                 F.sum(F.expr("n * n")).cast("long").alias("true_f2")))
    return true.crossJoin(est).select("n_rows", "n_keys", "true_f2",
                                      "est_f2")


def selfjoin_size_estimate_sql(key_expr: str, table: str,
                               depth: int = CMS_DEPTH,
                               width: int = CMS_WIDTH) -> str:
    def cell(row: int) -> str:
        return (f"CAST(('0x' || substr(md5('cms{row}:' || {key_expr}),"
                f" 1, 15)) AS BIGINT) % {width}")

    hash_rows = " UNION ALL ".join(
        f"SELECT {r} AS row, {cell(r)} AS cell FROM {table}"
        for r in range(depth))
    return f"""
        WITH cells AS ({hash_rows}),
        sketch AS (
            SELECT row, cell, count(*) AS c FROM cells
            GROUP BY row, cell
        ),
        est AS (
            SELECT CAST(min(f2) AS BIGINT) AS est_f2
            FROM (SELECT row, sum(c * c) AS f2 FROM sketch
                  GROUP BY row) t
        ),
        tru AS (
            SELECT CAST(sum(n) AS BIGINT) AS n_rows,
                   CAST(count(*) AS BIGINT) AS n_keys,
                   CAST(sum(n * n) AS BIGINT) AS true_f2
            FROM (SELECT {key_expr} AS k, count(*) AS n FROM {table}
                  GROUP BY {key_expr}) t
        )
        SELECT t.n_rows, t.n_keys, t.true_f2, e.est_f2
        FROM tru t CROSS JOIN est e
    """


def column_profile(df: DataFrame, cols: list[str]) -> DataFrame:
    """Data-quality profile: one row per column with
    ``(column, n_rows, n_null, true_distinct, est_distinct)`` —
    completeness and cardinality, the checks an ingest pipeline runs
    before accepting a new corpus drop (the Deequ/dbt-test shape).

    Cardinality rides :func:`hll_distinct` (64 max-mergeable registers)
    with the exact count beside it; values hash via their string cast,
    so profile integer/string columns — float-to-string rendering is
    not guaranteed identical across engines.

    Scale: one combinable pass per profiled column (count + null count
    + register build); nothing is ever collected.  For very wide
    tables, profile columns in batches and union the outputs."""
    # union BEFORE aggregating: per-column frames would carry a
    # CONSTANT 'column' literal, and Catalyst folds the counts⋈dist
    # equi-join on it into a trivially-true nested loop; over the union
    # the key genuinely varies and the join hashes
    base = None
    for c in cols:
        part = df.select(F.lit(c).alias("column"),
                         F.col(c).cast("string").alias("k"))
        base = part if base is None else base.unionByName(part)
    counts = base.groupBy("column").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count(F.when(F.col("k").isNull(), 1)).alias("n_null"))
    dist = hll_distinct(base, F.col("k"), "column")
    return (counts.join(dist, "column")
            .select("column", "n_rows", F.col("n_null").cast("long")
                    .alias("n_null"), "true_distinct", "est_distinct"))


def column_profile_sql(cols: list[str], table: str = "events") -> str:
    parts = []
    for c in cols:
        derived = (f"(SELECT '{c}' AS col_name, "
                   f"CAST({c} AS VARCHAR) AS k FROM {table})")
        hll = hll_distinct_sql("k", "col_name", table=derived)
        parts.append(f"""
            SELECT c.col_name AS "column",
                   CAST(c.n_rows AS BIGINT) AS n_rows,
                   CAST(c.n_null AS BIGINT) AS n_null,
                   d.true_distinct, d.est_distinct
            FROM (SELECT '{c}' AS col_name, count(*) AS n_rows,
                         count(*) FILTER ({c} IS NULL) AS n_null
                  FROM {table}) c
            JOIN ({hll}) d ON c.col_name = d.col_name
        """)
    return " UNION ALL ".join(parts)


# ---------------------------------------------------------------------------
# Exact per-group quantiles (the audit-grade sibling of histogram_quantiles)
# ---------------------------------------------------------------------------


def exact_group_quantiles(df: DataFrame, group: str, value_col: str,
                          qs: tuple[int, ...] = (50, 90, 99)) -> DataFrame:
    """EXACT discontinuous quantiles per group: for each percent q, the
    smallest value whose cumulative count reaches ``ceil(q*n/100)`` —
    type-1/disc semantics, pure integer arithmetic, so Spark and the
    oracle agree bit-for-bit (no interpolation, no floats).

    Plan: one combinable ``groupBy(group, value)`` count (the only
    full-data shuffle), a running sum over the DISTINCT values windowed
    ``partitionBy(group)`` (parallel across groups; within a group the
    sort is over distinct values, not rows), the G-row totals broadcast
    back, and a q-literal explode + combinable ``min`` per (group, q).

    Scale honesty: cost is bounded by distinct values per group — the
    right tool for audit passes and bounded domains (lengths, scores,
    day buckets).  For unbounded/continuous domains at 100 TB use
    :func:`histogram_quantiles` (constant-size mergeable sketch) and
    keep this as its spot-check."""
    # NULL values are dropped (quantile-of-what semantics, and the
    # engines ORDER them differently: Spark windows put NULLS FIRST
    # ascending, DuckDB NULLS LAST — keeping them would silently shift
    # every cumulative count)
    counts = (df.filter(F.col(value_col).isNotNull())
              .groupBy(F.col(group).alias("g"),
                       F.col(value_col).cast("long").alias("v"))
              .agg(F.count(F.lit(1)).alias("c")))
    w = Window.partitionBy("g").orderBy("v")
    cum = counts.withColumn("cum", F.sum("c").over(w))
    totals = counts.groupBy("g").agg(F.sum("c").alias("n"))
    qlit = F.explode(F.array(*[F.lit(int(q)) for q in qs])).alias("q")
    return (cum.join(F.broadcast(totals), "g")
            .select("g", "v", "cum", "n", qlit)
            .filter(F.lit(100) * F.col("cum") >= F.col("q") * F.col("n"))
            .groupBy("g", "q", "n")
            .agg(F.min("v").alias("value"))
            .select(F.col("g").alias(group), "q", "value", "n")
            .orderBy(group, "q"))


def exact_group_quantiles_sql(group: str, value_col: str, table: str,
                              qs: tuple[int, ...] = (50, 90, 99)) -> str:
    vals = ", ".join(f"({int(q)})" for q in qs)
    return f"""
        WITH counts AS (
            SELECT {group} AS g, CAST({value_col} AS BIGINT) AS v,
                   count(*) AS c
            FROM {table} WHERE {value_col} IS NOT NULL GROUP BY 1, 2
        ),
        cum AS (
            SELECT g, v, c,
                   sum(c) OVER (PARTITION BY g ORDER BY v) AS cum
            FROM counts
        ),
        tot AS (SELECT g, CAST(sum(c) AS BIGINT) AS n
                FROM counts GROUP BY g),
        qs(q) AS (VALUES {vals})
        SELECT g AS {group}, q, MIN(v) AS value, n
        FROM cum JOIN tot USING (g) CROSS JOIN qs
        WHERE 100 * cum >= q * n
        GROUP BY g, q, n
        ORDER BY {group}, q
    """


# ---------------------------------------------------------------------------
# HLL sketch ALGEBRA: pairwise segment overlap via union-merge +
# inclusion-exclusion (the composability argument for sketches at scale)
# ---------------------------------------------------------------------------


def hll_overlap(df: DataFrame, key: Column, group: str) -> DataFrame:
    """Pairwise distinct-key overlap between segments, estimated from
    sketch algebra alone: the union of two HLL sketches is the
    register-wise MAX, so ``|A ∩ B| ≈ est(A) + est(B) - est(A ∪ B)``
    (inclusion-exclusion) — no re-scan of the data per pair, which is
    the whole point at 100 TB: one register build, then G² arithmetic
    over 64-row sketches.

    Returns ``(seg_a, seg_b, true_overlap, est_overlap)`` for every
    unordered pair (seg_a < seg_b), estimate clamped at 0.  The exact
    side is the audit column (the hll_distinct / cms_estimates
    pattern) — at 100 TB drop it and keep the sketch.

    Scale: ONE combinable register build (64 rows/group), pair
    expansion over the G-row group list (aggregate-sized theta join),
    register-wise max + the fixed-point estimator per pair; the exact
    side is one (key-distinct) self-join keyed by key."""
    regs = hll_registers(df, key, group)

    def est(frame: DataFrame, grp_cols: list[str], out: str) -> DataFrame:
        return (
            frame.groupBy(*grp_cols)
            .agg(F.sum(F.expr("CAST(1 AS BIGINT) << (33 - mr)")).alias("sp"),
                 F.count(F.lit(1)).alias("nr"))
            .select(*grp_cols,
                    F.expr(f"sp + ({HLL_M} - nr) * CAST({_HLL_SCALE} AS BIGINT)")
                    .alias("s_total"))
            .select(*grp_cols,
                    F.expr(f"({HLL_ALPHA_MICRO} * ({_HLL_INNER} div s_total))"
                           f" div 1000000").cast("long").alias(out)))

    singles = est(regs, ["grp"], "est")
    groups = regs.select("grp").distinct()
    pairs = (groups.select(F.col("grp").alias("seg_a"))
             .join(groups.select(F.col("grp").alias("seg_b")),
                   F.col("seg_a") < F.col("seg_b")))
    a = regs.select(F.col("grp").alias("seg_a"), "reg",
                    F.col("mr").alias("mr"))
    b = regs.select(F.col("grp").alias("seg_b"), "reg",
                    F.col("mr").alias("mr"))
    union_regs = (
        pairs.join(a, "seg_a").select("seg_a", "seg_b", "reg", "mr")
        .unionByName(
            pairs.join(b, "seg_b").select("seg_a", "seg_b", "reg", "mr"))
        .groupBy("seg_a", "seg_b", "reg").agg(F.max("mr").alias("mr")))
    union_est = est(union_regs, ["seg_a", "seg_b"], "est_union")

    ea = singles.select(F.col("grp").alias("seg_a"), F.col("est").alias("ea"))
    eb = singles.select(F.col("grp").alias("seg_b"), F.col("est").alias("eb"))
    sketch = (union_est.join(F.broadcast(ea), "seg_a")
              .join(F.broadcast(eb), "seg_b")
              .select("seg_a", "seg_b",
                      F.greatest(F.col("ea") + F.col("eb")
                                 - F.col("est_union"),
                                 F.lit(0).cast("long")).alias("est_overlap")))

    dk = (df.filter(key.isNotNull())
          .select(F.col(group).alias("g"), key.alias("k")).distinct())
    true_pairs = (
        dk.select(F.col("g").alias("seg_a"), "k")
        .join(dk.select(F.col("g").alias("seg_b"), "k"), "k")
        .filter(F.col("seg_a") < F.col("seg_b"))
        .groupBy("seg_a", "seg_b")
        .agg(F.count(F.lit(1)).cast("long").alias("true_overlap")))

    return (pairs.join(true_pairs, ["seg_a", "seg_b"], "left")
            .join(sketch, ["seg_a", "seg_b"], "left")
            .select("seg_a", "seg_b",
                    F.coalesce("true_overlap", F.lit(0)).cast("long")
                    .alias("true_overlap"),
                    F.coalesce("est_overlap", F.lit(0)).cast("long")
                    .alias("est_overlap"))
            .orderBy("seg_a", "seg_b"))


def hll_overlap_sql(key_expr: str, group: str,
                    table: str = "events") -> str:
    regs = hll_registers_sql(key_expr, group, table)
    s_total = (f"CAST(sum(CAST(1 AS BIGINT) << (33 - mr)) AS BIGINT) "
               f"+ ({HLL_M} - count(*)) * CAST({_HLL_SCALE} AS BIGINT)")
    est = (f"CAST(({HLL_ALPHA_MICRO} * ({_HLL_INNER} // ({s_total}))) "
           f"// 1000000 AS BIGINT)")
    return f"""
        WITH regs AS ({regs}),
        singles AS (
            SELECT grp, {est} AS est
            FROM regs GROUP BY grp
        ),
        pairs AS (
            SELECT a.grp AS seg_a, b.grp AS seg_b
            FROM (SELECT DISTINCT grp FROM regs) a
            JOIN (SELECT DISTINCT grp FROM regs) b ON a.grp < b.grp
        ),
        union_regs AS (
            SELECT seg_a, seg_b, reg, max(mr) AS mr FROM (
                SELECT p.seg_a, p.seg_b, r.reg, r.mr
                FROM pairs p JOIN regs r ON r.grp = p.seg_a
                UNION ALL
                SELECT p.seg_a, p.seg_b, r.reg, r.mr
                FROM pairs p JOIN regs r ON r.grp = p.seg_b
            ) GROUP BY seg_a, seg_b, reg
        ),
        union_est AS (
            SELECT seg_a, seg_b, {est} AS est_union
            FROM union_regs GROUP BY seg_a, seg_b
        ),
        sk AS (
            SELECT u.seg_a, u.seg_b,
                   greatest(ea.est + eb.est - u.est_union,
                            CAST(0 AS BIGINT)) AS est_overlap
            FROM union_est u
            JOIN singles ea ON ea.grp = u.seg_a
            JOIN singles eb ON eb.grp = u.seg_b
        ),
        dk AS (
            SELECT DISTINCT {group} AS g, {key_expr} AS k
            FROM {table} WHERE {key_expr} IS NOT NULL
        ),
        tru AS (
            SELECT a.g AS seg_a, b.g AS seg_b,
                   CAST(count(*) AS BIGINT) AS true_overlap
            FROM dk a JOIN dk b ON a.k = b.k AND a.g < b.g
            GROUP BY a.g, b.g
        )
        SELECT p.seg_a, p.seg_b,
               CAST(COALESCE(t.true_overlap, 0) AS BIGINT) AS true_overlap,
               CAST(COALESCE(s.est_overlap, 0) AS BIGINT) AS est_overlap
        FROM pairs p
        LEFT JOIN tru t ON t.seg_a = p.seg_a AND t.seg_b = p.seg_b
        LEFT JOIN sk s ON s.seg_a = p.seg_a AND s.seg_b = p.seg_b
        ORDER BY p.seg_a, p.seg_b
    """


# ---------------------------------------------------------------------------
# Span-level quality: the sliding-window unigram-NLL boilerplate detector
# ---------------------------------------------------------------------------


def low_quality_spans(docs: DataFrame, window: int = 20) -> DataFrame:
    """Per-document WORST (lowest-surprise) token span under the corpus
    unigram LM: the C4/Dolma-style span-level cleaning signal — a doc
    whose minimum ``window``-token mean NLL is near zero carries
    boilerplate (navigation chrome, repeated filler) even when its
    whole-doc NLL looks healthy.

    For every position p with ``p + window <= n_tokens``, the span score
    is ``sum over the window of floor(1e6 * ln(C / c_t))`` (the
    :func:`unigram_logprob` weights, integer micro-nats); the emitted
    row is the doc's MINIMUM span, tie-broken to the smallest start —
    deterministic via min over a (score, pos) struct, never ``min_by``.
    Docs shorter than ``window`` tokens are absent (no full span).

    Returns ``(doc_id, n_tokens, span_start, span_nll_micro)`` with
    1-based ``span_start``.

    Scale: weights are one combinable term aggregation (vocab-sized,
    AQE-broadcast when small); the per-token frame joins weights on the
    term key, and the sliding sum is a ``rowsBetween`` frame window
    partitioned BY DOC — parallel across docs, never a global sort.
    The corpus token total is a 1-row aggregate (same bounded collect
    as unigram_logprob)."""
    total = docs.select(
        F.sum(F.size(tokens(F.col("text")))).alias("c")).first()[0] or 0
    tf = term_freqs(docs)
    weights = tf.groupBy("term").agg(
        F.floor(
            MICRO * F.log(F.lit(float(total)) / F.sum("tf").cast("double"))
        ).alias("w_micro"))
    toks_col = tokens(F.col("text"))
    pos = docs.select(
        "doc_id", F.size(toks_col).alias("n_tokens"),
        F.posexplode(toks_col).alias("pos0", "term"))
    w = Window.partitionBy("doc_id").orderBy("pos0") \
              .rowsBetween(Window.currentRow, window - 1)
    spans = (pos.join(weights, "term")
             .withColumn("span_nll_micro", F.sum("w_micro").over(w))
             .filter(F.col("pos0") + window <= F.col("n_tokens")))
    best = (spans.groupBy("doc_id", "n_tokens")
            .agg(F.min(F.struct(F.col("span_nll_micro"),
                                F.col("pos0"))).alias("b")))
    return best.select(
        "doc_id", "n_tokens",
        (F.col("b.pos0") + 1).cast("long").alias("span_start"),
        F.col("b.span_nll_micro").cast("long").alias("span_nll_micro"),
    ).orderBy("doc_id")


def low_quality_spans_sql(window: int = 20) -> str:
    from hbase_indexer_spark.pipeline.dedup import TOKS_SQL

    return f"""
        WITH tf AS (
            SELECT doc_id, t.term, count(*) AS tf
            FROM (SELECT doc_id, unnest({TOKS_SQL}) AS term
                  FROM documents) t
            GROUP BY doc_id, t.term
        ),
        tot AS (SELECT sum(tf) AS c FROM tf),
        w AS (
            SELECT term,
                   CAST(floor({MICRO} * ln(
                       (SELECT c FROM tot) / CAST(sum(tf) AS DOUBLE)))
                        AS BIGINT) AS w_micro
            FROM tf GROUP BY term
        ),
        tok AS (
            SELECT doc_id, len(toks) AS n_tokens,
                   generate_subscripts(toks, 1) AS pos1,
                   unnest(toks) AS term
            FROM (SELECT doc_id, {TOKS_SQL} AS toks FROM documents)
        ),
        spans AS (
            SELECT doc_id, n_tokens, pos1,
                   sum(w_micro) OVER (
                       PARTITION BY doc_id ORDER BY pos1
                       ROWS BETWEEN CURRENT ROW
                                AND {window - 1} FOLLOWING
                   ) AS span_nll_micro
            FROM tok JOIN w USING (term)
            QUALIFY pos1 - 1 + {window} <= n_tokens
        ),
        best AS (
            SELECT doc_id, n_tokens, pos1, span_nll_micro,
                   row_number() OVER (
                       PARTITION BY doc_id
                       ORDER BY span_nll_micro, pos1) AS rn
            FROM spans
        )
        SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
               CAST(pos1 AS BIGINT) AS span_start,
               CAST(span_nll_micro AS BIGINT) AS span_nll_micro
        FROM best WHERE rn = 1 ORDER BY doc_id
    """


# ---------------------------------------------------------------------------
# Rolling active users: DAU + trailing-window union, sketch-only rolling
# ---------------------------------------------------------------------------


def rolling_active_users(events: DataFrame, key: str = "user_id",
                         ts_col: str = "ts",
                         window_days: int = 7) -> DataFrame:
    """Daily active users AND the trailing ``window_days`` rolling
    distinct count, from HLL register algebra: a rolling distinct is the
    union of the window's daily sketches, and union = register-wise max
    — so the rolling metric needs ONE register build plus a per-register
    RANGE-frame window over days, never a re-scan of the window's raw
    events (the classic metric that is quadratic done exactly, linear
    done with sketches).

    Returns one row per active day: ``(day, dau_true, dau_est,
    rolling_true, rolling_est)`` — ``day`` is the epoch-day bucket; the
    exact sides are the audit columns (drop them at 100 TB, keep the
    sketch).

    Scale: registers are ``(day, 64)``-sized; the day x 64 grid is
    aggregate-sized; the rolling max rides a RANGE frame partitioned BY
    REGISTER (parallel, gap-correct over missing days).  The exact
    rolling side explodes each (day, user) into its <= ``window_days``
    target days — combinable, bounded by activity x window."""
    from hbase_indexer_spark.functions.timeutil import ts_micros

    DAY_US = 86_400_000_000
    # integer `div`, not `/`+cast: epoch_us (~1.7e15 for 2024) sits close
    # enough to 2^53 that a double quotient could floor differently than
    # the oracle's integer `//`
    base = (events.withColumn("_us", ts_micros(events, ts_col))
            .withColumn("_day", F.expr(f"_us div {DAY_US}"))
            .drop("_us"))
    regs = hll_registers(base, F.col(key), "_day")  # (grp=day, reg, mr)

    days = regs.select(F.col("grp").alias("day")).distinct()
    grid = days.crossJoin(
        F.broadcast(
            regs.sparkSession.range(HLL_M).select(
                F.col("id").cast("int").alias("reg"))))
    g = grid.join(regs.withColumnRenamed("grp", "day"),
                  ["day", "reg"], "left")
    w = (Window.partitionBy("reg").orderBy("day")
         .rangeBetween(-(window_days - 1), 0))
    rolled = (g.withColumn("mr_roll", F.max("mr").over(w))
              .groupBy("day")
              .agg(_hll_sum("mr").alias("s_day"),
                   _hll_sum("mr_roll").alias("s_roll")))
    est = rolled.select(
        "day", _hll_est("s_day").alias("dau_est"),
        _hll_est("s_roll").alias("rolling_est"))

    du = (base.filter(F.col(key).isNotNull())
          .select("_day", F.col(key).alias("_k")).distinct())
    dau_true = du.groupBy(F.col("_day").alias("day")).agg(
        F.count(F.lit(1)).cast("long").alias("dau_true"))
    lo_hi = days.agg(F.min("day").alias("lo"), F.max("day").alias("hi"))
    targets = (du.crossJoin(F.broadcast(lo_hi))
               .select(F.explode(F.sequence(
                   F.col("_day"),
                   F.least(F.col("_day") + (window_days - 1),
                           F.col("hi")))).alias("day"), "_k")
               .distinct())
    roll_true = (targets.join(F.broadcast(days), "day")
                 .groupBy("day")
                 .agg(F.count(F.lit(1)).cast("long").alias("rolling_true")))

    return (days.join(dau_true, "day", "left")
            .join(roll_true, "day", "left")
            .join(est, "day", "left")
            .select("day",
                    F.coalesce("dau_true", F.lit(0)).cast("long")
                    .alias("dau_true"),
                    F.coalesce("dau_est", F.lit(0)).cast("long")
                    .alias("dau_est"),
                    F.coalesce("rolling_true", F.lit(0)).cast("long")
                    .alias("rolling_true"),
                    F.coalesce("rolling_est", F.lit(0)).cast("long")
                    .alias("rolling_est"))
            .orderBy("day"))


def _hll_sum(mr_col: str):
    """S = sum over the 64 grid rows of 2^(33 - rho), absent register
    (NULL mr) contributing 2^33 — grid callers guarantee 64 rows/day."""
    return F.sum(F.when(F.col(mr_col).isNull(),
                        F.lit(_HLL_SCALE).cast("long"))
                 .otherwise(F.expr(f"CAST(1 AS BIGINT) << (33 - {mr_col})")))


def _hll_est(s_col: str):
    return F.expr(f"({HLL_ALPHA_MICRO} * ({_HLL_INNER} div {s_col}))"
                  f" div 1000000").cast("long")


def rolling_active_users_sql(key_expr: str = "user_id",
                             table: str = "events",
                             window_days: int = 7) -> str:
    day = "epoch_us(ts) // 86400000000"
    regs = hll_registers_sql(key_expr, f"({day})", table)
    s_day = (f"CAST(sum(CASE WHEN mr IS NULL THEN CAST({_HLL_SCALE} AS BIGINT) "
             f"ELSE CAST(1 AS BIGINT) << (33 - mr) END) AS BIGINT)")
    est = (f"CAST(({HLL_ALPHA_MICRO} * ({_HLL_INNER} // s)) // 1000000 "
           f"AS BIGINT)")
    return f"""
        WITH regs AS ({regs}),
        days AS (SELECT DISTINCT grp AS day FROM regs),
        grid AS (
            SELECT d.day, r.reg
            FROM days d CROSS JOIN (SELECT unnest(range(0, {HLL_M})) AS reg) r
        ),
        g AS (
            SELECT grid.day, grid.reg, regs.mr
            FROM grid LEFT JOIN regs
              ON regs.grp = grid.day AND regs.reg = grid.reg
        ),
        rolled AS (
            SELECT day, reg, mr,
                   max(mr) OVER (PARTITION BY reg ORDER BY day
                                 RANGE BETWEEN {window_days - 1} PRECEDING
                                           AND CURRENT ROW) AS mr_roll
            FROM g
        ),
        sums AS (
            SELECT day,
                   {s_day} AS s_day,
                   {s_day.replace('mr IS NULL', 'mr_roll IS NULL').replace('(33 - mr)', '(33 - mr_roll)')} AS s_roll
            FROM rolled GROUP BY day
        ),
        est AS (
            SELECT day,
                   {est.replace('s)', 's_day)')} AS dau_est,
                   {est.replace('s)', 's_roll)')} AS rolling_est
            FROM sums
        ),
        du AS (
            SELECT DISTINCT ({day}) AS d, {key_expr} AS k
            FROM {table} WHERE {key_expr} IS NOT NULL
        ),
        dt AS (
            SELECT d AS day, CAST(count(*) AS BIGINT) AS dau_true
            FROM du GROUP BY d
        ),
        bounds AS (SELECT max(day) AS hi FROM days),
        tgt AS (
            SELECT DISTINCT t.day, du.k
            FROM du, bounds,
                 LATERAL (SELECT unnest(range(du.d,
                     least(du.d + {window_days}, bounds.hi + 1))) AS day) t
        ),
        rt AS (
            SELECT t.day, CAST(count(*) AS BIGINT) AS rolling_true
            FROM tgt t JOIN days USING (day) GROUP BY t.day
        )
        SELECT days.day,
               CAST(COALESCE(dt.dau_true, 0) AS BIGINT) AS dau_true,
               CAST(COALESCE(e.dau_est, 0) AS BIGINT) AS dau_est,
               CAST(COALESCE(rt.rolling_true, 0) AS BIGINT) AS rolling_true,
               CAST(COALESCE(e.rolling_est, 0) AS BIGINT) AS rolling_est
        FROM days
        LEFT JOIN dt ON dt.day = days.day
        LEFT JOIN rt ON rt.day = days.day
        LEFT JOIN est e ON e.day = days.day
        ORDER BY days.day
    """


# ---------------------------------------------------------------------------
# Functional-dependency discovery (r8): profiling beyond column_profile
# ---------------------------------------------------------------------------

def fd_check(df: DataFrame, pairs: list[tuple[str, str]]) -> DataFrame:
    """Functional-dependency candidate check (the Metanome/profiling
    primitive): for each ``(determinant, dependent)`` pair report
    whether ``det -> dep`` holds — i.e. no determinant value maps to
    more than one distinct dependent value (NULL counts as a value).

    Returns ``(det, dep, n_groups, n_violating, fd_holds)`` where
    ``n_violating`` counts determinant values with >1 distinct
    dependent.

    Scale: per pair ONE distinct-pair reduction then ONE combinable
    determinant aggregate — the same two-phase shape as any
    COUNT(DISTINCT); pairs union into a single lazy plan, so a 100 TB
    profile run is k pairs x two shuffles of distinct-sized data,
    never a row-level self-join."""
    if not pairs:
        raise ValueError("fd_check needs at least one (det, dep) pair")
    outs = []
    for det, dep in pairs:
        per_det = (df.select(det, dep).distinct()
                   .groupBy(det)
                   .agg(F.count(F.lit(1)).alias("_n_dep")))
        outs.append(per_det.agg(
            F.lit(det).alias("det"), F.lit(dep).alias("dep"),
            F.count(F.lit(1)).cast("long").alias("n_groups"),
            # coalesce: sum over ZERO rows is NULL in Spark but the
            # DuckDB mirror's CASE falls to 0 — pin the empty-table
            # semantics to n_violating=0 / fd_holds=1 on both engines
            F.coalesce(F.sum(F.when(F.col("_n_dep") > 1, 1).otherwise(0)),
                       F.lit(0))
            .cast("long").alias("n_violating"),
        ).withColumn("fd_holds", (F.col("n_violating") == 0).cast("int")))
    res = outs[0]
    for o in outs[1:]:
        res = res.unionByName(o)
    return res.orderBy("det", "dep")


def fd_check_sql(pairs: list[tuple[str, str]], table: str) -> str:
    parts = []
    for det, dep in pairs:
        parts.append(f"""
        SELECT '{det}' AS det, '{dep}' AS dep,
               CAST(count(*) AS BIGINT) AS n_groups,
               CAST(coalesce(sum(CASE WHEN n_dep > 1 THEN 1 ELSE 0 END), 0)
                    AS BIGINT) AS n_violating,
               CAST(CASE WHEN coalesce(
                              sum(CASE WHEN n_dep > 1 THEN 1 ELSE 0 END), 0)
                              = 0 THEN 1 ELSE 0 END AS INTEGER) AS fd_holds
        FROM (
            SELECT {det}, count(*) AS n_dep
            FROM (SELECT DISTINCT {det}, {dep} FROM {table})
            GROUP BY {det}
        )""")
    return " UNION ALL ".join(parts) + " ORDER BY det, dep"
