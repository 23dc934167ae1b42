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
               coalesce(p.n_tokens, 0) AS n_tokens,
               coalesce(p.nll_micro_total, 0) AS nll_micro_total,
               CASE WHEN p.n_tokens > 0
                    THEN p.nll_micro_total // p.n_tokens
                    END AS nll_micro_per_token
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
               coalesce(p.n_bigrams, 0) AS n_bigrams,
               coalesce(p.nll_micro_total, 0) AS nll_micro_total,
               CASE WHEN p.n_bigrams > 0
                    THEN p.nll_micro_total // p.n_bigrams
                    END AS nll_micro_per_bigram
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
            SELECT p.l AS "left", p.r AS "right", sum(wf) AS n_occ
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
