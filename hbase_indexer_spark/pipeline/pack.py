"""Sequence packing: map every document onto the fixed-length training
sequences ("context windows") it would occupy when the corpus is
concatenated in deterministic ``doc_id`` order and split every
``seq_len`` tokens — the layout step between a curated corpus and a
token-dataloader.

The core is an exact global prefix sum over per-document token counts.
A single ``Window.orderBy(doc_id)`` would compute it in one line but
funnels the whole corpus through ONE reducer — the canonical
scale-killer.  Instead the classic two-level scan:

1. docs are grouped into order-preserving **blocks** (``doc_id div
   block_size``); per-block token totals are a map-side-combinable
   aggregation (one shuffle, B = #blocks rows out);
2. block start offsets are a running sum over those B rows — the only
   unpartitioned window in the plan, and its input is the *aggregate*,
   bounded by ``max(doc_id) / block_size`` (auto-sized to ~4096),
   independent of corpus bytes;
3. each doc's global start = (broadcast) block offset + a within-block
   running sum (``Window.partitionBy(block)`` — parallel across blocks).

Every shuffle key is ``block`` or implicit in one aggregation; nothing
all-pairs, nothing collected to the driver.  Determinism: the layout
depends only on (doc_id, token count, seq_len), never on partitioning
or cluster size, so re-runs and resumes see the same sequence ids.

Reference analog: none — beyond-reference training-data operator, same
registry surface as pipeline.curation / pipeline.dedup.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from hbase_indexer_spark.pipeline.text import token_count, tokens

DEFAULT_BLOCKS = 4096


def pack_sequences(docs: DataFrame, seq_len: int = 128,
                   block_size: int | None = None,
                   start_offset: int = 0) -> DataFrame:
    """Assign every document its token span in the packed corpus.

    Returns one row per input doc::

        (doc_id, n_tokens, start_token, first_seq, last_seq, n_seqs)

    where ``start_token`` is the doc's 0-based offset in the
    concatenated token stream and ``first_seq``/``last_seq`` are the
    ids of the ``seq_len``-token training sequences it touches (NULL,
    with ``n_seqs = 0``, for empty docs — they occupy no tokens).

    ``block_size`` is auto-sized from ``max(doc_id)`` to ~``DEFAULT_BLOCKS``
    blocks; pass it explicitly to pin the physical plan (the OUTPUT is
    identical for any block_size >= 1 — pinned by
    tests/test_pack.py::test_block_size_invariant).

    ``start_offset`` continues an EXISTING packed corpus: pass the
    previous snapshot's total token count and the new batch's spans
    append after it without re-packing a byte of accepted data —
    ``pack(all) == pack(part1) ++ pack(part2, start_offset=
    sum(part1))`` (pinned by test_pack_append_continuation).
    """
    counts = docs.select(
        F.col("doc_id"),
        token_count(F.col("text")).cast("long").alias("n_tokens"),
    ).withColumn("_ord", F.col("doc_id"))
    if block_size is None:
        # one cheap agg (answered from parquet footer stats where
        # available); makes B ~ DEFAULT_BLOCKS regardless of id range
        mx = counts.agg(F.max("doc_id")).first()[0] or 0
        block_size = max(1, (int(mx) + DEFAULT_BLOCKS) // DEFAULT_BLOCKS)
    return _pack_by(counts, seq_len, block_size,
                    start_offset=start_offset).drop("_ord")


def _pack_by(counts: DataFrame, seq_len: int, block_size: int,
             start_offset: int = 0) -> DataFrame:
    """The two-level prefix scan over ``(doc_id, n_tokens, _ord)``:
    stream order is ascending ``_ord`` (blocks = ``_ord div block_size``,
    order-preserving).  Shared by pack_sequences (_ord = doc_id) and
    shuffled_pack (_ord = shuffle position)."""
    counts = counts.withColumn("block", F.expr(f"_ord div {block_size}"))

    # (2) per-block totals -> running block offsets.  The window below is
    # deliberately unpartitioned: its input is B aggregate rows, not docs.
    block_off = (
        counts.groupBy("block")
        .agg(F.sum("n_tokens").alias("block_tokens"))
        .withColumn(
            "block_start",
            F.coalesce(
                F.sum("block_tokens").over(
                    Window.orderBy("block")
                    .rowsBetween(Window.unboundedPreceding, -1)),
                F.lit(0),
            ),
        )
        .drop("block_tokens")
    )

    # (3) within-block prefix + broadcast block offset = global offset
    w = (Window.partitionBy("block").orderBy("_ord")
         .rowsBetween(Window.unboundedPreceding, -1))
    packed = (
        counts.join(F.broadcast(block_off), "block")
        .withColumn(
            "start_token",
            F.lit(start_offset).cast("long")
            + F.col("block_start")
            + F.coalesce(F.sum("n_tokens").over(w), F.lit(0)),
        )
    )

    nonempty = F.col("n_tokens") > 0
    first_seq = F.expr(f"start_token div {seq_len}")
    last_seq = F.expr(f"(start_token + n_tokens - 1) div {seq_len}")
    return packed.select(
        "doc_id",
        "_ord",
        "n_tokens",
        "start_token",
        F.when(nonempty, first_seq).alias("first_seq"),
        F.when(nonempty, last_seq).alias("last_seq"),
        F.when(nonempty, last_seq - first_seq + 1)
        .otherwise(F.lit(0)).cast("long").alias("n_seqs"),
    )


def pack_sequences_sql(seq_len: int = 128) -> str:
    """DuckDB oracle: the same layout via one global window cumsum
    (exact at gate scale; the Spark path replaces it with the two-level
    block scan)."""
    from hbase_indexer_spark.pipeline.dedup import TOKS_SQL

    return f"""
        WITH tk AS (
            SELECT doc_id,
                   CAST(len({TOKS_SQL}) AS BIGINT) AS n_tokens
            FROM documents
        ),
        c AS (
            SELECT doc_id, n_tokens,
                   CAST(coalesce(sum(n_tokens) OVER (
                       ORDER BY doc_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                   ), 0) AS BIGINT) AS start_token
            FROM tk
        )
        SELECT doc_id, n_tokens, start_token,
               CAST(CASE WHEN n_tokens > 0
                    THEN start_token // {seq_len} END AS BIGINT) AS first_seq,
               CAST(CASE WHEN n_tokens > 0
                    THEN (start_token + n_tokens - 1) // {seq_len}
                    END AS BIGINT) AS last_seq,
               CAST(CASE WHEN n_tokens > 0
                    THEN (start_token + n_tokens - 1) // {seq_len}
                         - start_token // {seq_len} + 1
                    ELSE 0 END AS BIGINT) AS n_seqs
        FROM c
    """


def sequence_manifest(docs: DataFrame, seq_len: int = 128,
                      block_size: int | None = None) -> DataFrame:
    """Per-sequence composition — the inverse view of
    :func:`pack_sequences`: for every ``seq_len``-token training
    sequence, how many documents contribute to it, how many tokens it
    actually holds (== seq_len except the ragged tail), and its doc_id
    span::

        (seq_id, n_docs, n_tokens, first_doc, last_doc)

    The dataloader-side manifest: which documents a given context window
    mixes, e.g. to audit cross-doc attention contamination.

    Scale: explodes each doc into its (bounded: ceil(doc_tokens /
    seq_len) + 1) sequence ids and re-aggregates — one combinable
    shuffle on seq_id on top of the pack_sequences plan.
    """
    packed = pack_sequences(docs, seq_len=seq_len, block_size=block_size) \
        .filter(F.col("n_tokens") > 0)
    end = F.col("start_token") + F.col("n_tokens")  # exclusive
    per_seq = packed.select(
        "doc_id", "start_token", "n_tokens",
        F.explode(F.sequence("first_seq", "last_seq")).alias("seq_id"),
    ).withColumn(
        "toks_here",
        F.least(end, (F.col("seq_id") + 1) * seq_len)
        - F.greatest(F.col("start_token"), F.col("seq_id") * seq_len),
    )
    return per_seq.groupBy("seq_id").agg(
        F.count("*").alias("n_docs"),
        F.sum("toks_here").alias("n_tokens"),
        F.min("doc_id").alias("first_doc"),
        F.max("doc_id").alias("last_doc"),
    )


def sequence_manifest_sql(seq_len: int = 128) -> str:
    pack = pack_sequences_sql(seq_len=seq_len)
    return f"""
        WITH packed AS ({pack}),
        per_seq AS (
            SELECT doc_id, start_token, n_tokens,
                   unnest(range(CAST(first_seq AS BIGINT),
                                CAST(last_seq + 1 AS BIGINT))) AS seq_id
            FROM packed WHERE n_tokens > 0
        )
        SELECT seq_id,
               count(*) AS n_docs,
               CAST(sum(least(start_token + n_tokens, (seq_id + 1) * {seq_len})
                   - greatest(start_token, seq_id * {seq_len})) AS BIGINT)
                   AS n_tokens,
               min(doc_id) AS first_doc,
               max(doc_id) AS last_doc
        FROM per_seq GROUP BY seq_id
    """


def packed_sequence_text(docs: DataFrame, seq_len: int = 128,
                         block_size: int | None = None) -> DataFrame:
    """Materialize the packed sequences themselves: ``(seq_id, n_tokens,
    text)`` where ``text`` is the sequence's tokens (space-joined),
    assembled across document boundaries — what a token-dataloader
    would actually emit, minus the tokenizer.

    Scale: the layout comes from :func:`pack_sequences` (text never
    enters the prefix-sum shuffles); text joins back on doc_id once,
    each doc contributes only the slice overlapping each sequence, and
    the per-sequence rebuild is one combinable ``collect_list`` +
    in-row sort keyed by start offset (a sequence holds <= seq_len
    tokens, so rebuild state is bounded by seq_len regardless of corpus
    size).
    """
    from hbase_indexer_spark.pipeline.text import tokens

    packed = pack_sequences(docs, seq_len=seq_len, block_size=block_size) \
        .filter(F.col("n_tokens") > 0)
    with_text = packed.join(docs.select("doc_id", "text"), "doc_id")
    per_seq = with_text.select(
        "doc_id", "start_token", "n_tokens", "text",
        F.explode(F.sequence("first_seq", "last_seq")).alias("seq_id"),
    )
    lo = F.greatest(F.lit(0), F.col("seq_id") * seq_len - F.col("start_token"))
    hi = F.least(F.col("n_tokens"),
                 (F.col("seq_id") + 1) * seq_len - F.col("start_token"))
    pieces = per_seq.select(
        "seq_id", "start_token",
        F.slice(tokens(F.col("text")), lo + 1, hi - lo).alias("piece"),
    )
    return (
        pieces.groupBy("seq_id")
        .agg(
            F.array_join(
                F.flatten(F.transform(
                    F.array_sort(F.collect_list(
                        F.struct("start_token", "piece"))),
                    lambda s: s["piece"],
                )),
                " ",
            ).alias("text"),
            F.sum(F.size("piece")).alias("n_tokens"),
        )
        .select("seq_id", "n_tokens", "text")
    )


def packed_sequence_text_sql(seq_len: int = 128) -> str:
    from hbase_indexer_spark.pipeline.dedup import TOKS_SQL

    pack = pack_sequences_sql(seq_len=seq_len)
    return f"""
        WITH packed AS ({pack}),
        per_seq AS (
            SELECT p.doc_id, p.start_token, p.n_tokens, d.text,
                   unnest(range(CAST(p.first_seq AS BIGINT),
                                CAST(p.last_seq + 1 AS BIGINT))) AS seq_id
            FROM packed p JOIN documents d USING (doc_id)
            WHERE p.n_tokens > 0
        ),
        pieces AS (
            SELECT seq_id, start_token,
                   ({TOKS_SQL})[
                       CAST(greatest(0, seq_id * {seq_len} - start_token)
                            AS BIGINT) + 1 :
                       CAST(least(n_tokens,
                                  (seq_id + 1) * {seq_len} - start_token)
                            AS BIGINT)
                   ] AS piece
            FROM per_seq
        )
        SELECT seq_id,
               CAST(sum(len(piece)) AS BIGINT) AS n_tokens,
               string_agg(array_to_string(piece, ' '), ' '
                          ORDER BY start_token) AS text
        FROM pieces GROUP BY seq_id
    """


# ---------------------------------------------------------------------------
# Deterministic global shuffle order
# ---------------------------------------------------------------------------

_HASH_BLOCKS = 4096


def shuffle_order(docs: DataFrame, salt: str = "shuffle-v1") -> DataFrame:
    """Assign every doc its position in a deterministic global shuffle:
    ``pos`` = dense 0-based rank of ``md5(doc_id:salt)`` (ties broken by
    doc_id) — the training-order shuffle that is reproducible across
    runs, clusters, and engines, and re-dealt entirely by changing the
    salt.

    A global ``row_number() OVER (ORDER BY h)`` would single-reducer the
    corpus; instead the same two-level scan as :func:`pack_sequences`,
    except the blocks come from the HASH value (``h div (2^60/4096)``) —
    uniform by construction, so no block-sizing action is needed: per-
    block counts (combinable, 4096 rows out), a running offset over that
    aggregate, broadcast back, and a block-partitioned row_number.
    Returns ``(doc_id, pos)`` — a permutation of 0..N-1.
    """
    from hbase_indexer_spark.pipeline.text import token_hash60

    block_size = (1 << 60) // _HASH_BLOCKS
    key = F.concat(F.col("doc_id").cast("string"), F.lit(":" + salt))
    keyed = docs.select(
        "doc_id", token_hash60(key).alias("h")
    ).withColumn("block", F.expr(f"h div {block_size}"))
    block_off = (
        keyed.groupBy("block").agg(F.count("*").alias("n"))
        .withColumn(
            "off",
            F.coalesce(
                F.sum("n").over(
                    Window.orderBy("block")
                    .rowsBetween(Window.unboundedPreceding, -1)),
                F.lit(0),
            ),
        )
        .drop("n")
    )
    w = Window.partitionBy("block").orderBy("h", "doc_id")
    return (
        keyed.join(F.broadcast(block_off), "block")
        .select(
            "doc_id",
            (F.col("off") + F.row_number().over(w) - 1).alias("pos"),
        )
    )


def shuffle_order_sql(salt: str = "shuffle-v1") -> str:
    return f"""
        SELECT doc_id,
               row_number() OVER (
                   ORDER BY CAST(('0x' || substr(md5(
                       CAST(doc_id AS VARCHAR) || ':{salt}'), 1, 15))
                       AS BIGINT), doc_id
               ) - 1 AS pos
        FROM documents
    """


def shuffled_pack(docs: DataFrame, seq_len: int = 128,
                  salt: str = "shuffle-v1") -> DataFrame:
    """The production training layout in one plan: shuffle the corpus
    deterministically (:func:`shuffle_order`), then pack the shuffled
    stream into ``seq_len``-token sequences (:func:`pack_sequences`'s
    two-level scan ordered by shuffle position instead of doc_id).

    Returns ``(doc_id, pos, n_tokens, start_token, first_seq, last_seq,
    n_seqs)``.  Shuffle positions are dense 0..N-1 and uniform, so pack
    blocks come from ``pos div ceil(N/4096)`` — one cheap count action,
    everything else identical to the doc_id-ordered pack (same shuffle
    budget: the rank plan + one extra doc_id join).
    """
    from hbase_indexer_spark.pipeline.text import token_count

    order = shuffle_order(docs, salt=salt)
    counts = (
        docs.select(
            "doc_id",
            token_count(F.col("text")).cast("long").alias("n_tokens"),
        )
        .join(order, "doc_id")
        .withColumn("_ord", F.col("pos"))
    )
    n = docs.count()
    block_size = max(1, (int(n) + DEFAULT_BLOCKS - 1) // DEFAULT_BLOCKS)
    return (
        _pack_by(counts.select("doc_id", "n_tokens", "_ord"),
                 seq_len, block_size)
        .withColumnRenamed("_ord", "pos")
        .select("doc_id", "pos", "n_tokens", "start_token",
                "first_seq", "last_seq", "n_seqs")
    )


def shuffled_pack_sql(seq_len: int = 128, salt: str = "shuffle-v1") -> str:
    from hbase_indexer_spark.pipeline.dedup import TOKS_SQL

    return f"""
        WITH ord AS ({shuffle_order_sql(salt)}),
        tk AS (
            SELECT d.doc_id, o.pos,
                   CAST(len({TOKS_SQL.replace('text', 'd.text')}) AS BIGINT)
                       AS n_tokens
            FROM documents d JOIN ord o USING (doc_id)
        ),
        c AS (
            SELECT doc_id, pos, n_tokens,
                   CAST(coalesce(sum(n_tokens) OVER (
                       ORDER BY pos
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                   ), 0) AS BIGINT) AS start_token
            FROM tk
        )
        SELECT doc_id, pos, n_tokens, start_token,
               CAST(CASE WHEN n_tokens > 0
                    THEN start_token // {seq_len} END AS BIGINT) AS first_seq,
               CAST(CASE WHEN n_tokens > 0
                    THEN (start_token + n_tokens - 1) // {seq_len}
                    END AS BIGINT) AS last_seq,
               CAST(CASE WHEN n_tokens > 0
                    THEN (start_token + n_tokens - 1) // {seq_len}
                         - start_token // {seq_len} + 1
                    ELSE 0 END AS BIGINT) AS n_seqs
        FROM c
    """


# ---------------------------------------------------------------------------
# Overlapping token-window chunking (retrieval / context-window prep)
# ---------------------------------------------------------------------------

def chunk_documents(docs: DataFrame, size: int = 32,
                    stride: int = 24) -> DataFrame:
    """Split every document into overlapping ``size``-token windows that
    start every ``stride`` tokens — the retrieval-corpus chunker (RAG
    indexing, long-doc embedding prep).  A doc with ``n`` tokens emits
    ``1 + ceil(max(0, n - size) / stride)`` chunks; the final chunk is
    the only one allowed to be short, and empty docs emit nothing.

    Returns ``(doc_id, chunk_id, n_chunk_tokens, chunk_text)``.

    Scale: map-only — tokenize once, ``sequence`` + ``transform`` build
    the windows in-row, one ``posexplode`` fans them out.  No shuffle;
    the fan-out factor is ~n/stride per doc, and text bytes are sliced
    (never duplicated whole-doc per chunk).
    """
    toked = docs.select(
        "doc_id", F.array(tokens(F.col("text")))[0].alias("_toks"))
    t = F.col("_toks")  # bound once — HOF lambdas must not re-tokenize
    n = F.size(t)
    n_chunks = F.lit(1) + F.ceil(
        F.greatest(n - F.lit(size), F.lit(0)) / F.lit(stride)).cast("int")
    chunks = F.when(
        n > 0,
        F.transform(
            F.sequence(F.lit(0), n_chunks - 1),
            lambda i: F.slice(t, i * stride + 1, size),
        ),
    ).otherwise(F.array().cast("array<array<string>>"))
    return toked.select(
        "doc_id", F.posexplode(chunks).alias("chunk_id", "_c")
    ).select(
        "doc_id", "chunk_id",
        F.size("_c").alias("n_chunk_tokens"),
        F.concat_ws(" ", "_c").alias("chunk_text"),
    )


def chunk_documents_sql(size: int = 32, stride: int = 24) -> str:
    from hbase_indexer_spark.pipeline.dedup import TOKS_SQL

    return f"""
        WITH tk AS (
            SELECT doc_id, {TOKS_SQL} AS toks FROM documents
        ),
        ck AS (
            SELECT doc_id,
                   unnest(range(0, 1 + CAST(ceil(
                       greatest(len(toks) - {size}, 0) / {stride}.0
                   ) AS INTEGER))) AS chunk_id,
                   toks
            FROM tk WHERE len(toks) > 0
        )
        SELECT doc_id, chunk_id,
               len(toks[chunk_id * {stride} + 1 :
                        chunk_id * {stride} + {size}]) AS n_chunk_tokens,
               array_to_string(toks[chunk_id * {stride} + 1 :
                                    chunk_id * {stride} + {size}],
                               ' ') AS chunk_text
        FROM ck
    """


# ---------------------------------------------------------------------------
# Length-bucketed inference batching (padding-waste-minimizing layout)
# ---------------------------------------------------------------------------

DEFAULT_LEN_BOUNDARIES: tuple[int, ...] = (16, 32, 48, 64, 96)


def length_buckets(docs: DataFrame,
                   boundaries: tuple[int, ...] | None = None,
                   batch_docs: int = 8,
                   salt: str = "len-bucket-v1") -> DataFrame:
    """Length-bucketed batch layout for bulk inference/scoring: batching
    docs of wildly different token lengths pads every sequence to the
    batch max, and on a web corpus that wastes most of the FLOPs.  The
    standard fix is to bucket by length first and batch within buckets.

    Each doc lands in bucket ``#(boundaries <= n_tokens)``; within a
    bucket, docs take a deterministic salted-hash order (same recipe as
    :func:`shuffle_order` — reproducible across runs and engines) and
    consecutive runs of ``batch_docs`` form a batch.  Returns the
    per-batch manifest ``(bucket, batch_id, n_docs, max_tokens,
    sum_tokens, padding_tokens)`` where ``padding_tokens`` =
    n_docs * max_tokens - sum_tokens — the audited waste.

    Scale: a naive per-bucket ``row_number`` would sort each bucket on
    one reducer (buckets are few and huge at corpus scale), so the rank
    reuses the two-level scan from :func:`shuffle_order`, just keyed by
    (bucket, hash-block): per-(bucket, block) counts (combinable,
    <= buckets x 4096 rows), a running offset per bucket over that tiny
    aggregate, broadcast back, block-partitioned ``row_number``.  The
    manifest is then one combinable aggregation.
    """
    from hbase_indexer_spark.pipeline.text import token_count, token_hash60

    bounds = tuple(boundaries or DEFAULT_LEN_BOUNDARIES)
    block_size = (1 << 60) // _HASH_BLOCKS
    bucket = sum(
        (F.when(F.col("n_tokens") >= b, 1).otherwise(0) for b in bounds),
        F.lit(0),
    )
    key = F.concat(F.col("doc_id").cast("string"), F.lit(":" + salt))
    keyed = (
        docs.select(
            "doc_id",
            token_count(F.col("text")).alias("n_tokens"),
            token_hash60(key).alias("h"),
        )
        .withColumn("bucket", bucket)
        .withColumn("block", F.expr(f"h div {block_size}"))
    )
    block_off = (
        keyed.groupBy("bucket", "block").agg(F.count("*").alias("n"))
        .withColumn(
            "off",
            F.coalesce(
                F.sum("n").over(
                    Window.partitionBy("bucket").orderBy("block")
                    .rowsBetween(Window.unboundedPreceding, -1)),
                F.lit(0).cast("long"),
            ),
        )
        .drop("n")
    )
    w = Window.partitionBy("bucket", "block").orderBy("h", "doc_id")
    seq = F.col("off") + F.row_number().over(w) - 1
    return (
        keyed.join(F.broadcast(block_off), ["bucket", "block"])
        .withColumn("seq", seq.cast("long"))
        .select(
            "bucket",
            F.expr(f"seq div {batch_docs}").alias("batch_id"),
            "n_tokens",
        )
        .groupBy("bucket", "batch_id")
        .agg(
            F.count("*").alias("n_docs"),
            F.max("n_tokens").alias("max_tokens"),
            F.sum("n_tokens").alias("sum_tokens"),
        )
        .withColumn(
            "padding_tokens",
            F.col("n_docs") * F.col("max_tokens") - F.col("sum_tokens"),
        )
    )


def length_buckets_sql(boundaries: tuple[int, ...] | None = None,
                       batch_docs: int = 8,
                       salt: str = "len-bucket-v1") -> str:
    """DuckDB mirror: the per-bucket rank collapses to a plain window
    (the oracle does not need the two-level scan — it must only agree
    on the ORDER, which is (hash, doc_id) in both engines)."""
    from hbase_indexer_spark.pipeline.dedup import TOKS_SQL

    bounds = tuple(boundaries or DEFAULT_LEN_BOUNDARIES)
    bucket = " + ".join(
        f"CASE WHEN n_tokens >= {b} THEN 1 ELSE 0 END" for b in bounds)
    return f"""
        WITH c AS (
            SELECT doc_id,
                   CAST(len({TOKS_SQL}) AS INTEGER) AS n_tokens,
                   CAST(('0x' || substr(md5(
                       CAST(doc_id AS VARCHAR) || ':{salt}'), 1, 15))
                       AS BIGINT) AS h
            FROM documents
        ),
        b AS (
            SELECT doc_id, n_tokens, h,
                   CAST({bucket} AS INTEGER) AS bucket
            FROM c
        ),
        r AS (
            SELECT bucket, n_tokens,
                   (row_number() OVER (PARTITION BY bucket
                                       ORDER BY h, doc_id) - 1)
                       // {batch_docs} AS batch_id
            FROM b
        )
        SELECT bucket,
               CAST(batch_id AS BIGINT) AS batch_id,
               CAST(count(*) AS BIGINT) AS n_docs,
               max(n_tokens) AS max_tokens,
               CAST(sum(n_tokens) AS BIGINT) AS sum_tokens,
               CAST(count(*) * max(n_tokens) - sum(n_tokens)
                    AS BIGINT) AS padding_tokens
        FROM r
        GROUP BY bucket, batch_id
    """


# ---------------------------------------------------------------------------
# Span corruption (T5-style denoising pairs), r6
# ---------------------------------------------------------------------------

def span_corruption(docs: DataFrame, mask_milli: int = 150) -> DataFrame:
    """Deterministic T5-style span corruption: each token masks with
    probability ``mask_milli``/1000 decided by a CONTENT-INDEPENDENT
    position hash (``token_hash60(doc_id || ':' || pos) % 1000``), so
    the same doc always corrupts identically on any cluster layout —
    the replay-safe substitute for the PRNG the original objective uses.
    Contiguous masked tokens collapse into ONE sentinel:

        input : tokens with each masked RUN replaced by ``<extra_id_k>``
        target: ``<extra_id_k>`` followed by that run's tokens, in order

    (k = 0-based run index in position order — exactly the denoising
    pair shape for span-corruption pretraining.)  Returns ``(doc_id,
    n_tokens, n_masked, n_spans, input_text, target_text)``; token-less
    docs emit empty strings.  Tokens rejoin with single spaces (the
    tokenizer's whitespace normalization).

    Scale: posexplode -> ONE window per doc (run starts + run ids) ->
    one combinable-ish groupBy(doc) rebuild; everything downstream of
    the window is ordinary aggregation — no Python, no per-row UDFs."""
    from hbase_indexer_spark.pipeline.text import token_hash60

    tok = docs.select(
        "doc_id",
        F.posexplode(tokens(F.col("text"))).alias("pos", "tok"))
    m = (F.pmod(token_hash60(F.concat(F.col("doc_id").cast("string"),
                                      F.lit(":"),
                                      F.col("pos").cast("string"))),
                F.lit(1000)) < mask_milli)
    w = Window.partitionBy("doc_id").orderBy("pos")
    flagged = tok.withColumn("m", m).withColumn(
        "run_start",
        F.col("m") & ~F.coalesce(F.lag("m").over(w), F.lit(False)))
    cum = (Window.partitionBy("doc_id").orderBy("pos")
           .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    ranked = flagged.withColumn(
        "k", F.sum(F.col("run_start").cast("int")).over(cum) - 1)
    sent = F.concat(F.lit("<extra_id_"), F.col("k").cast("string"),
                    F.lit(">"))
    pieces = ranked.select(
        "doc_id", "pos", "m", "run_start",
        F.when(~F.col("m"), F.col("tok"))
        .when(F.col("run_start"), sent).alias("in_piece"),
        F.when(F.col("m") & F.col("run_start"),
               F.concat(sent, F.lit(" "), F.col("tok")))
        .when(F.col("m"), F.col("tok")).alias("tg_piece"),
    )

    def joined(col: str):
        return F.array_join(
            F.transform(
                F.array_sort(F.collect_list(
                    F.when(F.col(col).isNotNull(),
                           F.struct(F.col("pos").alias("pos"),
                                    F.col(col).alias("p"))))),
                lambda s: s["p"]),
            " ")

    per_doc = pieces.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_tokens"),
        F.sum(F.col("m").cast("long")).alias("n_masked"),
        F.sum(F.col("run_start").cast("long")).alias("n_spans"),
        joined("in_piece").alias("input_text"),
        joined("tg_piece").alias("target_text"),
    )
    return (
        docs.select("doc_id").join(per_doc, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_tokens", F.lit(0)).alias("n_tokens"),
            F.coalesce("n_masked", F.lit(0)).alias("n_masked"),
            F.coalesce("n_spans", F.lit(0)).alias("n_spans"),
            F.coalesce("input_text", F.lit("")).alias("input_text"),
            F.coalesce("target_text", F.lit("")).alias("target_text"),
        )
    )


def span_corruption_sql(mask_milli: int = 150) -> str:
    from hbase_indexer_spark.pipeline.dedup import TOKS_SQL, hash60_sql

    pos_hash = hash60_sql(
        "CAST(doc_id AS VARCHAR) || ':' || CAST(pos AS VARCHAR)")
    return f"""
        WITH tok AS (
            SELECT doc_id, i - 1 AS pos, toks[i] AS tok
            FROM (SELECT doc_id, {TOKS_SQL} AS toks FROM documents),
                 UNNEST(range(1, len(toks) + 1)) AS g(i)
        ),
        flagged AS (
            SELECT doc_id, pos, tok,
                   {pos_hash} % 1000 < {mask_milli} AS m
            FROM tok
        ),
        runs AS (
            SELECT doc_id, pos, tok, m,
                   m AND NOT coalesce(
                       lag(m) OVER (PARTITION BY doc_id ORDER BY pos),
                       FALSE) AS run_start
            FROM flagged
        ),
        ranked AS (
            SELECT *, sum(CASE WHEN run_start THEN 1 ELSE 0 END)
                       OVER (PARTITION BY doc_id ORDER BY pos
                             ROWS UNBOUNDED PRECEDING) - 1 AS k
            FROM runs
        ),
        pieces AS (
            SELECT doc_id, pos, m, run_start,
                   CASE WHEN NOT m THEN tok
                        WHEN run_start
                            THEN '<extra_id_' || CAST(k AS VARCHAR) || '>'
                   END AS in_piece,
                   CASE WHEN m AND run_start
                            THEN '<extra_id_' || CAST(k AS VARCHAR)
                                 || '> ' || tok
                        WHEN m THEN tok
                   END AS tg_piece
            FROM ranked
        ),
        per_doc AS (
            SELECT doc_id,
                   CAST(count(*) AS BIGINT) AS n_tokens,
                   CAST(sum(CASE WHEN m THEN 1 ELSE 0 END) AS BIGINT)
                       AS n_masked,
                   CAST(sum(CASE WHEN run_start THEN 1 ELSE 0 END)
                        AS BIGINT) AS n_spans,
                   string_agg(in_piece, ' ' ORDER BY pos) AS input_text,
                   string_agg(tg_piece, ' ' ORDER BY pos) AS target_text
            FROM pieces GROUP BY doc_id
        )
        SELECT d.doc_id,
               coalesce(p.n_tokens, 0) AS n_tokens,
               coalesce(p.n_masked, 0) AS n_masked,
               coalesce(p.n_spans, 0) AS n_spans,
               coalesce(p.input_text, '') AS input_text,
               coalesce(p.target_text, '') AS target_text
        FROM (SELECT doc_id FROM documents) d
        LEFT JOIN per_doc p ON d.doc_id = p.doc_id
    """


# ---------------------------------------------------------------------------
# Prefix-LM pairs (UL2 S-denoiser), r6
# ---------------------------------------------------------------------------

def prefix_lm_pairs(docs: DataFrame) -> DataFrame:
    """UL2 S-denoiser / PrefixLM objective: split each doc's token
    stream at ONE deterministic point into (context prefix, generation
    target).  The split position is a content-independent hash
    (``token_hash60(doc_id || ':plm') % n_tokens``), the replay-safe
    substitute for the sampler's PRNG — the same doc splits identically
    on any cluster layout, so epochs are reproducible and resumable.

    ``split_pos`` ranges 0..n-1, so the TARGET is always non-empty for a
    non-empty doc (the prefix may be empty — a pure-LM sample), matching
    the objective's "always something to predict" invariant.  Returns
    ``(doc_id, n_tokens, split_pos, input_text, target_text)``; empty
    docs emit (0, 0, '', '').

    Scale: map-only — tokenize, one hash, two array slices per row.  No
    shuffle, no window, no Python; at 100 TB this is a pure scan whose
    cost is the read itself."""
    from hbase_indexer_spark.pipeline.text import token_hash60

    # coalesce text first: a NULL doc must behave exactly like an empty
    # one (the SQL mirror's coalesce(array_to_string(...), '') would
    # otherwise diverge from NULL-propagating slice/array_join here)
    toks = tokens(F.coalesce(F.col("text"), F.lit("")))
    n = F.size(toks).cast("long")
    split = F.when(
        n > 0,
        F.pmod(token_hash60(F.concat(F.col("doc_id").cast("string"),
                                     F.lit(":plm"))), n),
    ).otherwise(F.lit(0).cast("long"))
    return docs.select(
        "doc_id",
        n.alias("n_tokens"),
        split.alias("split_pos"),
        F.array_join(F.slice(toks, F.lit(1), split.cast("int")), " ")
        .alias("input_text"),
        F.array_join(
            F.slice(toks, (split + 1).cast("int"),
                    (n - split).cast("int")), " ").alias("target_text"),
    )


def prefix_lm_pairs_sql() -> str:
    from hbase_indexer_spark.pipeline.dedup import TOKS_SQL, hash60_sql

    plm_hash = hash60_sql("CAST(doc_id AS VARCHAR) || ':plm'")
    return f"""
        WITH t AS (
            -- coalesce text: NULL docs behave exactly like empty ones
            -- (len(NULL toks) would otherwise emit NULL n_tokens)
            SELECT doc_id, {TOKS_SQL} AS toks
            FROM (SELECT doc_id, coalesce(text, '') AS text
                  FROM documents)
        ),
        s AS (
            SELECT doc_id, toks,
                   CAST(len(toks) AS BIGINT) AS n_tokens,
                   CASE WHEN len(toks) > 0 THEN
                       {plm_hash} % CAST(len(toks) AS BIGINT)
                   ELSE 0 END AS split_pos
            FROM t
        )
        SELECT doc_id, n_tokens, split_pos,
               coalesce(array_to_string(toks[1:split_pos], ' '), '')
                   AS input_text,
               coalesce(array_to_string(toks[split_pos + 1:], ' '), '')
                   AS target_text
        FROM s
    """


# ---------------------------------------------------------------------------
# Fill-in-the-middle transform (PSM reordering), r6
# ---------------------------------------------------------------------------

def fim_transform(docs: DataFrame) -> DataFrame:
    """Fill-in-the-middle pretraining transform: cut each doc's token
    stream at two deterministic points 0 <= a <= b <= n into
    (prefix, middle, suffix) and emit the PSM reordering

        <fim_prefix> P <fim_suffix> S <fim_middle> M

    so an autoregressive model learns infilling.  Cut points are
    content-independent hashes (``a = h(doc_id||':fim_a') % (n+1)``,
    ``b = a + h(doc_id||':fim_b') % (n-a+1)``) — the replay-safe PRNG
    substitute: the same doc transforms identically on any cluster
    layout, so epochs are reproducible and resumable.  Empty segments
    are dropped from ``fim_text`` (sentinels always kept), keeping the
    join single-spaced on both engines.  Returns ``(doc_id, n_tokens,
    split_a, split_b, prefix_text, middle_text, suffix_text,
    fim_text)``; NULL text behaves exactly like an empty doc.

    Scale: map-only — tokenize, two hashes, three slices per row.  No
    shuffle, no window, no Python; the 100 TB cost is the scan itself."""
    from hbase_indexer_spark.pipeline.text import token_hash60

    toks = tokens(F.coalesce(F.col("text"), F.lit("")))
    n = F.size(toks).cast("long")

    def h(tag: str):
        return token_hash60(F.concat(F.col("doc_id").cast("string"),
                                     F.lit(tag)))

    a = F.pmod(h(":fim_a"), n + 1)
    b = a + F.pmod(h(":fim_b"), n - a + 1)
    pre = F.array_join(F.slice(toks, F.lit(1), a.cast("int")), " ")
    mid = F.array_join(
        F.slice(toks, (a + 1).cast("int"), (b - a).cast("int")), " ")
    suf = F.array_join(
        F.slice(toks, (b + 1).cast("int"), (n - b).cast("int")), " ")
    fim = F.array_join(
        F.filter(
            F.array(F.lit("<fim_prefix>"), pre, F.lit("<fim_suffix>"),
                    suf, F.lit("<fim_middle>"), mid),
            lambda x: x != ""),
        " ")
    return docs.select(
        "doc_id",
        n.alias("n_tokens"),
        a.alias("split_a"),
        b.alias("split_b"),
        pre.alias("prefix_text"),
        mid.alias("middle_text"),
        suf.alias("suffix_text"),
        fim.alias("fim_text"),
    )


def fim_transform_sql() -> str:
    from hbase_indexer_spark.pipeline.dedup import TOKS_SQL, hash60_sql

    def h(tag: str) -> str:
        return hash60_sql(f"CAST(doc_id AS VARCHAR) || '{tag}'")

    return f"""
        WITH t AS (
            SELECT doc_id, {TOKS_SQL} AS toks
            FROM (SELECT doc_id, coalesce(text, '') AS text
                  FROM documents)
        ),
        s AS (
            SELECT doc_id, toks,
                   CAST(len(toks) AS BIGINT) AS n_tokens,
                   {h(':fim_a')}
                       % (CAST(len(toks) AS BIGINT) + 1) AS a
            FROM t
        ),
        s2 AS (
            SELECT *, a + {h(':fim_b')}
                       % (n_tokens - a + 1) AS b
            FROM s
        ),
        cut AS (
            SELECT doc_id, n_tokens, a, b,
                   coalesce(array_to_string(toks[1:a], ' '), '') AS pre,
                   coalesce(array_to_string(toks[a + 1:b], ' '), '')
                       AS mid,
                   coalesce(array_to_string(toks[b + 1:], ' '), '') AS suf
            FROM s2
        )
        SELECT doc_id, n_tokens,
               a AS split_a, b AS split_b,
               pre AS prefix_text, mid AS middle_text, suf AS suffix_text,
               array_to_string(list_filter(
                   ['<fim_prefix>', pre, '<fim_suffix>', suf,
                    '<fim_middle>', mid], x -> x <> ''), ' ') AS fim_text
        FROM cut
    """
