"""Streaming sketch accumulation — the streaming arm of the corpus
sketch family (`pipeline/corpus_stats.py`).

The count-min sketch is MERGEABLE (cells are plain sums), so the
streaming build has an EXACT batch equivalence: fold each micro-batch's
sketch into a persistent store and the end state is bit-identical to
one batch sketch over the concatenated input — order-independent, no
approximation drift, restart-safe.  That equivalence is what the
oracle gate checks (``cms_stream`` end state vs the batch
``count_min_sketch`` SQL).

Scale: per micro-batch the fold touches ``depth x width`` cells (a
constant) plus one combinable count over the batch — per-trigger cost
is O(batch tokens), state is O(depth x width) forever.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def cms_stream(stream_docs: DataFrame, store, checkpoint: str,
               depth: int = 4, width: int = 256):
    """Accumulate a count-min sketch over a document stream: per
    micro-batch, sketch the batch (one combinable aggregation) and fold
    it into the persistent sketch in ``store`` (an ``IndexStore``;
    versioned overwrite keeps the flip atomic and crash-safe).

    Returns the started ``StreamingQuery``; read the accumulated sketch
    with ``store.read(spark)``."""
    def _process(batch: DataFrame, batch_id: int) -> None:
        fold_sketch_batch(store, batch, batch_id, depth=depth, width=width)

    writer = stream_docs.writeStream.foreachBatch(_process) \
        .option("checkpointLocation", checkpoint)
    return writer.start()


def fold_sketch_batch(store, batch: DataFrame, batch_id: int,
                      depth: int = 4, width: int = 256) -> bool:
    """One idempotent fold: sketch ``batch`` and add it into the stored
    sketch, tagging every row with ``last_batch = batch_id``.  A
    REDELIVERED batch (foreachBatch is at-least-once: a crash between
    the store's version flip and the streaming checkpoint commit replays
    the last micro-batch) is detected by ``batch_id <= last_batch`` and
    skipped — without this the replay would double-count every cell the
    batch touched.  Returns True when the batch was applied."""
    from hbase_indexer_spark.pipeline.corpus_stats import count_min_sketch

    spark = batch.sparkSession
    if not batch.head(1):
        return False
    cur = store.read(spark)
    have_cur = cur is not None and bool(cur.head(1))
    if have_cur:
        last = cur.agg(F.max("last_batch")).first()[0]
        if batch_id == last:
            return False  # at-least-once replay of the last micro-batch
        if batch_id < last:
            # id REGRESSION (checkpoint reset/pointing a new query at a
            # populated store): skipping silently would discard all
            # future data — fail loudly instead
            raise ValueError(
                f"sketch store at {store.path!r} has last_batch={last} "
                f"but the stream delivered batch_id={batch_id}; the "
                "streaming checkpoint was reset against persistent "
                "sketch state — resume the old checkpoint or point the "
                "query at a fresh store")
    sk = count_min_sketch(batch, depth=depth, width=width)
    if have_cur:
        sk = (sk.unionByName(cur.select("row", "cell", "c"))
              .groupBy("row", "cell")
              .agg(F.sum("c").alias("c")))
    sk = sk.withColumn("last_batch", F.lit(int(batch_id)).cast("long"))
    # localCheckpoint BEFORE the overwrite: the store retains only 2
    # versions, and a lazy plan re-reading the vacuumed current
    # version mid-overwrite would fail
    store.overwrite(sk.localCheckpoint(eager=True), spark)
    return True

def hll_stream(stream_df: DataFrame, store, checkpoint: str,
               key: str, group: str):
    """Accumulate HyperLogLog registers over a stream: per micro-batch,
    build the batch's ``(group, reg, max rho)`` table (one combinable
    aggregation, `pipeline/corpus_stats.py hll_registers`) and fold it
    into ``store`` by REGISTER-WISE MAX — HLL's merge operator.  Max is
    idempotent as well as commutative, so unlike the count-min fold the
    register state would survive a double-apply unchanged; the
    ``last_batch`` replay guard is kept anyway so the two sketch streams
    share one crash-safety contract.

    End state ≡ the batch register table over the concatenated input —
    exact, order-independent — which is what the oracle gate checks.

    Scale: per-trigger cost is one combinable shuffle over the batch;
    state is 64 rows per group forever."""
    def _process(batch: DataFrame, batch_id: int) -> None:
        fold_hll_batch(store, batch, batch_id, key=key, group=group)

    writer = stream_df.writeStream.foreachBatch(_process) \
        .option("checkpointLocation", checkpoint)
    return writer.start()


def fold_hll_batch(store, batch: DataFrame, batch_id: int,
                   key: str, group: str) -> bool:
    """One idempotent register fold (see `fold_sketch_batch` for the
    at-least-once redelivery story).  Returns True when applied."""
    from hbase_indexer_spark.pipeline.corpus_stats import hll_registers

    spark = batch.sparkSession
    if not batch.head(1):
        return False
    cur = store.read(spark)
    have_cur = cur is not None and bool(cur.head(1))
    if have_cur:
        last = cur.agg(F.max("last_batch")).first()[0]
        if batch_id == last:
            return False  # at-least-once replay of the last micro-batch
        if batch_id < last:
            raise ValueError(
                f"sketch store at {store.path!r} has last_batch={last} "
                f"but the stream delivered batch_id={batch_id}; the "
                "streaming checkpoint was reset against persistent "
                "sketch state — resume the old checkpoint or point the "
                "query at a fresh store")
    regs = hll_registers(batch, F.col(key), group)
    if have_cur:
        regs = (regs.unionByName(cur.select("grp", "reg", "mr"))
                .groupBy("grp", "reg")
                .agg(F.max("mr").alias("mr")))
    regs = regs.withColumn("last_batch", F.lit(int(batch_id)).cast("long"))
    store.overwrite(regs.localCheckpoint(eager=True), spark)
    return True
