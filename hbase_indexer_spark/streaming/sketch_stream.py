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
    if have_cur and cur.agg(F.max("last_batch")).first()[0] >= batch_id:
        return False
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
