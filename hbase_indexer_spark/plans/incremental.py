"""Incremental indexing plan (reference §3.1, the SEP path).

Event micro-batch -> table route (F1) + subscription-ts gate (S2) ->
relevance filter (F2) -> mutation apply (tombstone semantics) ->
last-event-wins dedup (A1/A2) -> delete classification (F4/F5) ->
document rebuild for touched rows (the set-oriented form of the J1
point re-read) -> MERGE changeset.

Events carry the canonical cell columns plus ``seq`` (arrival order — the
explicit form of the reference's per-thread arrival ordering,
SepEventExecutor.java:79-88) and ``event_ts`` (WAL write time,
SepConsumer.java:227-228).  Cell ``ts`` must be monotone with ``seq`` for
tombstone ordering to match HBase visibility rules.

Scale shape per batch: the event batch is small relative to the table;
tombstone masks broadcast; document rebuild touches only rows present in
the batch (semi join), so work is O(batch), not O(table).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from hbase_indexer_spark.config.indexer_conf import (
    MAPPING_COLUMN,
    IndexerConf,
)
from hbase_indexer_spark.operators.extraction import (
    DELETE_OPS,
    cell_matches,
    column_documents,
    keyvalue_id_expr,
    latest_cells,
    row_documents,
    table_predicate,
)
from hbase_indexer_spark.sinks.index_store import IndexStore

CELL_COLS = ["table", "row", "family", "qualifier", "ts", "op", "value"]


def gate_events(events: DataFrame, conf: IndexerConf,
                subscription_ts: int | None = None) -> DataFrame:
    """F1 route + S2 subscription-timestamp gate + F2 relevance filter."""
    out = events.filter(table_predicate(conf, F.col("table")))
    if subscription_ts is not None:
        out = out.filter(F.col("event_ts") >= F.lit(subscription_ts))
    return out.filter(
        cell_matches(conf, F.col("family"), F.col("qualifier"))
        | F.col("op").isin(*DELETE_OPS)
    )


def apply_mutations(state: DataFrame | None, batch: DataFrame) -> DataFrame:
    """Merge a mutation batch into a put-cells state table with HBase
    tombstone visibility: a delete at ts T masks cells of its scope with
    cell ts <= T (Indexer delete classification scopes, Indexer.java:361-384).

    Tombstones are dropped after application ("compacted"): cell ts is
    monotone with seq here, so no masked-late-put can arrive afterwards.
    """
    batch_cells = batch.select(*CELL_COLS)
    puts = batch_cells.filter(F.col("op") == "put")
    combined = puts if state is None else state.select(*CELL_COLS).unionByName(puts)

    def tomb(op: str, keys: list[str]) -> DataFrame:
        return (
            batch_cells.filter(F.col("op") == op)
            .groupBy(*keys)
            .agg(F.max("ts").alias(f"_{op}_ts"))
        )

    dr = tomb("delete_row", ["table", "row"])
    df_ = tomb("delete_family", ["table", "row", "family"])
    dc = tomb("delete_column", ["table", "row", "family", "qualifier"])

    out = (
        combined.join(F.broadcast(dr), ["table", "row"], "left")
        .join(F.broadcast(df_), ["table", "row", "family"], "left")
        .join(F.broadcast(dc), ["table", "row", "family", "qualifier"], "left")
        .filter(
            (F.col("ts") > F.coalesce(F.col("_delete_row_ts"), F.lit(-(2 ** 62))))
            & (F.col("ts") > F.coalesce(F.col("_delete_family_ts"), F.lit(-(2 ** 62))))
            & (F.col("ts") > F.coalesce(F.col("_delete_column_ts"), F.lit(-(2 ** 62))))
        )
        .select(*CELL_COLS)
    )
    return latest_cells(out).select(
        "table", "row", "family", "qualifier", "ts", F.lit("put").alias("op"), "value"
    )


def row_state_from_events(events: DataFrame) -> DataFrame:
    """Compact a full ordered mutation log into final put-cell state in one
    pass (the whole-log form of apply_mutations, used by batch replays and
    as the oracle-checkable closed form)."""
    return apply_mutations(None, events)


class IncrementalIndexer:
    """One indexer definition's continuously-maintained index — the analog of
    Indexer + SepConsumer wiring (Indexer.java:140-181).

    Drive it either from Structured Streaming (``process_batch`` inside
    foreachBatch) or directly with pre-chunked DataFrames (deterministic
    replay/testing).  State = a put-cells IndexStore (the "HBase table"
    mirror used for the J1 re-read); Index = the document IndexStore.
    """

    def __init__(self, spark: SparkSession, conf: IndexerConf, state_path: str,
                 index_path: str, subscription_ts: int | None = None):
        self.spark = spark
        self.conf = conf
        self.subscription_ts = subscription_ts
        self.state = IndexStore(state_path, key="row")
        self.index = IndexStore(index_path, key=conf.unique_key_field)

    # -- ROW mode ---------------------------------------------------------

    def _process_row_mode(self, batch: DataFrame) -> None:
        conf = self.conf
        state = self.state.read(self.spark)
        new_state = apply_mutations(state, batch)
        new_state.cache()
        self.state.overwrite(new_state, self.spark)

        # touched rows: every relevant event's row (A1 dedup is implicit —
        # the doc is rebuilt once per touched row from current state, which
        # is exactly "index the last state", Indexer.java:252-292)
        touched = batch.select("table", "row").distinct()
        docs = row_documents(
            new_state.join(F.broadcast(touched), ["table", "row"], "left_semi"), conf
        )
        # F5: touched rows with no remaining doc -> delete by id
        from hbase_indexer_spark.operators.extraction import row_id_expr

        touched_ids = touched.select(
            row_id_expr(conf, F.col("row"), F.col("table")).alias(conf.unique_key_field)
        )
        gone = touched_ids.join(docs.select(conf.unique_key_field), conf.unique_key_field, "left_anti")
        self.index.merge(self.spark, adds=docs, delete_ids=gone)
        new_state.unpersist()

    # -- COLUMN mode ------------------------------------------------------

    def _process_column_mode(self, batch: DataFrame) -> None:
        """A2 last-cell-wins + F4 delete classification
        (Indexer.java:361-450): delete_column -> delete by id;
        delete_family/delete_row -> delete-by-query (K8), which requires the
        configured row/family fields — missing config = warn & skip,
        matching Indexer.java:404-410,420-426."""
        conf = self.conf
        last = (
            batch.groupBy("table", "row", "family", "qualifier")
            .agg(F.max_by(F.struct("op", "value", "ts"), "seq").alias("last"))
            .select("table", "row", "family", "qualifier",
                    F.col("last.op").alias("op"), F.col("last.value").alias("value"),
                    F.col("last.ts").alias("ts"))
        )
        last.cache()
        adds = column_documents(last, conf)
        del_ids = last.filter(F.col("op") == "delete_column").select(
            keyvalue_id_expr(conf, F.col("row"), F.col("family"), F.col("qualifier"))
            .alias(conf.unique_key_field)
        )
        preds: list[Column] = []
        if conf.row_field:
            for r in last.filter(F.col("op") == "delete_row").select("row").distinct().collect():
                preds.append(F.col(conf.row_field) == r["row"])
            if conf.column_family_field:
                for r in (
                    last.filter(F.col("op") == "delete_family")
                    .select("row", "family").distinct().collect()
                ):
                    preds.append(
                        (F.col(conf.row_field) == r["row"])
                        & (F.col(conf.column_family_field) == r["family"])
                    )
        self.index.merge(self.spark, adds=adds, delete_ids=del_ids,
                         delete_predicates=preds or None)
        last.unpersist()

    # -- entry points ------------------------------------------------------

    def process_batch(self, batch: DataFrame, batch_id: int | None = None) -> None:
        batch = gate_events(batch, self.conf, self.subscription_ts)
        if self.conf.mapping_type == MAPPING_COLUMN:
            self._process_column_mode(batch)
        else:
            self._process_row_mode(batch)

    def replay(self, events: DataFrame, n_chunks: int = 1,
               chunk_col: str = "seq") -> DataFrame:
        """Deterministically replay an ordered event log in n_chunks
        micro-batches; returns the final index DataFrame."""
        if n_chunks <= 1:
            self.process_batch(events)
        else:
            bounds = events.select(
                F.min(chunk_col).alias("lo"), F.max(chunk_col).alias("hi")
            ).first()
            lo, hi = bounds["lo"], bounds["hi"]
            span = (hi - lo + 1 + n_chunks - 1) // n_chunks
            for i in range(n_chunks):
                start = lo + i * span
                chunk = events.filter(
                    (F.col(chunk_col) >= start) & (F.col(chunk_col) < start + span)
                )
                self.process_batch(chunk)
        out = self.index.read(self.spark)
        assert out is not None
        return out
