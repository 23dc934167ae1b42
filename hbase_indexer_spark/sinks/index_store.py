"""Upsert index sink (reference §2.2 K1-K8).

The reference maintains a Solr collection as an incrementally-updated
materialized view: batched adds, deletes-by-id and deletes-by-query
(DirectSolrInputDocumentWriter.java:53-193, deleteByQuery :176-193).

Spark-first equivalent: a keyed materialized view with MERGE semantics.
Locally this is a versioned parquet directory with an atomic current-version
pointer — write the new version, then flip ``_CURRENT`` (the exact shape of
the reference's offline-build + go-live publish, GoLive.java:52-169, where
the new shards are built aside and then atomically merged in).  On a real
cluster the same interface binds to Delta/Iceberg ``MERGE INTO``; the plan
shape (anti-join + union on the key) is what MERGE executes anyway.

Scale note: the merge joins old state with the batch on the unique key; the
batch side is typically small -> broadcast, and the rewrite is bounded by
(old index + batch), never by the event history.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


class IndexStore:
    """A keyed, versioned materialized view with upsert/delete merge."""

    def __init__(self, path: str, key: str = "id"):
        self.path = path
        self.key = key

    # -- version plumbing (go-live analog) --------------------------------

    def _current_file(self) -> str:
        return os.path.join(self.path, "_CURRENT")

    def current_version(self) -> int:
        try:
            with open(self._current_file()) as f:
                return int(f.read().strip())
        except FileNotFoundError:
            return -1

    def _version_dir(self, v: int) -> str:
        return os.path.join(self.path, f"v={v}")

    def read(self, spark: SparkSession) -> DataFrame | None:
        v = self.current_version()
        if v < 0:
            return None
        return spark.read.parquet(self._version_dir(v))

    def _publish(self, df: DataFrame, spark: SparkSession) -> None:
        v = self.current_version() + 1
        df.write.mode("overwrite").parquet(self._version_dir(v))
        tmp = self._current_file() + ".tmp"
        with open(tmp, "w") as f:
            f.write(str(v))
        os.replace(tmp, self._current_file())  # atomic go-live flip
        old = self._version_dir(v - 2)
        if os.path.exists(old):
            shutil.rmtree(old, ignore_errors=True)

    # -- merge (K1/K7/K8) --------------------------------------------------

    def merge(
        self,
        spark: SparkSession,
        adds: DataFrame | None = None,
        delete_ids: DataFrame | None = None,
        delete_predicates: list[Column] | None = None,
        replace_keys: DataFrame | None = None,
    ) -> None:
        """One batch changeset, applied in the reference's order: deletes by
        query, deletes by id, then adds (an add for an id wins over an
        earlier state — SolrUpdateCollector add-overwrites semantics).

        ``replace_keys``: when the changeset fully covers a key space (every
        key in it is either re-added or implicitly deleted — the row-mode
        rebuild shape), pass that key set and omit ``delete_ids``; the merge
        then needs ONE broadcast (the key set) and computes ``adds`` exactly
        once, inside the single output write job.
        """
        current = self.read(spark)
        if current is None:
            if adds is None:
                return
            self._publish(adds, spark)
            return
        out = current
        if delete_predicates:
            for pred in delete_predicates:
                out = out.filter(~F.coalesce(pred, F.lit(False)))
        if replace_keys is not None:
            out = out.join(
                F.broadcast(
                    replace_keys.select(F.col(replace_keys.columns[0]).alias(self.key)).distinct()
                ),
                on=self.key, how="left_anti",
            )
            if adds is not None:
                out = out.unionByName(adds)
            self._publish(out, spark)
            return
        if delete_ids is not None:
            out = out.join(
                F.broadcast(delete_ids.select(F.col(delete_ids.columns[0]).alias(self.key)).distinct()),
                on=self.key, how="left_anti",
            )
        if adds is not None:
            out = out.join(
                F.broadcast(adds.select(self.key).distinct()), on=self.key, how="left_anti"
            ).unionByName(adds)
        self._publish(out, spark)

    def overwrite(self, df: DataFrame, spark: SparkSession) -> None:
        """Full rebuild publish (batch reindex 'go-live', K6)."""
        self._publish(df, spark)
